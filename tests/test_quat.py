"""Parity tests for ops.quat against the MuJoCo C math library (oracle).

Mirrors the dual-implementation-parity pattern of the reference
(/root/reference/myosuite/tests/mjx/test_quat_math.py): every function is
checked against mju_* on curated + random cases, plus algebraic properties.
"""
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.ops import quat as q


def rand_quats(n, seed=0):
  rng = np.random.default_rng(seed)
  v = rng.normal(size=(n, 4))
  return v / np.linalg.norm(v, axis=-1, keepdims=True)


def rand_vecs(n, seed=1):
  return np.random.default_rng(seed).normal(size=(n, 3))


QUATS = np.concatenate([
    np.array([
        [1.0, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
        [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0],
        [np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0],
        [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
    ]),
    rand_quats(64),
])


def test_quat_mul_matches_mujoco():
  a, b = QUATS, np.roll(QUATS, 3, axis=0)
  got = np.asarray(q.quat_mul(a, b))
  for i in range(len(a)):
    want = np.zeros(4)
    mujoco.mju_mulQuat(want, a[i], b[i])
    np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_rotate_matches_mujoco():
  vs = rand_vecs(len(QUATS))
  got = np.asarray(q.quat_rotate(QUATS, vs))
  got_inv = np.asarray(q.quat_rotate_inv(QUATS, vs))
  for i in range(len(QUATS)):
    want = np.zeros(3)
    mujoco.mju_rotVecQuat(want, vs[i], QUATS[i])
    np.testing.assert_allclose(got[i], want, atol=1e-10)
    neg = np.zeros(4)
    mujoco.mju_negQuat(neg, QUATS[i])
    mujoco.mju_rotVecQuat(want, vs[i], neg)
    np.testing.assert_allclose(got_inv[i], want, atol=1e-10)


def test_quat_mat_roundtrip_matches_mujoco():
  mats = np.asarray(q.quat_to_mat(QUATS))
  for i in range(len(QUATS)):
    want = np.zeros(9)
    mujoco.mju_quat2Mat(want, QUATS[i])
    np.testing.assert_allclose(mats[i].ravel(), want, atol=1e-12)
    back = np.zeros(4)
    mujoco.mju_mat2Quat(back, want)
    got_back = np.asarray(q.mat_to_quat(mats[i]))
    # Same rotation up to sign convention.
    np.testing.assert_allclose(
        np.abs(np.dot(got_back, back)), 1.0, atol=1e-9)


def test_mat_to_quat_batched_equals_loop():
  mats = np.asarray(q.quat_to_mat(QUATS))
  batched = np.asarray(q.mat_to_quat(mats))
  single = np.stack([np.asarray(q.mat_to_quat(m)) for m in mats])
  np.testing.assert_allclose(batched, single, atol=1e-12)


def test_axis_angle_matches_mujoco():
  axes = q.normalize(rand_vecs(32))
  angles = np.random.default_rng(2).uniform(-np.pi, np.pi, size=32)
  got = np.asarray(q.axis_angle_to_quat(np.asarray(axes), angles))
  for i in range(32):
    want = np.zeros(4)
    mujoco.mju_axisAngle2Quat(want, np.asarray(axes)[i], angles[i])
    np.testing.assert_allclose(got[i], want, atol=1e-12)


def test_quat_sub_matches_mujoco():
  a, b = QUATS, np.roll(QUATS, 5, axis=0)
  got = np.asarray(q.quat_sub(a, b))
  for i in range(len(a)):
    want = np.zeros(3)
    mujoco.mju_subQuat(want, a[i], b[i])
    np.testing.assert_allclose(got[i], want, atol=1e-9)


def test_quat_integrate_matches_mujoco():
  omegas = rand_vecs(len(QUATS), seed=3)
  dt = 0.01
  got = np.asarray(q.quat_integrate(QUATS, omegas, dt))
  for i in range(len(QUATS)):
    want = QUATS[i].copy()
    mujoco.mju_quatIntegrate(want, omegas[i], dt)
    np.testing.assert_allclose(
        np.abs(np.dot(got[i], want)), 1.0, atol=1e-10)


def test_euler_roundtrip():
  rng = np.random.default_rng(4)
  eulers = rng.uniform(-1.4, 1.4, size=(64, 3))
  quats = np.asarray(q.euler_to_quat(eulers))
  back = np.asarray(q.quat_to_euler(quats))
  np.testing.assert_allclose(back, eulers, atol=1e-9)


def test_euler_to_quat_matches_mujoco_compiler():
  # Oracle: MJCF compiler converts body euler attr -> body_quat.
  rng = np.random.default_rng(5)
  for e in rng.uniform(-np.pi, np.pi, size=(16, 3)):
    xml = f"""
    <mujoco><compiler angle="radian"/><worldbody>
      <body euler="{e[0]} {e[1]} {e[2]}"><geom size="0.1"/></body>
    </worldbody></mujoco>"""
    m = mujoco.MjModel.from_xml_string(xml)
    want = m.body_quat[1]
    got = np.asarray(q.euler_to_quat(e))
    np.testing.assert_allclose(np.abs(np.dot(got, want)), 1.0, atol=1e-9)


def test_properties():
  a, b = QUATS, np.roll(QUATS, 7, axis=0)
  # norm preservation under product
  n = np.linalg.norm(np.asarray(q.quat_mul(a, b)), axis=-1)
  np.testing.assert_allclose(n, 1.0, atol=1e-12)
  # conj is inverse
  ident = np.asarray(q.quat_mul(a, q.quat_conj(a)))
  np.testing.assert_allclose(ident[:, 0], 1.0, atol=1e-12)
  np.testing.assert_allclose(ident[:, 1:], 0.0, atol=1e-12)
  # rotate preserves length
  vs = rand_vecs(len(a))
  rv = np.asarray(q.quat_rotate(a, vs))
  np.testing.assert_allclose(
      np.linalg.norm(rv, axis=-1), np.linalg.norm(vs, axis=-1), atol=1e-10)


def test_orthogonals():
  vs = np.asarray(q.normalize(rand_vecs(32, seed=7)))
  b, c = q.orthogonals(vs)
  b, c = np.asarray(b), np.asarray(c)
  np.testing.assert_allclose((vs * b).sum(-1), 0.0, atol=1e-10)
  np.testing.assert_allclose((vs * c).sum(-1), 0.0, atol=1e-10)
  np.testing.assert_allclose(np.linalg.norm(b, axis=-1), 1.0, atol=1e-10)
