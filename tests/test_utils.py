"""Tests for IK, min-jerk, curriculum, and tensor utils.

IK is validated self-consistently (reach a pose known to be feasible) and
against the reference's nullspace_method algebra; min-jerk against the
reference's closed-form quintic (min_jerk.py:22-25); curriculum against
the reference's update law (curriculum_utils.py:27-43).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import model as emodel
from myosuite_mjx_tpu.engine import smooth
from myosuite_mjx_tpu.ops import quat as qmath
from myosuite_mjx_tpu.utils import curriculum, ik, min_jerk, tensor_utils

FINGER = ("/root/reference/myosuite/simhive/myo_sim/finger/"
          "myofinger_v0.xml")


@pytest.fixture(scope="module")
def finger():
  return emodel.load_model(FINGER, dtype=np.float64)


def _site_pose(m, qpos, sid):
  kin = smooth.kinematics(
      m, qpos, jnp.zeros((m.nmocap, 3), qpos.dtype),
      jnp.tile(qmath.quat_identity(dtype=qpos.dtype), (m.nmocap, 1)))
  return kin["site_xpos"][sid], kin["site_xmat"][sid]


def test_ik_reaches_feasible_target(finger):
  m = finger
  sid = m.name2id("site", "IFtip")
  # target = site pos at a random feasible joint config
  rng = np.random.default_rng(0)
  lo, hi = m.jnt_range[:, 0], m.jnt_range[:, 1]
  q_goal = jnp.asarray(lo + rng.uniform(0.2, 0.8, m.nq) * (hi - lo))
  target, _ = _site_pose(m, q_goal, sid)

  res = ik.qpos_from_site_pose(m, "IFtip", target_pos=target, tol=1e-8,
                               max_steps=200)
  reached, _ = _site_pose(m, res.qpos, sid)
  np.testing.assert_allclose(np.asarray(reached), np.asarray(target),
                             atol=1e-6)
  assert bool(res.success)


def test_ik_with_rotation_target(finger):
  m = finger
  sid = m.name2id("site", "IFtip")
  rng = np.random.default_rng(3)
  lo, hi = m.jnt_range[:, 0], m.jnt_range[:, 1]
  q_goal = jnp.asarray(lo + rng.uniform(0.3, 0.7, m.nq) * (hi - lo))
  tpos, tmat = _site_pose(m, q_goal, sid)
  tquat = qmath.mat_to_quat(tmat)

  res = ik.qpos_from_site_pose(m, "IFtip", target_pos=tpos,
                               target_quat=tquat, tol=1e-6, max_steps=300)
  reached_pos, reached_mat = _site_pose(m, res.qpos, sid)
  np.testing.assert_allclose(np.asarray(reached_pos), np.asarray(tpos),
                             atol=1e-4)
  np.testing.assert_allclose(np.asarray(reached_mat), np.asarray(tmat),
                             atol=1e-3)


def test_ik_joint_mask_freezes_other_dofs(finger):
  m = finger
  sid = m.name2id("site", "IFtip")
  rng = np.random.default_rng(1)
  lo, hi = m.jnt_range[:, 0], m.jnt_range[:, 1]
  q_goal = jnp.asarray(lo + rng.uniform(0.3, 0.7, m.nq) * (hi - lo))
  target, _ = _site_pose(m, q_goal, sid)

  names = [m.id2name("joint", j) for j in range(m.njnt)]
  allowed = names[-2:]                       # only the last two joints move
  res = ik.qpos_from_site_pose(m, "IFtip", target_pos=target,
                               joint_names=allowed, max_steps=50)
  frozen = [m.jnt_qposadr[m.name2id("joint", n)]
            for n in names if n not in allowed]
  np.testing.assert_allclose(np.asarray(res.qpos)[frozen],
                             np.asarray(m.qpos0)[frozen], atol=1e-12)


def test_ik_jits_and_vmaps(finger):
  m = finger
  sid = m.name2id("site", "IFtip")
  rng = np.random.default_rng(2)
  lo, hi = m.jnt_range[:, 0], m.jnt_range[:, 1]
  goals = jnp.asarray(
      lo + rng.uniform(0.25, 0.75, (4, m.nq)) * (hi - lo))
  targets = jax.vmap(lambda q: _site_pose(m, q, sid)[0])(goals)

  solve = jax.jit(jax.vmap(
      lambda t: ik.qpos_from_site_pose(m, "IFtip", target_pos=t,
                                       tol=1e-8, max_steps=200)))
  res = solve(targets)
  reached = jax.vmap(lambda q: _site_pose(m, q, sid)[0])(res.qpos)
  np.testing.assert_allclose(np.asarray(reached), np.asarray(targets),
                             atol=1e-5)


def test_nullspace_method_matches_reference_algebra():
  rng = np.random.default_rng(4)
  jac = rng.standard_normal((3, 5))
  delta = rng.standard_normal(3)
  # reference algebra (inverse_kinematics.py:276-281)
  hess = jac.T @ jac + np.eye(5) * 3e-2
  expected = np.linalg.solve(hess, jac.T @ delta)
  got = ik.nullspace_method(jnp.asarray(jac), jnp.asarray(delta),
                            regularization_strength=3e-2)
  np.testing.assert_allclose(np.asarray(got), expected, atol=1e-10)


# ---------------------------------------------------------------------------
# min-jerk
# ---------------------------------------------------------------------------


def test_min_jerk_matches_reference_formula():
  N, T = 50, 2.0
  p, pd, pdd = min_jerk.min_jerk_spaces(N, T)
  t = np.linspace(0, 1, N)
  np.testing.assert_allclose(
      np.asarray(p), 10 * t**3 - 15 * t**4 + 6 * t**5, atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(pd), (30 * t**2 - 60 * t**3 + 30 * t**4) / T, atol=1e-12)
  np.testing.assert_allclose(
      np.asarray(pdd), (60 * t - 180 * t**2 + 120 * t**3) / T**2,
      atol=1e-12)


def test_min_jerk_trajectory_boundary_conditions():
  start = np.array([0.1, -0.5, 2.0])
  goal = np.array([1.0, 0.5, -1.0])
  traj = min_jerk.generate_joint_space_min_jerk(start, goal, 1.0, 0.01)
  assert traj["position"].shape == (100, 3)
  np.testing.assert_allclose(np.asarray(traj["position"][0]), start,
                             atol=1e-12)
  # interior endpoint approaches goal; velocity/accel vanish at both ends
  np.testing.assert_allclose(np.asarray(traj["velocity"][0]), 0,
                             atol=1e-10)
  np.testing.assert_allclose(np.asarray(traj["acceleration"][0]), 0,
                             atol=1e-10)
  wp = min_jerk.as_waypoint_list(traj)
  assert len(wp) == 100 and wp[3]["time_from_start"] == pytest.approx(0.03)


# ---------------------------------------------------------------------------
# curriculum
# ---------------------------------------------------------------------------


def test_curriculum_matches_reference_semantics():
  cur = curriculum.Curriculum(threshold=90.0, rate=0.01, start=0.0,
                              end=2.0, filter_coef=0.95)
  # reference implementation inline (curriculum_utils.py:27-43)
  value, progress = 0.0, 0.0
  rng = np.random.default_rng(5)
  for _ in range(300):
    s = float(rng.uniform(80, 100))
    progress = progress * 0.95 + s * 0.05
    if value <= 1.0 and s >= 90.0 and progress >= 90.0:
      value += 0.01
    cur.update(s)
    assert cur.status() == pytest.approx(0.0 + value * 2.0, abs=1e-5)


def test_curriculum_functional_jits():
  @jax.jit
  def run(successes):
    def body(st, s):
      return curriculum.update(st, s), ()
    st, _ = jax.lax.scan(body, curriculum.init(), successes)
    return curriculum.status(st)
  out = run(jnp.full((100,), 95.0))
  assert 0.0 < float(out) <= 1.01


# ---------------------------------------------------------------------------
# tensor utils
# ---------------------------------------------------------------------------


def test_cosine():
  v1 = np.array([[1.0, 0, 0], [1, 1, 0]])
  v2 = np.array([[0.0, 1, 0], [1, 1, 0]])
  out = np.asarray(tensor_utils.calculate_cosine(v1, v2))
  np.testing.assert_allclose(out, [0.0, 1.0], atol=1e-6)
  assert float(tensor_utils.calculate_cosine(
      np.zeros(3), np.ones(3))) == 0.0


def test_tensor_dict_roundtrip():
  paths = [{"obs": np.ones((3, 2)), "info": {"r": np.arange(3.0)}}
           for _ in range(4)]
  stacked = tensor_utils.stack_tensor_dict_list(paths)
  assert stacked["obs"].shape == (4, 3, 2)
  assert stacked["info"]["r"].shape == (4, 3)
  split = tensor_utils.split_tensor_dict_list(stacked)
  assert len(split) == 4 and split[0]["info"]["r"].shape == (3,)
  cat = tensor_utils.concat_tensor_dict_list(paths)
  assert cat["obs"].shape == (12, 2)
  padded = tensor_utils.pad_tensor_dict(paths[0], 5)
  assert padded["obs"].shape == (5, 2)
  trunc = tensor_utils.truncate_tensor_dict(stacked, 2)
  assert trunc["obs"].shape == (2, 3, 2)
  flat = tensor_utils.flatten_tensors([np.ones((2, 2)), np.zeros(3)])
  back = tensor_utils.unflatten_tensors(flat, [(2, 2), (3,)])
  assert back[0].shape == (2, 2) and back[1].shape == (3,)
