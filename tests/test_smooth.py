"""Parity: smooth dynamics (FK, mass matrix, bias forces) vs CPU MuJoCo.

Oracle pattern per SURVEY.md §7 step 2: validate vs mj_forward on myoFinger
and on a synthetic model covering free/ball/slide joints.
"""
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import model as emodel
from myosuite_mjx_tpu.engine import smooth

MYOFINGER = "/root/reference/myosuite/simhive/myo_sim/finger/myofinger_v0.xml"

MIXED_XML = """
<mujoco>
  <compiler angle="radian"/>
  <option timestep="0.002"/>
  <worldbody>
    <body name="base" pos="0.1 0 0.5">
      <joint name="slide" type="slide" axis="1 0 0" damping="0.1"/>
      <geom type="box" size=".05 .04 .03" mass="0.5"/>
      <body name="arm" pos="0.1 0.02 0">
        <joint name="hinge1" type="hinge" axis="0 1 0" damping="0.2"/>
        <geom type="capsule" fromto="0 0 0 0.2 0 0" size=".02" mass="0.3"/>
        <body name="wrist" pos="0.2 0 0">
          <joint name="ball" type="ball" damping="0.05"/>
          <geom type="sphere" size=".03" mass="0.2" pos="0.05 0 0"/>
        </body>
      </body>
    </body>
    <body name="obj" pos="0.4 0.1 0.6">
      <freejoint name="free"/>
      <geom type="box" size=".02 .03 .04" mass="0.1"/>
      <site name="corner" pos="0.02 0.03 0.04"/>
    </body>
  </worldbody>
</mujoco>
"""


def rand_state(mj, rng):
  qpos = mj.qpos0.copy()
  qvel = rng.normal(scale=1.0, size=mj.nv)
  for j in range(mj.njnt):
    adr = mj.jnt_qposadr[j]
    t = mj.jnt_type[j]
    if t == mujoco.mjtJoint.mjJNT_HINGE or t == mujoco.mjtJoint.mjJNT_SLIDE:
      lo, hi = mj.jnt_range[j]
      if mj.jnt_limited[j]:
        qpos[adr] = rng.uniform(lo, hi)
      else:
        qpos[adr] = rng.normal()
    elif t == mujoco.mjtJoint.mjJNT_BALL:
      q = rng.normal(size=4)
      qpos[adr:adr + 4] = q / np.linalg.norm(q)
    elif t == mujoco.mjtJoint.mjJNT_FREE:
      qpos[adr:adr + 3] = rng.normal(scale=0.3, size=3)
      q = rng.normal(size=4)
      qpos[adr + 3:adr + 7] = q / np.linalg.norm(q)
  return qpos, qvel


def fixtures(xml_or_path):
  mj = emodel.load_mj_model(xml_or_path)
  m = emodel.from_mj(mj)
  d = mujoco.MjData(mj)
  return mj, m, d


@pytest.mark.parametrize("src", [MYOFINGER, MIXED_XML])
def test_kinematics_parity(src):
  mj, m, d = fixtures(src)
  rng = np.random.default_rng(0)
  for _ in range(5):
    qpos, _ = rand_state(mj, rng)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    kin = smooth.kinematics(
        m, qpos, np.zeros((m.nmocap, 3)),
        np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
    np.testing.assert_allclose(np.asarray(kin["xpos"]), d.xpos, atol=1e-12)
    dots = np.abs(np.sum(np.asarray(kin["xquat"]) * d.xquat, axis=-1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kin["site_xpos"]), d.site_xpos, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kin["geom_xpos"]), d.geom_xpos, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kin["xipos"]), d.xipos, atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(kin["xanchor"]), d.xanchor, atol=1e-12)
    np.testing.assert_allclose(np.asarray(kin["xaxis"]), d.xaxis, atol=1e-12)


@pytest.mark.parametrize("src", [MYOFINGER, MIXED_XML])
def test_subtree_com_parity(src):
  mj, m, d = fixtures(src)
  rng = np.random.default_rng(1)
  qpos, _ = rand_state(mj, rng)
  d.qpos[:] = qpos
  mujoco.mj_forward(mj, d)
  kin = smooth.kinematics(
      m, qpos, np.zeros((m.nmocap, 3)),
      np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
  com, cinert, cdof = smooth.com_pos(m, kin)
  np.testing.assert_allclose(np.asarray(com), d.subtree_com, atol=1e-12)
  # cdof parity: MuJoCo expresses dof axes at subtree_com[rootid]; convert
  # ours (world-origin) into that frame: lin_c = lin_0 + ang x com_root.
  for j in range(m.nv):
    root = m.body_rootid[m.dof_bodyid[j]]
    c = d.subtree_com[root]
    ours = np.asarray(cdof[j])
    lin_c = ours[3:] + np.cross(ours[:3], c)
    np.testing.assert_allclose(ours[:3], d.cdof[j, :3], atol=1e-10)
    np.testing.assert_allclose(lin_c, d.cdof[j, 3:], atol=1e-10)


@pytest.mark.parametrize("src", [MYOFINGER, MIXED_XML])
def test_mass_matrix_parity(src):
  mj, m, d = fixtures(src)
  rng = np.random.default_rng(2)
  for _ in range(3):
    qpos, _ = rand_state(mj, rng)
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    want = np.zeros((mj.nv, mj.nv))
    mujoco.mj_fullM(mj, d, want)
    kin = smooth.kinematics(
        m, qpos, np.zeros((m.nmocap, 3)),
        np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
    _, cinert, cdof = smooth.com_pos(m, kin)
    qM = np.asarray(smooth.crb(m, cinert, cdof))
    np.testing.assert_allclose(qM, want, atol=1e-10)


@pytest.mark.parametrize("src", [MYOFINGER, MIXED_XML])
def test_bias_force_parity(src):
  mj, m, d = fixtures(src)
  rng = np.random.default_rng(3)
  for _ in range(5):
    qpos, qvel = rand_state(mj, rng)
    d.qpos[:] = qpos
    d.qvel[:] = qvel
    mujoco.mj_forward(mj, d)
    kin = smooth.kinematics(
        m, qpos, np.zeros((m.nmocap, 3)),
        np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
    _, cinert, cdof = smooth.com_pos(m, kin)
    cvel, cdof_dot = smooth.com_vel(m, cdof, qvel)
    bias = np.asarray(smooth.rne(m, cinert, cdof, cdof_dot, cvel, qvel))
    np.testing.assert_allclose(bias, d.qfrc_bias, atol=1e-9)


@pytest.mark.parametrize("src", [MYOFINGER, MIXED_XML])
def test_point_jacobian_parity(src):
  mj, m, d = fixtures(src)
  rng = np.random.default_rng(4)
  qpos, _ = rand_state(mj, rng)
  d.qpos[:] = qpos
  mujoco.mj_forward(mj, d)
  kin = smooth.kinematics(
      m, qpos, np.zeros((m.nmocap, 3)),
      np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
  _, _, cdof = smooth.com_pos(m, kin)
  for s in range(m.nsite):
    b = int(m.site_bodyid[s])
    jacp = np.zeros((3, mj.nv))
    jacr = np.zeros((3, mj.nv))
    mujoco.mj_jacSite(mj, d, jacp, jacr, s)
    ours_p, ours_r = smooth.point_jacobian(
        m, cdof, kin["site_xpos"][s], b)
    np.testing.assert_allclose(np.asarray(ours_p), jacp, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours_r), jacr, atol=1e-10)
