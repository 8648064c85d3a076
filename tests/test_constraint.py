"""Parity: constrained dynamics (limits + contacts) vs CPU MuJoCo."""
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel

MYOFINGER = "/root/reference/myosuite/simhive/myo_sim/finger/myofinger_v0.xml"

BALL_XML = """
<mujoco><compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <geom name="floor" type="plane" size="1 1 1"/>
  <body pos="0.02 0.01 0.08">
    <freejoint/>
    <geom name="ball" type="sphere" size="0.05" mass="0.1"/>
  </body>
</worldbody></mujoco>"""

CAPSULE_XML = """
<mujoco><compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <geom name="floor" type="plane" size="1 1 1"/>
  <body pos="0 0 0.06" euler="0.3 0.2 0.1">
    <freejoint/>
    <geom name="cap" type="capsule" size="0.02 0.05" mass="0.1"/>
  </body>
</worldbody></mujoco>"""

SPHERES_XML = """
<mujoco><compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <body pos="0 0 0.2">
    <joint type="slide" axis="0 0 1"/>
    <geom type="sphere" size="0.05" mass="0.1"/>
  </body>
  <body pos="0.01 0.0 0.09">
    <freejoint/>
    <geom type="sphere" size="0.05" mass="0.2"/>
  </body>
  <geom name="floor" type="plane" size="1 1 1"/>
</worldbody></mujoco>"""


def run_pair(xml_or_path, nsteps, qvel0=None, atol=1e-5, is_path=False):
  mj = (mujoco.MjModel.from_xml_path(xml_or_path) if is_path
        else mujoco.MjModel.from_xml_string(xml_or_path))
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  if qvel0 is not None:
    dref.qvel[:] = qvel0
  d = edata.make_data(m, dtype=jnp.float64)
  if qvel0 is not None:
    d = d.replace(qvel=jnp.asarray(qvel0, jnp.float64))
  import jax
  import functools
  step = jax.jit(functools.partial(forward.step, m))
  for t in range(nsteps):
    mujoco.mj_step(mj, dref)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), dref.qpos, atol=atol,
                             err_msg=f"after {nsteps} steps")
  np.testing.assert_allclose(np.asarray(d.qvel), dref.qvel, atol=atol * 100)
  return mj, m, d, dref


def test_ball_drop_and_rest():
  # falls ~1.7cm, impacts, settles into resting contact
  run_pair(BALL_XML, 150, atol=1e-6)


def test_tilted_capsule_settles():
  run_pair(CAPSULE_XML, 200, atol=5e-4)


def test_sphere_stack():
  run_pair(SPHERES_XML, 200, atol=5e-4)


def test_finger_limits_single_step():
  """States violating joint/tendon limits produce matching qacc."""
  mj = mujoco.MjModel.from_xml_path(MYOFINGER)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(3)
  template = edata.make_data(m, dtype=jnp.float64)
  import jax
  import functools
  fwd = jax.jit(functools.partial(forward.forward, m))
  n_checked = 0
  for _ in range(40):
    # sample beyond limits to activate them
    qpos = np.array([
        rng.uniform(lo - 0.1, hi + 0.1) for lo, hi in mj.jnt_range])
    qvel = rng.normal(scale=2.0, size=mj.nv)
    mujoco.mj_resetData(mj, dref)
    dref.qpos[:] = qpos
    dref.qvel[:] = qvel
    mujoco.mj_forward(mj, dref)
    d = template.replace(qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel))
    d = fwd(d)
    if dref.nefc > 0:
      n_checked += 1
    np.testing.assert_allclose(
        np.asarray(d.qacc), dref.qacc, atol=1e-5,
        err_msg=f"qpos={qpos} nefc={dref.nefc}")
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), dref.qfrc_constraint, atol=1e-5)
  assert n_checked > 10  # ensure the limit path was actually exercised


def test_finger_full_rollout():
  """myoFinger with all constraints on: 100-step ctrl rollout stays close."""
  mj = mujoco.MjModel.from_xml_path(MYOFINGER)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(0)
  ctrls = rng.uniform(0, 1, size=(100, mj.nu))
  d = edata.make_data(m, dtype=jnp.float64)
  import jax
  import functools
  step = jax.jit(functools.partial(forward.step, m))
  for t in range(100):
    dref.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj, dref)
    d = d.replace(ctrl=jnp.asarray(ctrls[t]))
    d = step(d)
    if t == 49:
      np.testing.assert_allclose(np.asarray(d.qpos), dref.qpos, atol=1e-4)
  np.testing.assert_allclose(np.asarray(d.qpos), dref.qpos, atol=5e-3)
