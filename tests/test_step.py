"""Trajectory parity: our step() vs CPU MuJoCo mj_step, constraints disabled.

The cornerstone pattern from SURVEY.md §4: seeded trajectory parity against
the oracle. Constraints (contacts/limits) are disabled on both sides here;
the constrained path gets its own tests with the Newton solver.
"""
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel

MYOFINGER = "/root/reference/myosuite/simhive/myo_sim/finger/myofinger_v0.xml"
MOTORFINGER = (
    "/root/reference/myosuite/simhive/myo_sim/finger/motorfinger_v0.xml")


def make_fixture(path):
  mj = emodel.load_mj_model(path)
  mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
  m = emodel.from_mj(mj)
  d = mujoco.MjData(mj)
  return mj, m, d


@pytest.mark.parametrize("path", [MYOFINGER, MOTORFINGER])
def test_trajectory_parity_vs_mujoco(path):
  """100-step rollout stays within tight bounds of the oracle.

  (Muscle FLV + wrap transitions make long unconstrained rollouts chaotic;
  step-level parity is covered exactly by test_single_step_parity.)
  """
  mj, m, dref = make_fixture(path)
  rng = np.random.default_rng(0)
  nsteps = 50  # Lyapunov growth ~x1.35/step from machine eps caps horizon
  ctrls = rng.uniform(0, 1, size=(nsteps, mj.nu))

  import jax
  import functools
  step = jax.jit(functools.partial(forward.step, m))
  d = edata.make_data(m, dtype=jnp.float64)
  d = forward.forward(m, d)

  for t in range(nsteps):
    dref.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj, dref)
    d = d.replace(ctrl=jnp.asarray(ctrls[t]))
    d = step(d)
    if (t + 1) % 25 == 0 or t < 3:
      np.testing.assert_allclose(
          np.asarray(d.qpos), dref.qpos, atol=1e-6,
          err_msg=f"qpos diverged at step {t}")
      if mj.na:
        np.testing.assert_allclose(
            np.asarray(d.act), dref.act, atol=1e-7,
            err_msg=f"act diverged at step {t}")


def test_single_step_parity_random_states():
  """One step from 100 random in-range states matches to ~machine eps."""
  mj, m, dref = make_fixture(MYOFINGER)
  rng = np.random.default_rng(7)
  template = edata.make_data(m, dtype=jnp.float64)
  import jax
  import functools
  step = jax.jit(functools.partial(forward.step, m))
  for _ in range(100):
    qpos = np.array([rng.uniform(lo, hi) for lo, hi in mj.jnt_range])
    qvel = rng.normal(scale=1.0, size=mj.nv)
    act = rng.uniform(0, 1, mj.na)
    ctrl = rng.uniform(0, 1, mj.nu)
    mujoco.mj_resetData(mj, dref)
    dref.qpos[:] = qpos
    dref.qvel[:] = qvel
    dref.act[:] = act
    dref.ctrl[:] = ctrl
    mujoco.mj_step(mj, dref)
    d = template.replace(
        qpos=jnp.asarray(qpos), qvel=jnp.asarray(qvel),
        act=jnp.asarray(act), ctrl=jnp.asarray(ctrl))
    d = step(d)
    np.testing.assert_allclose(np.asarray(d.qpos), dref.qpos, atol=1e-12)
    np.testing.assert_allclose(np.asarray(d.qvel), dref.qvel, atol=1e-9)
    np.testing.assert_allclose(np.asarray(d.act), dref.act, atol=1e-12)


def test_actuator_force_parity():
  mj, m, dref = make_fixture(MYOFINGER)
  rng = np.random.default_rng(1)
  dref.ctrl[:] = rng.uniform(0, 1, mj.nu)
  dref.act[:] = rng.uniform(0, 1, mj.na)
  dref.qvel[:] = rng.normal(scale=0.5, size=mj.nv)
  mujoco.mj_forward(mj, dref)

  d = edata.make_data(m, dtype=jnp.float64)
  d = d.replace(ctrl=jnp.asarray(dref.ctrl), act=jnp.asarray(dref.act),
                qvel=jnp.asarray(dref.qvel))
  d = forward.forward(m, d)
  np.testing.assert_allclose(
      np.asarray(d.actuator_length), dref.actuator_length, atol=1e-10)
  np.testing.assert_allclose(
      np.asarray(d.actuator_velocity), dref.actuator_velocity, atol=1e-10)
  np.testing.assert_allclose(
      np.asarray(d.actuator_force), dref.actuator_force, atol=1e-8)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_actuator), dref.qfrc_actuator, atol=1e-8)
  np.testing.assert_allclose(
      np.asarray(d.qfrc_passive), dref.qfrc_passive, atol=1e-10)
  np.testing.assert_allclose(
      np.asarray(d.qacc_smooth), dref.qacc_smooth, atol=1e-6)
