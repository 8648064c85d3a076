"""Parity on the flagship models: myoHand (39 MTUs) and myoElbow."""
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel

HAND = "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml"
ELBOW = "/root/reference/myosuite/simhive/myo_sim/elbow/myoelbow_1dof6muscles.xml"


@pytest.mark.parametrize("path,tol_frc,tol_acc", [
    (ELBOW, 1e-8, 1e-6),
    # hand tolerance reflects the oracle's MPR-approximate ellipsoid
    # contacts (we compute exact distances) on tiny-inertia distal dofs
    (HAND, 1e-3, 5.0),
])
def test_forward_parity_reached_states(path, tol_frc, tol_acc):
  """Forward parity at states reached by simulating random muscle ctrl.

  (Uniform-random qpos puts fingers in deep self-penetration the dynamics
  would never visit; reached states are the meaningful contract.)
  """
  mj = emodel.load_mj_model(path)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(0)
  template = edata.make_data(m, dtype=jnp.float64)
  import jax
  import functools
  fwd = jax.jit(functools.partial(forward.forward, m))
  for t in range(150):
    dref.ctrl[:] = rng.uniform(0, 1, mj.nu)
    mujoco.mj_step(mj, dref)
    if (t + 1) % 25 != 0:
      continue
    mujoco.mj_forward(mj, dref)
    d = template.replace(
        qpos=jnp.asarray(dref.qpos.copy()),
        qvel=jnp.asarray(dref.qvel.copy()),
        ctrl=jnp.asarray(dref.ctrl.copy()),
        act=jnp.asarray(dref.act.copy()))
    d = fwd(d)
    np.testing.assert_allclose(
        np.asarray(d.ten_length), dref.ten_length, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(d.actuator_force), dref.actuator_force, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_bias), dref.qfrc_bias, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(d.qfrc_constraint), dref.qfrc_constraint, atol=tol_frc)
    np.testing.assert_allclose(np.asarray(d.qacc), dref.qacc, atol=tol_acc)
