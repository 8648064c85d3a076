"""Parity on the flagship models: myoHand (39 MTUs) and myoElbow.

Solver-fidelity contract (docs/solver_convergence.md): the Newton solver
runs to the model-requested tolerance (no iteration cap), so the residual
difference vs CPU MuJoCo at contact-rich states is dominated by contact
GEOMETRY (the oracle's MPR/libccd-approximate ellipsoid contacts vs our
exact closest points), not convergence. Raw qacc is therefore bounded in
the physically meaningful inertia-weighted norm (M @ dqacc = generalized
force mismatch ~ the contact-force difference), plus a 50-step
trajectory-divergence bound that caps how much those geometry differences
can integrate into state error.
"""
import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel

HAND = "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml"
ELBOW = ("/root/reference/myosuite/simhive/myo_sim/elbow/"
         "myoelbow_1dof6muscles.xml")


@pytest.mark.parametrize("path,tol_frc,tol_macc", [
    (ELBOW, 1e-8, 1e-6),
    # hand: generalized-force bound; see module docstring for why raw qacc
    # is not the right metric on tiny-inertia distal dofs
    (HAND, 0.05, 0.05),
])
def test_forward_parity_reached_states(path, tol_frc, tol_macc):
  """Forward parity at states reached by simulating random muscle ctrl.

  (Uniform-random qpos puts fingers in deep self-penetration the dynamics
  would never visit; reached states are the meaningful contract.)
  """
  mj = emodel.load_mj_model(path)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(0)
  template = edata.make_data(m, dtype=jnp.float64)
  fwd = jax.jit(functools.partial(forward.forward, m))
  fullM = np.zeros((mj.nv, mj.nv))
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
    # inertia-weighted acceleration parity: M (qacc - qacc_ref) is the
    # generalized-force mismatch, invariant to tiny distal dof inertias
    mujoco.mj_fullM(mj, dref, fullM)
    dq = np.asarray(d.qacc) - dref.qacc
    np.testing.assert_allclose(fullM @ dq, np.zeros(mj.nv), atol=tol_macc)


@pytest.mark.slow
def test_hand_trajectory_divergence():
  """50 contact-rich steps from a reached state: qpos drift vs the oracle
  stays bounded (measured 4e-3 rad max; asserted at 4x headroom)."""
  mj = emodel.load_mj_model(HAND)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(0)
  ctrls = rng.uniform(0, 1, (100, mj.nu))
  for t in range(50):
    dref.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj, dref)
  d = edata.make_data(m, dtype=jnp.float64).replace(
      qpos=jnp.asarray(dref.qpos.copy()),
      qvel=jnp.asarray(dref.qvel.copy()),
      act=jnp.asarray(dref.act.copy()))
  step = jax.jit(functools.partial(forward.step, m))
  for t in range(50, 100):
    dref.ctrl[:] = ctrls[t]
    mujoco.mj_step(mj, dref)
    d = step(d.replace(ctrl=jnp.asarray(ctrls[t])))
  drift = np.abs(np.asarray(d.qpos) - dref.qpos).max()
  assert drift < 0.016, f"50-step qpos drift {drift} vs oracle"