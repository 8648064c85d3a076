"""Domain-randomization overlays: oracle parity + sampling contract.

Each overlay field must reproduce exactly what CPU MuJoCo computes when
the same values are written into the MjModel (the reference mutates the
live model, physics/randomize.py; we pass an overlay dict instead).
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
from myosuite_mjx_tpu.envs.randomize import RandomizeSpec, sample_overlay

MYOFINGER = ("/root/reference/myosuite/simhive/myo_sim/finger/"
             "myofinger_v0.xml")


def _rollout_ours(m, overlay, ctrls):
  d = edata.make_data(m, dtype=jnp.float64)
  if overlay:
    d = d.replace(overlay=overlay)
  d = forward.forward(m, d)
  step = jax.jit(functools.partial(forward.step, m))
  for c in ctrls:
    d = step(d.replace(ctrl=jnp.asarray(c)))
  return np.asarray(d.qpos), np.asarray(d.qvel)


def _rollout_oracle(mj, ctrls):
  dref = mujoco.MjData(mj)
  for c in ctrls:
    dref.ctrl[:] = c
    mujoco.mj_step(mj, dref)
  return dref.qpos.copy(), dref.qvel.copy()


@pytest.mark.parametrize("field", ["dof_damping", "actuator_gainprm",
                                   "body_pos"])
def test_overlay_matches_mutated_oracle(field):
  mj = emodel.load_mj_model(MYOFINGER)
  mj.opt.disableflags |= mujoco.mjtDisableBit.mjDSBL_CONSTRAINT
  m = emodel.from_mj(mj)
  rng = np.random.default_rng(11)
  ctrls = rng.uniform(0, 1, size=(20, mj.nu))

  if field == "dof_damping":
    vals = mj.dof_damping * rng.uniform(0.5, 2.0, mj.nv)
    mj.dof_damping[:] = vals
  elif field == "actuator_gainprm":
    vals = mj.actuator_gainprm.copy()
    scale = rng.uniform(0.6, 1.4, mj.nu)
    muscle = int(mujoco.mjtGain.mjGAIN_MUSCLE)  # == 2
    for u in range(mj.nu):
      col = 2 if mj.actuator_gaintype[u] == muscle else 0
      vals[u, col] *= scale[u]
    mj.actuator_gainprm[:] = vals
  else:  # body_pos
    vals = mj.body_pos + rng.uniform(-0.003, 0.003, (mj.nbody, 3))
    vals[0] = 0.0
    mj.body_pos[:] = vals

  q_ref, v_ref = _rollout_oracle(mj, ctrls)
  q_ours, v_ours = _rollout_ours(m, {field: jnp.asarray(vals)}, ctrls)
  np.testing.assert_allclose(q_ours, q_ref, atol=1e-8)
  np.testing.assert_allclose(v_ours, v_ref, atol=1e-6)


def test_sample_overlay_contract():
  m = emodel.load_model(MYOFINGER, dtype=np.float64)
  spec = RandomizeSpec(body_mass=(0.8, 1.2), body_pos=(-0.01, 0.01),
                       geom_size=(0.9, 1.1), geom_friction=(0.5, 1.5),
                       dof_damping=(0.5, 2.0), actuator_gain=(0.7, 1.3))
  ov = sample_overlay(jax.random.PRNGKey(0), m, spec, dtype=jnp.float64)
  assert set(ov) == {"body_mass", "body_pos", "geom_size", "geom_friction",
                     "dof_damping", "actuator_gainprm", "actuator_biasprm"}
  # world body never moves
  np.testing.assert_allclose(np.asarray(ov["body_pos"][0]),
                             m.body_pos[0])
  # scales within bounds
  ratio = np.asarray(ov["dof_damping"]) / np.maximum(m.dof_damping, 1e-12)
  assert (ratio >= 0.5 - 1e-6).all() and (ratio <= 2.0 + 1e-6).all()
  # muscle actuators: only the F_max column moved
  gt = np.asarray(m.actuator_gaintype)
  gp0 = np.asarray(m.actuator_gainprm)
  gpo = np.asarray(ov["actuator_gainprm"])
  mus = gt == 2
  if mus.any():
    np.testing.assert_allclose(gpo[mus][:, [0, 1]], gp0[mus][:, [0, 1]])
    assert not np.allclose(gpo[mus][:, 2], gp0[mus][:, 2])
  # different keys -> different draws; same key -> identical
  ov2 = sample_overlay(jax.random.PRNGKey(1), m, spec, dtype=jnp.float64)
  assert not np.allclose(np.asarray(ov2["dof_damping"]),
                         np.asarray(ov["dof_damping"]))
  ov3 = sample_overlay(jax.random.PRNGKey(0), m, spec, dtype=jnp.float64)
  np.testing.assert_allclose(np.asarray(ov3["body_mass"]),
                             np.asarray(ov["body_mass"]))


def test_sample_overlay_vmaps():
  m = emodel.load_model(MYOFINGER, dtype=np.float64)
  spec = RandomizeSpec(body_mass=(0.8, 1.2), dof_damping=(0.5, 2.0))
  keys = jax.random.split(jax.random.PRNGKey(5), 4)
  ovs = jax.vmap(lambda k: sample_overlay(k, m, spec,
                                          dtype=jnp.float64))(keys)
  assert ovs["body_mass"].shape == (4, m.nbody)
  assert not np.allclose(np.asarray(ovs["body_mass"][0]),
                         np.asarray(ovs["body_mass"][1]))
