"""OSL state machine parity vs the reference MyoOSLController (oracle)."""
import importlib.util
import sys

import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.envs import osl

REF = ("/root/reference/myosuite/envs/myo/assets/leg/myoosl_control.py")


def load_ref():
  spec = importlib.util.spec_from_file_location("myoosl_ref", REF)
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  return mod


STATES = ["e_stance", "l_stance", "e_swing", "l_swing"]


def test_osl_parity_random_walk():
  ref_mod = load_ref()
  mass = 75.0
  ctrl = ref_mod.MyoOSLController(body_mass=mass)
  ctrl.start()
  p = osl.OSLParams(body_weight=mass * 9.81)
  state = jnp.asarray(0)

  rng = np.random.default_rng(0)
  for t in range(300):
    sens = {
        "knee_angle": rng.uniform(-0.2, 1.3),
        "knee_vel": rng.uniform(-2, 2),
        "ankle_angle": rng.uniform(-0.6, 0.6),
        "ankle_vel": rng.uniform(-2, 2),
        "load": rng.uniform(-100, 700),
    }
    ctrl.update(sens)
    t_ref = ctrl.get_osl_torque()
    sv = jnp.asarray([sens["knee_angle"], sens["knee_vel"],
                      sens["ankle_angle"], sens["ankle_vel"],
                      sens["load"]], jnp.float64)
    state, tq = osl.step(state, sv, p)
    assert STATES[int(state)] == ctrl.STATE_MACHINE.get_current_state.get_name(), t
    np.testing.assert_allclose(float(tq[0]), t_ref["knee"], atol=1e-9)
    np.testing.assert_allclose(float(tq[1]), t_ref["ankle"], atol=1e-9)
