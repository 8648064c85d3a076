"""OSL prosthetic-leg impedance controller: 4-state gait machine, pure JAX.

Behavior parity with MyoOSLController
(/root/reference/myosuite/envs/myo/assets/leg/myoosl_control.py:10-414):
states [e_stance, l_stance, e_swing, l_swing] with the published impedance
gains and transition thresholds; branchless transition + torque evaluation
so the controller runs inside the jitted env step (the RunTrack scene itself
is blocked on missing OSL meshes in the reference asset checkout).

State encoding: 0 e_stance, 1 l_stance, 2 e_swing, 3 l_swing.
Sensor vector: [knee_angle, knee_vel, ankle_angle, ankle_vel, load].
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

_D = np.deg2rad

# per-state gains: [knee_K, knee_B, knee_theta, ankle_K, ankle_B, ankle_theta]
GAINS = np.array([
    [99.372, 3.180, _D(5), 19.874, 0.000, _D(-2)],    # e_stance
    [99.372, 1.272, _D(8), 79.498, 0.063, _D(-20)],   # l_stance
    [39.749, 0.063, _D(60), 7.949, 0.000, _D(25)],    # e_swing
    [15.899, 3.816, _D(5), 7.949, 0.000, _D(15)],     # l_swing
])

PEAK_TORQUE = np.array([142.272, 168.192])  # knee, ankle


@dataclasses.dataclass(frozen=True)
class OSLParams:
  body_weight: float            # mass * 9.81
  # override-able (set_osl_param_batch parity)
  gains: np.ndarray = dataclasses.field(
      default_factory=lambda: GAINS)


def transition(state: jax.Array, sens: jax.Array,
               p: OSLParams) -> jax.Array:
  """Next state (any matching threshold advances to the successor)."""
  knee_angle, knee_vel, ankle_angle, _, load = (
      sens[0], sens[1], sens[2], sens[3], sens[4])
  bw = p.body_weight
  adv = jnp.select(
      [state == 0, state == 1, state == 2],
      [
          (load > 0.25 * bw) | (ankle_angle > _D(6)),      # e_stance ->
          load < 0.15 * bw,                                # l_stance ->
          (knee_angle > _D(50)) | (knee_vel < _D(3)),      # e_swing ->
      ],
      (load > 0.4 * bw) | (knee_angle < _D(30)),           # l_swing ->
  )
  return jnp.where(adv, (state + 1) % 4, state)


def torque(state: jax.Array, sens: jax.Array,
           p: OSLParams) -> jax.Array:
  """[knee, ankle] impedance torques, clipped to the hardware peaks."""
  g = jnp.asarray(p.gains, sens.dtype)[state]
  knee = g[0] * (g[2] - sens[0]) - g[1] * sens[1]
  ankle = g[3] * (g[5] - sens[2]) - g[4] * sens[3]
  peak = jnp.asarray(PEAK_TORQUE, sens.dtype)
  return jnp.clip(jnp.stack([knee, ankle]), -peak, peak)


def step(state: jax.Array, sens: jax.Array, p: OSLParams):
  """Update the machine with fresh sensors and emit torques
  (MyoOSLController.update + get_osl_torque)."""
  new_state = transition(state, sens, p)
  return new_state, torque(new_state, sens, p)
