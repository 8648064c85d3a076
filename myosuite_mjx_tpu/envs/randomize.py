"""Domain randomization: per-episode overlay sampling.

Capability parity with the reference's SimRandomizer
(/root/reference/myosuite/physics/randomize.py): body mass (:40-62), body
pos (:64-91), geom size/friction (:93-168), dof damping (:170-207),
actuator gain (:209-250). The reference mutates the live MjModel between
episodes on the host; here randomization is a pure function
``key -> overlay dict`` consumed by the engine's Data.overlay mechanism,
so every env instance in a vmapped batch draws its own physics — no model
recompile, no host round-trip.

dof_frictionloss is intentionally absent: no Myo model sets it (checked
against myohand.xml / myolegs.xml), so there is nothing for the overlay
to scale.

Usage inside a task's ``reset_overlay`` (or standalone):

    spec = RandomizeSpec(body_mass=(0.8, 1.2), dof_damping=(0.5, 2.0))
    overlay = sample_overlay(key, env.model, spec)
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class RandomizeSpec:
  """Uniform multiplicative scale ranges (lo, hi) per model field; None
  leaves the field nominal. ``body_pos`` is additive in meters."""
  body_mass: tuple | None = None          # scales model.body_mass
  body_pos: tuple | None = None           # adds U(lo, hi) per coordinate
  geom_size: tuple | None = None          # scales model.geom_size
  geom_friction: tuple | None = None      # scales model.geom_friction
  dof_damping: tuple | None = None        # scales model.dof_damping
  actuator_gain: tuple | None = None      # scales gainprm[:, :3] (kp/FLV)


def sample_overlay(key: jax.Array, model, spec: RandomizeSpec,
                   dtype=jnp.float32) -> dict:
  """Draw one overlay dict. Pure; vmap over keys for per-env physics."""
  overlay = {}
  keys = jax.random.split(key, 6)

  def _scale(k, nominal, rng):
    lo, hi = rng
    s = jax.random.uniform(k, (nominal.shape[0],), dtype, lo, hi)
    return jnp.asarray(nominal, dtype) * s.reshape(
        (-1,) + (1,) * (nominal.ndim - 1))

  if spec.body_mass is not None:
    overlay["body_mass"] = _scale(
        keys[0], jnp.asarray(model.body_mass), spec.body_mass)
  if spec.body_pos is not None:
    lo, hi = spec.body_pos
    delta = jax.random.uniform(
        keys[1], (model.nbody, 3), dtype, lo, hi)
    # world body (index 0) never moves
    delta = delta.at[0].set(0.0)
    overlay["body_pos"] = jnp.asarray(model.body_pos, dtype) + delta
  if spec.geom_size is not None:
    overlay["geom_size"] = _scale(
        keys[2], jnp.asarray(model.geom_size), spec.geom_size)
  if spec.geom_friction is not None:
    overlay["geom_friction"] = _scale(
        keys[3], jnp.asarray(model.geom_friction), spec.geom_friction)
  if spec.dof_damping is not None:
    overlay["dof_damping"] = _scale(
        keys[4], jnp.asarray(model.dof_damping), spec.dof_damping)
  if spec.actuator_gain is not None:
    lo, hi = spec.actuator_gain
    import numpy as np
    gp = jnp.asarray(model.actuator_gainprm, dtype)
    bp = jnp.asarray(model.actuator_biasprm, dtype)
    s = jax.random.uniform(keys[5], (gp.shape[0],), dtype, lo, hi)
    # scale the force-producing parameter only: FLV peak force at
    # gainprm[2] for muscle actuators, kp/gain at gainprm[0] otherwise
    # (randomize.py:240-250 sets gainprm[:, 0]; MuJoCo muscle gain layout
    # puts F_max at prm[2] — curve shape parameters stay nominal)
    from myosuite_mjx_tpu.engine.model import BiasType, GainType
    is_muscle = np.asarray(model.actuator_gaintype) == GainType.MUSCLE
    col = np.where(is_muscle, 2, 0)
    rows = np.arange(gp.shape[0])
    overlay["actuator_gainprm"] = gp.at[rows, col].set(
        gp[rows, col] * s)
    # keep the coupled bias term consistent: muscle passive force scales
    # with F_max (biasprm[2]); affine servos carry -kp at biasprm[1] and
    # -kv at biasprm[2] (reference randomize_actuators,
    # physics/randomize.py:209-250, sets biasprm[:,1]=-kp / [:,2]=-kv)
    is_affine = np.asarray(model.actuator_biastype) == BiasType.AFFINE
    bpo = bp.at[rows[is_muscle], 2].mul(s[is_muscle])
    aff = rows[is_affine & ~is_muscle]
    bpo = bpo.at[aff, 1].mul(s[aff]).at[aff, 2].mul(s[aff])
    overlay["actuator_biasprm"] = bpo
  return overlay
