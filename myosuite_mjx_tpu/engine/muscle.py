"""Muscle actuator model: FLV force curves and activation dynamics.

The differentiating subsystem of a musculoskeletal engine (SURVEY.md §7
step 3). Implements MuJoCo muscle semantics — the ``gaintype/biastype/dyntype
= "muscle"`` actuators every Myo model is built from (e.g.
/root/reference/myosuite/simhive/myo_sim/leg/assets/myolegs_assets.xml:24) —
as branchless batched JAX, unit-tested against mju_muscleGain /
mju_muscleBias / mju_muscleDynamics.

Parameter layout (model.actuator_gainprm / biasprm, 9 used entries):
  [range0, range1, force, scale, lmin, lmax, vmax, fpmax, fvmax]
dynprm: [tau_act, tau_deact, smoothing_width].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_MINVAL = 1e-15


def _bump(L: jax.Array, A: jax.Array, mid: jax.Array,
          B: jax.Array) -> jax.Array:
  """Skewed C1 bump: 0 at A and B, 1 at mid (MuJoCo FL curve shape)."""
  left = 0.5 * (A + mid)
  right = 0.5 * (mid + B)

  xl = (L - A) / jnp.maximum(left - A, _MINVAL)
  yl = 0.5 * xl * xl
  xml = (mid - L) / jnp.maximum(mid - left, _MINVAL)
  yml = 1.0 - 0.5 * xml * xml
  xmr = (L - mid) / jnp.maximum(right - mid, _MINVAL)
  ymr = 1.0 - 0.5 * xmr * xmr
  xr = (B - L) / jnp.maximum(B - right, _MINVAL)
  yr = 0.5 * xr * xr

  out = jnp.where(L < left, yl,
                  jnp.where(L < mid, yml,
                            jnp.where(L < right, ymr, yr)))
  return jnp.where((L <= A) | (L >= B), 0.0, out)


def _norm_length_vel(length, vel, lengthrange, prm):
  """Normalized muscle length L (L0 units) and velocity V (L0/vmax units)."""
  range0, range1 = prm[..., 0], prm[..., 1]
  vmax = prm[..., 6]
  L0 = (lengthrange[..., 1] - lengthrange[..., 0]) / jnp.maximum(
      range1 - range0, _MINVAL)
  L = range0 + (length - lengthrange[..., 0]) / jnp.maximum(L0, _MINVAL)
  V = vel / jnp.maximum(L0 * vmax, _MINVAL)
  return L, V


def _effective_force(prm, acc0):
  """force param; if negative, auto-scale from characteristic accel."""
  force = prm[..., 2]
  scale = prm[..., 3]
  return jnp.where(force < 0,
                   scale / jnp.maximum(acc0, _MINVAL),
                   force)


def muscle_gain(length: jax.Array, vel: jax.Array, lengthrange: jax.Array,
                acc0: jax.Array, prm: jax.Array) -> jax.Array:
  """Active force gain: gain = -force * FL(L) * FV(V)  (mju_muscleGain).

  Batched over leading dims; prm is [..., 9].
  """
  lmin, lmax = prm[..., 4], prm[..., 5]
  fvmax = prm[..., 8]
  L, V = _norm_length_vel(length, vel, lengthrange, prm)
  force = _effective_force(prm, acc0)

  FL = _bump(L, lmin, jnp.ones_like(L), lmax)

  y = fvmax - 1.0
  FV = jnp.where(
      V <= -1.0, 0.0,
      jnp.where(
          V <= 0.0, (V + 1.0) * (V + 1.0),
          jnp.where(V <= y,
                    fvmax - (y - V) * (y - V) / jnp.maximum(y, _MINVAL),
                    fvmax)))
  return -force * FL * FV


def muscle_bias(length: jax.Array, lengthrange: jax.Array, acc0: jax.Array,
                prm: jax.Array) -> jax.Array:
  """Passive force: bias = -force * FP(L)  (mju_muscleBias)."""
  lmax = prm[..., 5]
  fpmax = prm[..., 7]
  L, _ = _norm_length_vel(length, jnp.zeros_like(length), lengthrange, prm)
  force = _effective_force(prm, acc0)

  # quadratic up to the halfway point b, then linear extension with
  # matched value and slope (verified pointwise against mju_muscleBias)
  b = 0.5 * (1.0 + lmax)
  x = (L - 1.0) / jnp.maximum(b - 1.0, _MINVAL)
  FP = jnp.where(L <= 1.0, 0.0,
                 jnp.where(L <= b, 0.5 * fpmax * x * x,
                           fpmax * (x - 0.5)))
  return -force * FP


def muscle_dynamics(ctrl: jax.Array, act: jax.Array,
                    prm: jax.Array) -> jax.Array:
  """Activation dynamics act_dot (mju_muscleDynamics).

  Larger activation speeds activation up and deactivation down (3-element
  dynprm: tau_act, tau_deact, smoothing_width). smoothing_width > 0 blends
  the two time constants with a sigmoid instead of a hard switch.
  """
  tau_act = prm[..., 0]
  tau_deact = prm[..., 1]
  width = prm[..., 2]

  c = jnp.clip(ctrl, 0.0, 1.0)
  a = jnp.clip(act, 0.0, 1.0)   # only the time constants see clamped act
  dctrl = c - act

  tau_a = tau_act * (0.5 + 1.5 * a)
  tau_d = tau_deact / (0.5 + 1.5 * a)

  # hard switch (width == 0) or sigmoidal blend centered at dctrl = 0
  x = 0.5 + dctrl / jnp.maximum(width, _MINVAL)
  sig = _smooth_step(x)
  blend = jnp.where(width <= 0, (dctrl > 0).astype(c.dtype), sig)
  tau = tau_d + (tau_a - tau_d) * blend
  return dctrl / jnp.maximum(tau, _MINVAL)


def _smooth_step(x: jax.Array) -> jax.Array:
  """Quintic smoothstep on [0, 1], clamped outside (mju_sigmoid)."""
  xc = jnp.clip(x, 0.0, 1.0)
  return xc * xc * xc * (3.0 * xc * (2.0 * xc - 5.0) + 10.0)
