"""Reference motions (FIXED / RANDOM / TRACK) — traceable, vmap-safe.

Capability parity with the reference's two implementations
(/root/reference/myosuite/logger/reference_motion.py:34 — NumPy — and
/root/reference/myosuite/mjx/reference_motion.py:36 — JAX), redesigned for
tracing: time lookup is a `jnp.searchsorted` over the clip (no Python index
cache, SURVEY.md hard-part #4), interpolation is branchless, and RANDOM
references consume an explicit PRNG key. This also fixes the reference's
JAX-port bugs: the `(1-blend) ** x` typo, the missing parentheses in the
blend denominator, and the fixed PRNGKey(0) drawn on every call
(reference_motion.py:228, 271-279).
"""
from __future__ import annotations

import enum
import pickle

import jax
import jax.numpy as jnp
import numpy as np

_TIME_PRECISION = 4


class ReferenceType(enum.Enum):
  FIXED = 0
  RANDOM = 1
  TRACK = 2


class ReferenceMotion:
  """Loads npz/pkl/dict reference clips; pure-function queries."""

  def __init__(self, reference_data, motion_extrapolation: bool = True,
               dtype=jnp.float32):
    self.dtype = dtype
    self.motion_extrapolation = motion_extrapolation
    ref = self._load(reference_data)

    time = np.around(np.asarray(ref["time"], np.float64), _TIME_PRECISION)
    robot = ref.get("robot")
    obj = ref.get("object")
    robot_shape = robot.shape if robot is not None else (0, 0)
    object_shape = obj.shape if obj is not None else (0, 0)
    self.robot_dim = robot_shape[1]
    self.object_dim = object_shape[1]
    self.robot_horizon = robot_shape[0]
    self.object_horizon = object_shape[0]
    self.horizon = max(robot_shape[0], object_shape[0])

    if self.horizon > 2:
      self.type = ReferenceType.TRACK
    elif self.horizon == 2:
      self.type = ReferenceType.RANDOM
    elif self.horizon == 1:
      self.type = ReferenceType.FIXED
    else:
      raise ValueError("reference values not per spec")

    robot_vel = ref.get("robot_vel")
    if robot_vel is None and robot is not None and self.horizon > 2:
      robot_vel = np.gradient(np.asarray(robot), time, axis=0)

    if self.type == ReferenceType.RANDOM:
      robot_init = ref.get("robot_init",
                           None if robot is None else robot.mean(0))
      object_init = ref.get("object_init",
                            None if obj is None else obj.mean(0))
    else:
      robot_init = ref.get("robot_init",
                           None if robot is None else robot[0])
      object_init = ref.get("object_init",
                            None if obj is None else obj[0])

    as_j = lambda x: None if x is None else jnp.asarray(x, dtype)
    self.time = jnp.asarray(time, dtype)
    self.robot = as_j(robot)
    self.robot_vel = as_j(robot_vel)
    self.object = as_j(obj)
    self.robot_init = as_j(robot_init)
    self.object_init = as_j(object_init)

  @staticmethod
  def _load(reference_data) -> dict:
    if isinstance(reference_data, str):
      if reference_data.endswith("npz"):
        with np.load(reference_data, allow_pickle=True) as f:
          ref = {k: f[k] for k in f.files}
      elif reference_data.endswith((".pkl", ".pickle")):
        with open(reference_data, "rb") as f:
          ref = pickle.load(f)
      else:
        raise TypeError(f"unknown reference file {reference_data}")
    elif isinstance(reference_data, dict):
      ref = dict(reference_data)
    else:
      raise TypeError("unknown reference type")
    assert "time" in ref, "missing key (time) in reference"
    return ref

  # ---- pure queries ------------------------------------------------------

  def get_init(self):
    return self.robot_init, self.object_init

  def get_reference(self, time: jax.Array, rng: jax.Array | None = None):
    """Reference at ``time`` (traced): dict with robot/robot_vel/object.

    RANDOM references require ``rng`` (uniform draw within the range rows).
    TRACK references linearly interpolate; extrapolation clamps to the last
    frame when enabled.
    """
    if self.type == ReferenceType.FIXED:
      return dict(robot=self.robot[0] if self.robot is not None else None,
                  robot_vel=(self.robot_vel[0]
                             if self.robot_vel is not None else None),
                  object=self.object[0] if self.object is not None else None)

    if self.type == ReferenceType.RANDOM:
      assert rng is not None, "RANDOM reference requires a PRNG key"
      k1, k2, k3 = jax.random.split(rng, 3)
      draw = lambda k, arr: (None if arr is None else jax.random.uniform(
          k, arr[0].shape, self.dtype, arr[0], arr[1]))
      return dict(robot=draw(k1, self.robot),
                  robot_vel=draw(k2, self.robot_vel),
                  object=draw(k3, self.object))

    # TRACK: branchless searchsorted + lerp
    t = jnp.asarray(time, self.dtype)
    tmax = self.time[-1]
    if self.motion_extrapolation:
      t = jnp.minimum(t, tmax)
    idx = jnp.clip(
        jnp.searchsorted(self.time, t, side="right") - 1,
        0, self.horizon - 2)
    t0 = self.time[idx]
    t1 = self.time[idx + 1]
    blend = jnp.clip((t - t0) / jnp.maximum(t1 - t0, 1e-12), 0.0, 1.0)

    def lerp(arr, horizon):
      if arr is None:
        return None
      if horizon <= 1:
        return arr[0]
      return (1.0 - blend) * arr[idx] + blend * arr[idx + 1]

    return dict(robot=lerp(self.robot, self.robot_horizon),
                robot_vel=lerp(self.robot_vel, self.robot_horizon),
                object=lerp(self.object, self.object_horizon))
