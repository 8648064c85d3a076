"""Object-hold tasks: palm-up hand holds a free ellipsoid at a goal.

Behavior parity with ObjHoldFixedEnvV0 / ObjHoldRandomEnvV0
(/root/reference/myosuite/envs/myo/myobase/obj_hold_v0.py:13-142). The
Random variant randomizes the goal position per episode (the reference also
randomizes the object geom size by mutating the model; size randomization
is deferred to the model-overlay DR path).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class ObjHoldEnv(MyoEnv):
  DEFAULT_OBS_KEYS = ["hand_qpos", "hand_qvel", "obj_pos", "obj_err"]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "goal_dist": 100.0,
      "bonus": 4.0,
      "penalty": 10,
  }

  randomize_goal = False

  def _setup(self, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.object_sid = m.name2id("site", "object")
    self.goal_sid = m.name2id("site", "goal")
    # palm-up open-hand init (obj_hold_v0.py:60-61)
    self.init_qpos[:-7] *= 0
    self.init_qpos[0] = -1.5
    # world-frame object start (site is on the free body at qpos0)
    from myosuite_mjx_tpu.engine import data as data_mod, smooth
    d = data_mod.make_data(m, dtype=jnp.float64)
    kin = smooth.kinematics(
        m, jnp.asarray(m.qpos0), d.mocap_pos, d.mocap_quat)
    self.object_init_pos = np.asarray(kin["site_xpos"][self.object_sid])

  def reset_aux(self, rng: jax.Array) -> dict:
    if self.randomize_goal:
      off = jax.random.uniform(rng, (3,), self.dtype, -0.030, 0.030)
      return {"goal_pos": jnp.asarray(
          self.object_init_pos, self.dtype) + off}
    return {"goal_pos": jnp.zeros((0,), self.dtype)}  # use model site

  def _goal_pos(self, data: Data, aux: dict) -> jax.Array:
    if self.randomize_goal:
      return aux["goal_pos"]
    return data.site_xpos[self.goal_sid]

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    obj_pos = data.site_xpos[self.object_sid]
    return {
        "time": jnp.atleast_1d(data.time),
        "hand_qpos": data.qpos[:-7],
        "hand_qvel": data.qvel[:-6] * self.dt,
        "obj_pos": obj_pos,
        "obj_err": self._goal_pos(data, aux) - obj_pos,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    goal_dist = jnp.abs(jnp.linalg.norm(obs_dict["obj_err"], axis=-1))
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    goal_th = 0.010
    drop = goal_dist > 0.300
    return {
        "goal_dist": -1.0 * goal_dist,
        "bonus": 1.0 * (goal_dist < 2 * goal_th)
                 + 1.0 * (goal_dist < goal_th),
        "act_reg": -1.0 * act_mag,
        "penalty": -1.0 * drop,
        "sparse": -goal_dist,
        "solved": goal_dist < goal_th,
        "done": drop,
    }


class ObjHoldRandomEnv(ObjHoldEnv):
  """Goal-position + object-size randomization (obj_hold_v0.py:123-142)."""
  randomize_goal = True

  def reset_overlay(self, rng, aux):
    m = self.model
    size = jax.random.uniform(rng, (3,), self.dtype, 0.020, 0.030)
    sizes = jnp.asarray(m.geom_size, self.dtype).at[-1].set(size)
    return {"geom_size": sizes}
