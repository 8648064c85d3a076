"""myoLeg tasks: stand/reach (this file starts the walk family).

LegReachEnv: behavior parity with the leg ReachEnvV0
(/root/reference/myosuite/envs/myo/myobase/walk_v0.py:13-180): keyframe
init pose, uniform joint randomization, per-episode targets drawn relative
to the tracked sites' reset positions, velocity-penalized reach reward.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class LegReachEnv(MyoEnv):
  DEFAULT_OBS_KEYS = ["qpos", "qvel", "tip_pos", "reach_err"]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "reach": 1.0,
      "bonus": 4.0,
      "penalty": 50,
      "act_reg": 1,
  }

  def _setup(self, target_reach_range: dict,
             joint_random_range: tuple = (0.0, 0.0),
             far_th: float = 0.35, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.far_th = far_th
    self.joint_random_range = tuple(joint_random_range)
    self.tip_sids = np.asarray(
        [m.name2id("site", s) for s in target_reach_range])
    self.target_lo = np.asarray(
        [r[0] for r in target_reach_range.values()], np.float64)
    self.target_hi = np.asarray(
        [r[1] for r in target_reach_range.values()], np.float64)
    self.n_tips = len(self.tip_sids)
    # keyframe init (walk_v0.py:55-56)
    if len(m.key_qpos):
      self.init_qpos[:] = m.key_qpos[0]
      self.init_qvel[:] = m.key_qvel[0]

  def reset_qpos_qvel(self, rng: jax.Array, aux: dict):
    qpos = jnp.asarray(self.init_qpos, self.dtype)
    lo, hi = self.joint_random_range
    if hi > lo:
      m = self.model
      rnd = jax.random.uniform(
          rng, (len(m.jnt_qposadr),), self.dtype, lo, hi)
      jadr = m.jnt_qposadr
      new = jnp.clip(qpos[jadr] + rnd,
                     jnp.asarray(m.jnt_range[:, 0], self.dtype),
                     jnp.asarray(m.jnt_range[:, 1], self.dtype))
      qpos = qpos.at[jadr].set(new)
    return qpos, jnp.asarray(self.init_qvel, self.dtype)

  def post_reset_aux(self, data: Data, aux: dict, rng: jax.Array) -> dict:
    lo = jnp.asarray(self.target_lo, self.dtype)
    hi = jnp.asarray(self.target_hi, self.dtype)
    off = jax.random.uniform(rng, lo.shape, self.dtype, lo, hi)
    return {**aux, "target_pos": data.site_xpos[self.tip_sids] + off}

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    tip_pos = data.site_xpos[self.tip_sids]
    return {
        "time": jnp.atleast_1d(data.time),
        "qpos": data.qpos,
        "qvel": data.qvel * self.dt,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
        "tip_pos": tip_pos.ravel(),
        "reach_err": (aux["target_pos"] - tip_pos).ravel(),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    reach_dist = jnp.linalg.norm(obs_dict["reach_err"], axis=-1)
    vel_dist = jnp.linalg.norm(obs_dict["qvel"], axis=-1)
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    far_th = jnp.where(data.time > 2 * self.dt,
                       self.far_th * self.n_tips, jnp.inf)
    near_th = self.n_tips * 0.050
    return {
        "reach": 10.0 - 1.0 * reach_dist - 10.0 * vel_dist,
        "bonus": 1.0 * (reach_dist < 2 * near_th)
                 + 1.0 * (reach_dist < near_th),
        "act_reg": -100.0 * act_mag,
        "penalty": -1.0 * (reach_dist > far_th),
        "sparse": -1.0 * reach_dist,
        "solved": reach_dist < near_th,
        "done": reach_dist > far_th,
    }
