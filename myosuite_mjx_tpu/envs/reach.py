"""Site-reaching tasks (ReachEnv).

Behavior parity with the reference ReachEnvV0
(/root/reference/myosuite/envs/myo/myobase/reach_v0.py:13-159): tip sites
must reach per-episode target positions drawn from per-site boxes; reward =
weighted {reach, bonus, penalty(, act_reg)} with near/far thresholds scaled
by the number of tips, and the grace period before the far-threshold
termination kicks in.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class ReachEnv(MyoEnv):
  # obs/reward are contact-free: reset can skip collision + the Newton
  # solve (see MyoEnv.RESET_CONSTRAINT)
  RESET_CONSTRAINT = False
  DEFAULT_OBS_KEYS = ["qpos", "qvel", "tip_pos", "reach_err"]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "reach": 1.0,
      "bonus": 4.0,
      "penalty": 50,
  }

  def _setup(self, target_reach_range: dict, far_th: float = 0.35, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.far_th = far_th
    self.tip_sids = np.asarray(
        [m.name2id("site", s) for s in target_reach_range])
    self.target_lo = np.asarray(
        [r[0] for r in target_reach_range.values()], np.float64)
    self.target_hi = np.asarray(
        [r[1] for r in target_reach_range.values()], np.float64)
    self.n_tips = len(self.tip_sids)

  def reset_aux(self, rng: jax.Array) -> dict:
    lo = jnp.asarray(self.target_lo, self.dtype)
    hi = jnp.asarray(self.target_hi, self.dtype)
    return {"target_pos": jax.random.uniform(
        rng, lo.shape, self.dtype, lo, hi)}

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    tip_pos = data.site_xpos[self.tip_sids]
    target_pos = aux["target_pos"]
    return {
        "time": jnp.atleast_1d(data.time),
        "qpos": data.qpos,
        "qvel": data.qvel * self.dt,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
        "tip_pos": tip_pos.ravel(),
        "target_pos": target_pos.ravel(),
        "reach_err": (target_pos - tip_pos).ravel(),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    reach_dist = jnp.linalg.norm(obs_dict["reach_err"], axis=-1)
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    # far-threshold grace period for the first two env steps
    far_th = jnp.where(data.time > 2 * self.dt,
                       self.far_th * self.n_tips, jnp.inf)
    near_th = self.n_tips * 0.0125
    return {
        "reach": -1.0 * reach_dist,
        "bonus": 1.0 * (reach_dist < 2 * near_th)
                 + 1.0 * (reach_dist < near_th),
        "act_reg": -1.0 * act_mag,
        "penalty": -1.0 * (reach_dist > far_th),
        "sparse": -1.0 * reach_dist,
        "solved": reach_dist < near_th,
        "done": reach_dist > far_th,
    }
