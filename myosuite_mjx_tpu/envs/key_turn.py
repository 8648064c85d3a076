"""Key-turn task: index finger + thumb rotate a key cylinder.

Behavior parity with KeyTurnEnvV0
(/root/reference/myosuite/envs/myo/myobase/key_turn_v0.py:13-169). The key
hinge is the last dof; approach terms keep both fingertips at the keyhead.
(The Random variant's key-body position jitter is a model mutation in the
reference; the key angle randomization is reproduced here, body-pos jitter
is deferred to the model-overlay DR path.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class KeyTurnEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "hand_qpos", "hand_qvel", "key_qpos", "key_qvel",
      "IFtip_approach", "THtip_approach",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "key_turn": 1.0,
      "IFtip_approach": 10.0,
      "THtip_approach": 10.0,
      "act_reg": 1.0,
      "bonus": 4.0,
      "penalty": 25.0,
  }

  def _setup(self, goal_th: float = np.pi, key_init_range=(0.0, 0.0),
             **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.goal_th = goal_th
    self.key_init_range = tuple(key_init_range)
    self.keyhead_sid = m.name2id("site", "keyhead")
    self.IF_sid = m.name2id("site", "IFtip")
    self.TH_sid = m.name2id("site", "THtip")
    self.init_qpos[:-1] *= 0  # fully-open hand

  def reset_qpos_qvel(self, rng: jax.Array, aux: dict):
    qpos = jnp.asarray(self.init_qpos, self.dtype)
    lo, hi = self.key_init_range
    key_angle = jax.random.uniform(rng, (), self.dtype, lo, hi)
    qpos = qpos.at[-1].set(key_angle)
    return qpos, jnp.zeros(self.model.nv, self.dtype)

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    keyhead = data.site_xpos[self.keyhead_sid]
    return {
        "time": jnp.atleast_1d(data.time),
        "hand_qpos": data.qpos[:-1],
        "hand_qvel": data.qvel[:-1] * self.dt,
        "key_qpos": data.qpos[-1:],
        "key_qvel": data.qvel[-1:] * self.dt,
        "IFtip_approach": keyhead - data.site_xpos[self.IF_sid],
        "THtip_approach": keyhead - data.site_xpos[self.TH_sid],
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    IF_approach = jnp.abs(
        jnp.linalg.norm(obs_dict["IFtip_approach"], axis=-1) - 0.030)
    TH_approach = jnp.abs(
        jnp.linalg.norm(obs_dict["THtip_approach"], axis=-1) - 0.030)
    key_pos = obs_dict["key_qpos"][0]
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    far_th = 0.1
    return {
        "key_turn": key_pos,
        "IFtip_approach": -1.0 * IF_approach,
        "THtip_approach": -1.0 * TH_approach,
        "act_reg": -1.0 * act_mag,
        "bonus": 1.0 * (key_pos > np.pi / 2) + 1.0 * (key_pos > np.pi),
        "penalty": -1.0 * (IF_approach > far_th / 2)
                   - 1.0 * (TH_approach > far_th / 2),
        "sparse": key_pos,
        "solved": key_pos > self.goal_th,
        "done": (IF_approach > far_th) | (TH_approach > far_th),
    }
