"""Joint-pose matching tasks (PoseEnv).

Behavior parity with the reference PoseEnvV0
(/root/reference/myosuite/envs/myo/myobase/pose_v0.py:13-255): target joint
poses drawn from per-joint ranges (``target_type='generate'``) or fixed;
reset to init pose or uniform-random joint state; reward = weighted
{pose, bonus, act_reg, penalty} with the far-threshold termination.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class PoseEnv(MyoEnv):
  # obs/reward are contact-free: reset can skip collision + the Newton
  # solve (see MyoEnv.RESET_CONSTRAINT)
  RESET_CONSTRAINT = False
  DEFAULT_OBS_KEYS = ["qpos", "qvel", "pose_err"]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pose": 1.0,
      "bonus": 4.0,
      "act_reg": 1.0,
      "penalty": 50,
  }

  def _setup(self, target_jnt_range: dict | None = None,
             target_jnt_value: list | None = None,
             reset_type: str = "init",
             target_type: str = "generate",
             pose_thd: float = 0.35,
             viz_site_targets: tuple | None = None,
             **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.reset_type = reset_type
    self.target_type = target_type
    self.pose_thd = pose_thd
    self.far_th = 4 * np.pi / 2

    if target_jnt_range is not None:
      ids, rng = [], []
      for name, r in target_jnt_range.items():
        ids.append(m.name2id("joint", name))
        rng.append(r)
      self.target_jnt_ids = np.asarray(ids)
      self.target_jnt_qposadr = m.jnt_qposadr[self.target_jnt_ids]
      self.target_jnt_range = np.asarray(rng, dtype=np.float64)
      default_target = np.array(m.qpos0, np.float64)
      default_target[self.target_jnt_qposadr] = self.target_jnt_range.mean(1)
    else:
      self.target_jnt_ids = None
      default_target = np.asarray(target_jnt_value, np.float64)
    self.default_target = default_target

  def reset_aux(self, rng: jax.Array) -> dict:
    target = jnp.asarray(self.default_target, self.dtype)
    if self.target_type == "generate":
      lo = jnp.asarray(self.target_jnt_range[:, 0], self.dtype)
      hi = jnp.asarray(self.target_jnt_range[:, 1], self.dtype)
      draw = jax.random.uniform(rng, lo.shape, self.dtype, lo, hi)
      target = target.at[self.target_jnt_qposadr].set(draw)
    return {"target_jnt_value": target}

  def reset_qpos_qvel(self, rng: jax.Array, aux: dict):
    if self.reset_type == "random":
      m = self.model
      lo = jnp.asarray(m.jnt_range[:, 0], self.dtype)
      hi = jnp.asarray(m.jnt_range[:, 1], self.dtype)
      qpos = jax.random.uniform(rng, lo.shape, self.dtype, lo, hi)
      # map per-joint draws onto qpos addresses (hinge/slide models)
      full = jnp.asarray(self.init_qpos, self.dtype)
      full = full.at[self.model.jnt_qposadr].set(qpos)
      return full, jnp.zeros(self.model.nv, self.dtype)
    return super().reset_qpos_qvel(rng, aux)

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    obs = {
        "time": jnp.atleast_1d(data.time),
        "qpos": data.qpos,
        "qvel": data.qvel * self.dt,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
        "pose_err": aux["target_jnt_value"] - data.qpos,
    }
    return obs

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    pose_dist = jnp.linalg.norm(obs_dict["pose_err"], axis=-1)
    act_mag = jnp.linalg.norm(obs_dict["act"], axis=-1)
    if self.model.na:
      act_mag = act_mag / self.model.na
    return {
        "pose": -1.0 * pose_dist,
        "bonus": 1.0 * (pose_dist < self.pose_thd)
                 + 1.0 * (pose_dist < 1.5 * self.pose_thd),
        "penalty": -1.0 * (pose_dist > self.far_th),
        "act_reg": -1.0 * act_mag,
        "sparse": -1.0 * pose_dist,
        "solved": pose_dist < self.pose_thd,
        "done": pose_dist > self.far_th,
    }
