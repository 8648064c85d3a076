"""MyoChallenge manipulation: relocate an object into a receptacle.

Behavior parity with RelocateEnvV0
(/root/reference/myosuite/envs/myo/myochallenge/relocate_v0.py:14-264):
per-episode goal pose (absolute xyz box + euler range), optional object
spawn randomization and joint-noise init, palm-distance drop termination.
Goals live in aux (the reference mutates the static target body).
(Object geometry/mass/friction randomization deferred to the model-overlay
DR path.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.ops import quat as qmath


class RelocateEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "hand_qpos", "hand_qvel", "obj_pos", "goal_pos", "pos_err",
      "obj_rot", "goal_rot", "rot_err",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pos_dist": 100.0,
      "rot_dist": 1.0,
  }

  def _setup(self, target_xyz_range, target_rxryrz_range,
             obj_xyz_range=None, qpos_noise_range=None,
             obj_geom_range=None, obj_mass_range=None,
             obj_friction_range=None,
             pos_th=0.025, rot_th=0.262, drop_th=0.50, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.target_xyz_range = {k: np.asarray(v)
                             for k, v in target_xyz_range.items()}
    self.target_rxryrz_range = {k: np.asarray(v)
                                for k, v in target_rxryrz_range.items()}
    self.obj_xyz_range = (None if obj_xyz_range is None else
                          {k: np.asarray(v)
                           for k, v in obj_xyz_range.items()})
    self.qpos_noise_range = qpos_noise_range
    self.pos_th = pos_th
    self.rot_th = rot_th
    self.drop_th = drop_th
    self.palm_sid = m.name2id("site", "S_grasp")
    self.object_sid = m.name2id("site", "object_o")
    self.goal_sid = m.name2id("site", "target_o")
    self.goal_bid = m.name2id("body", "target")
    self.goal_site_local_pos = np.asarray(m.site_pos[self.goal_sid])
    self.goal_site_local_quat = np.asarray(m.site_quat[self.goal_sid])
    key = 0 if self.obj_xyz_range is None else 1
    self.init_qpos[:] = m.key_qpos[key]

  def reset_aux(self, rng: jax.Array) -> dict:
    k1, k2 = jax.random.split(rng)
    pos = jax.random.uniform(
        k1, (3,), self.dtype,
        jnp.asarray(self.target_xyz_range["low"], self.dtype),
        jnp.asarray(self.target_xyz_range["high"], self.dtype))
    euler = jax.random.uniform(
        k2, (3,), self.dtype,
        jnp.asarray(self.target_rxryrz_range["low"], self.dtype),
        jnp.asarray(self.target_rxryrz_range["high"], self.dtype))
    return {"goal_body_pos": pos,
            "goal_body_quat": qmath.euler_to_quat(euler)}

  def reset_qpos_qvel(self, rng: jax.Array, aux: dict):
    qpos = jnp.asarray(self.init_qpos, self.dtype)
    k1, k2 = jax.random.split(rng)
    if self.obj_xyz_range is not None:
      # free-joint object world spawn (qpos tail: 3 pos + 4 quat)
      spawn = jax.random.uniform(
          k1, (3,), self.dtype,
          jnp.asarray(self.obj_xyz_range["low"], self.dtype),
          jnp.asarray(self.obj_xyz_range["high"], self.dtype))
      qpos = qpos.at[-7:-4].set(spawn)
    if self.qpos_noise_range:
      m = self.model
      noise = jax.random.uniform(
          k2, (m.nq,), self.dtype,
          -self.qpos_noise_range, self.qpos_noise_range)
      # joints only; keep the object pose exact
      qpos = qpos.at[:-7].add(noise[:-7])
    return qpos, jnp.zeros(self.model.nv, self.dtype)

  def _goal_site(self, aux):
    pos = aux["goal_body_pos"] + qmath.quat_rotate(
        aux["goal_body_quat"],
        jnp.asarray(self.goal_site_local_pos, self.dtype))
    quat = qmath.quat_mul(
        aux["goal_body_quat"],
        jnp.asarray(self.goal_site_local_quat, self.dtype))
    return pos, qmath.quat_to_euler(quat)

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    goal_pos, goal_rot = self._goal_site(aux)
    obj_pos = data.site_xpos[self.object_sid]
    palm_pos = data.site_xpos[self.palm_sid]
    obj_rot = qmath.mat_to_euler(data.site_xmat[self.object_sid])
    return {
        "time": jnp.atleast_1d(data.time),
        "hand_qpos": data.qpos[:-7],
        "hand_qvel": data.qvel[:-6] * self.dt,
        "obj_pos": obj_pos,
        "goal_pos": goal_pos,
        "palm_pos": palm_pos,
        "pos_err": goal_pos - obj_pos,
        "reach_err": palm_pos - obj_pos,
        "obj_rot": obj_rot,
        "goal_rot": goal_rot,
        "rot_err": goal_rot - obj_rot,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    reach_dist = jnp.abs(jnp.linalg.norm(obs_dict["reach_err"], axis=-1))
    pos_dist = jnp.abs(jnp.linalg.norm(obs_dict["pos_err"], axis=-1))
    rot_dist = jnp.abs(jnp.linalg.norm(obs_dict["rot_err"], axis=-1))
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    drop = reach_dist > self.drop_th
    return {
        "pos_dist": -1.0 * pos_dist,
        "rot_dist": -1.0 * rot_dist,
        "act_reg": -1.0 * act_mag,
        "sparse": -rot_dist - 10.0 * pos_dist,
        "solved": (pos_dist < self.pos_th)
                  & (rot_dist < self.rot_th) & (~drop),
        "done": drop,
    }
