"""MyoChallenge die reorientation.

Behavior parity with ReorientEnvV0
(/root/reference/myosuite/envs/myo/myochallenge/reorient_v0.py:14-250):
per-episode goal pose (position jitter + euler-range orientation), die-drop
termination. The reference realizes goals by mutating the static target
body; here the goal pose lives in aux and the goal site's world pose is
composed on the fly. (Die size/mass/friction randomization deferred to the
model-overlay DR path.)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.ops import quat as qmath


class ReorientEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "hand_qpos_noMD5", "hand_qvel", "obj_pos", "goal_pos", "pos_err",
      "obj_rot", "goal_rot", "rot_err",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pos_dist": 100.0,
      "rot_dist": 1.0,
      "act_reg": 5.0,
      "drop": 5.0,
      "bonus": 10.0,
  }

  def _setup(self, goal_pos=(0.0, 0.0), goal_rot=(0.785, 0.785),
             pos_th=0.025, rot_th=0.262, drop_th=0.200,
             obj_size_change=0, obj_mass_range=(0.108, 0.108),
             obj_friction_change=(0, 0, 0), **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.goal_pos_range = tuple(goal_pos)
    self.goal_rot_range = tuple(goal_rot)
    self.pos_th = pos_th
    self.rot_th = rot_th
    self.drop_th = drop_th
    self.object_sid = m.name2id("site", "object_o")
    self.goal_sid = m.name2id("site", "target_o")
    self.goal_bid = m.name2id("body", "target")
    self.goal_site_local_pos = np.asarray(m.site_pos[self.goal_sid])
    self.goal_site_local_quat = np.asarray(m.site_quat[self.goal_sid])
    self.goal_body_init_pos = np.asarray(m.body_pos[self.goal_bid])
    self.init_qpos[:-7] *= 0
    self.init_qpos[0] = -1.5  # palm up
    # visualization offset between the target and object sites at init
    from myosuite_mjx_tpu.engine import data as data_mod, smooth
    d0 = data_mod.make_data(m, dtype=jnp.float64)
    kin = smooth.kinematics(
        m, jnp.asarray(m.qpos0), d0.mocap_pos, d0.mocap_quat)
    self.goal_obj_offset = np.asarray(
        kin["site_xpos"][self.goal_sid] - kin["site_xpos"][self.object_sid])
    # goal site world pos at model init (goal body on world)
    self.goal_init_pos = np.asarray(kin["site_xpos"][self.goal_sid])

  def reset_aux(self, rng: jax.Array) -> dict:
    k1, k2 = jax.random.split(rng)
    lo, hi = self.goal_pos_range
    dpos = jax.random.uniform(k1, (3,), self.dtype, lo, hi)
    rlo, rhi = self.goal_rot_range
    euler = jax.random.uniform(k2, (3,), self.dtype, rlo, rhi)
    return {
        "goal_body_pos": jnp.asarray(
            self.goal_init_pos, self.dtype) + dpos,
        "goal_body_quat": qmath.euler_to_quat(euler),
    }

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
    obj_rot = qmath.mat_to_euler(data.site_xmat[self.object_sid])
    return {
        "time": jnp.atleast_1d(data.time),
        # qpos[:-7] reproduces the reference's off-by-one (noMD5) key that
        # shipped policies depend on (reorient_v0.py:83-88)
        "hand_qpos_noMD5": data.qpos[:-7],
        "hand_qpos": data.qpos[:-6],
        "hand_qvel": data.qvel[:-6] * self.dt,
        "obj_pos": obj_pos,
        "goal_pos": goal_pos,
        "pos_err": goal_pos - obj_pos
                   - jnp.asarray(self.goal_obj_offset, self.dtype),
        "obj_rot": obj_rot,
        "goal_rot": goal_rot,
        "rot_err": goal_rot - obj_rot,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    pos_dist = jnp.abs(jnp.linalg.norm(obs_dict["pos_err"], axis=-1))
    rot_dist = jnp.abs(jnp.linalg.norm(obs_dict["rot_err"], axis=-1))
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    drop = pos_dist > self.drop_th
    return {
        "pos_dist": -1.0 * pos_dist,
        "rot_dist": -1.0 * rot_dist,
        "bonus": 1.0 * (pos_dist < 2 * self.pos_th)
                 + 1.0 * (pos_dist < self.pos_th),
        "act_reg": -1.0 * act_mag,
        "drop": -1.0 * drop,
        "penalty": -1.0 * drop,
        "sparse": -rot_dist - 10.0 * pos_dist,
        "solved": (pos_dist < self.pos_th) & (rot_dist < self.rot_th)
                  & (~drop),
        "done": drop,
    }
