"""Pen-twirl tasks: reorient a free pen to a target orientation.

Behavior parity with PenTwirlFixed/RandomEnvV0
(/root/reference/myosuite/envs/myo/myobase/pen_v0.py:15-183). The Random
variant draws a desired orientation per episode; the reference realizes it
by rotating the static target body, which we reproduce by rotating the
target sites' local axis in aux (no model mutation needed).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.ops import quat as qmath


class PenTwirlFixedEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "hand_jnt", "obj_pos", "obj_vel", "obj_rot", "obj_des_rot",
      "obj_err_pos", "obj_err_rot",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pos_align": 1.0,
      "rot_align": 1.0,
      "act_reg": 5.0,
      "drop": 5.0,
      "bonus": 10.0,
  }

  randomize_target = False

  def _setup(self, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.obj_bid = m.name2id("body", "Object")
    self.target_bid = m.name2id("body", "target")
    self.eps_ball_sid = m.name2id("site", "eps_ball")
    self.obj_t_sid = m.name2id("site", "object_top")
    self.obj_b_sid = m.name2id("site", "object_bottom")
    self.tar_t_sid = m.name2id("site", "target_top")
    self.tar_b_sid = m.name2id("site", "target_bottom")
    self.pen_length = float(np.linalg.norm(
        m.site_pos[self.obj_t_sid] - m.site_pos[self.obj_b_sid]))
    self.tar_length = float(np.linalg.norm(
        m.site_pos[self.tar_t_sid] - m.site_pos[self.tar_b_sid]))
    # target sites' axis in the target body frame (for Random re-orientation)
    self.tar_axis_local = (
        m.site_pos[self.tar_t_sid] - m.site_pos[self.tar_b_sid])
    self.init_qpos[:-6] *= 0
    self.init_qpos[0] = -1.5  # palm up

  def reset_aux(self, rng: jax.Array) -> dict:
    if not self.randomize_target:
      return {"des_rot": jnp.zeros((0,), self.dtype)}
    e = jnp.concatenate([
        jax.random.uniform(rng, (2,), self.dtype, -1.0, 1.0),
        jnp.zeros((1,), self.dtype)])
    q = qmath.euler_to_quat(e)
    axis = qmath.quat_rotate(
        q, jnp.asarray(self.tar_axis_local, self.dtype))
    return {"des_rot": axis / self.tar_length}

  def _des_rot(self, data: Data, aux: dict) -> jax.Array:
    if self.randomize_target:
      return aux["des_rot"]
    return (data.site_xpos[self.tar_t_sid]
            - data.site_xpos[self.tar_b_sid]) / self.tar_length

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    obj_pos = data.xpos[self.obj_bid]
    des_pos = data.site_xpos[self.eps_ball_sid]
    obj_rot = (data.site_xpos[self.obj_t_sid]
               - data.site_xpos[self.obj_b_sid]) / self.pen_length
    des_rot = self._des_rot(data, aux)
    return {
        "time": jnp.atleast_1d(data.time),
        "hand_jnt": data.qpos[:-6],
        "obj_pos": obj_pos,
        "obj_des_pos": des_pos,
        "obj_vel": data.qvel[-6:] * self.dt,
        "obj_rot": obj_rot,
        "obj_des_rot": des_rot,
        "obj_err_pos": obj_pos - des_pos,
        "obj_err_rot": obj_rot - des_rot,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    pos_align = jnp.linalg.norm(obs_dict["obj_err_pos"], axis=-1)
    a, b = obs_dict["obj_rot"], obs_dict["obj_des_rot"]
    rot_align = jnp.sum(a * b, axis=-1) / jnp.maximum(
        jnp.linalg.norm(a) * jnp.linalg.norm(b), 1e-12)
    dropped = pos_align > 0.075
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    return {
        "pos_align": -1.0 * pos_align,
        "rot_align": rot_align,
        "act_reg": -1.0 * act_mag,
        "drop": -1.0 * dropped,
        "bonus": 1.0 * (rot_align > 0.9) * (pos_align < 0.075)
                 + 5.0 * (rot_align > 0.95) * (pos_align < 0.075),
        "sparse": -1.0 * pos_align + rot_align,
        "solved": (rot_align > 0.95) & (~dropped),
        "done": dropped,
    }


class PenTwirlRandomEnv(PenTwirlFixedEnv):
  randomize_target = True
