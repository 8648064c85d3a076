"""MyoChallenge Baoding: rotate two balls in the palm along target ellipses.

Behavior parity with BaodingEnvV1
(/root/reference/myosuite/envs/myo/myochallenge/baoding_v1.py:25-410):
procedural goal trajectory (HOLD / CW / CCW), per-episode radii and time
period, ball-drop termination. Targets are realized by re-positioning the
target sites in the trapezium frame; here the target world positions are
computed directly from the trapezium body pose each step.
(P2's ball size/mass/friction randomization is a model mutation in the
reference and is deferred to the model-overlay DR path.)
"""
from __future__ import annotations

import enum

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv


class Task(enum.IntEnum):
  HOLD = 0
  BAODING_CW = 1
  BAODING_CCW = 2


_TASK_SIGN = {Task.HOLD: 0.0, Task.BAODING_CW: -1.0, Task.BAODING_CCW: 1.0}


class BaodingEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "hand_pos", "object1_pos", "object1_velp", "object2_pos",
      "object2_velp", "target1_pos", "target2_pos",
      "target1_err", "target2_err",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pos_dist_1": 5.0,
      "pos_dist_2": 5.0,
  }

  def _setup(self, drop_th=1.25, proximity_th=0.015,
             goal_time_period=(5, 5), goal_xrange=(0.025, 0.025),
             goal_yrange=(0.028, 0.028), task_choice="fixed",
             obj_size_range=None, obj_mass_range=None,
             obj_friction_change=None, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.obj_size_range = obj_size_range
    self.obj_mass_range = obj_mass_range
    self.obj_friction_change = obj_friction_change
    self.ball_bids = (m.name2id("body", "ball1"), m.name2id("body", "ball2"))
    self.ball_gids = (m.name2id("geom", "ball1"), m.name2id("geom", "ball2"))
    self.drop_th = drop_th
    self.proximity_th = proximity_th
    self.goal_time_period = tuple(goal_time_period)
    self.goal_xrange = tuple(goal_xrange)
    self.goal_yrange = tuple(goal_yrange)
    self.task_choice = task_choice
    self.center_pos = np.array([-0.0125, -0.07])
    self.object1_sid = m.name2id("site", "ball1_site")
    self.object2_sid = m.name2id("site", "ball2_site")
    self.target1_sid = m.name2id("site", "target1_site")
    self.target2_sid = m.name2id("site", "target2_site")
    self.palm_bid = int(m.site_bodyid[self.target1_sid])
    self.target_z = (float(m.site_pos[self.target1_sid][2]),
                     float(m.site_pos[self.target2_sid][2]))

  def reset_aux(self, rng: jax.Array) -> dict:
    k1, k2, k3, k4, k5 = jax.random.split(rng, 5)
    if self.task_choice == "random":
      sign = jnp.asarray([0.0, -1.0, 1.0], self.dtype)[
          jax.random.randint(k1, (), 0, 3)]
      angle1 = jax.random.uniform(k2, (), self.dtype, 0, 2 * jnp.pi)
    else:
      sign = jnp.asarray(_TASK_SIGN[Task.BAODING_CCW], self.dtype)
      angle1 = jnp.asarray(np.pi / 4.0, self.dtype)
    return {
        "sign": sign,
        "angle1": angle1,
        "x_radius": jax.random.uniform(
            k3, (), self.dtype, *self.goal_xrange),
        "y_radius": jax.random.uniform(
            k4, (), self.dtype, *self.goal_yrange),
        "time_period": jax.random.uniform(
            k5, (), self.dtype, *self.goal_time_period),
    }

  def reset_overlay(self, rng, aux):
    if not (self.obj_size_range or self.obj_mass_range
            or self.obj_friction_change):
      return {}
    m = self.model
    k1, k2, k3 = jax.random.split(rng, 3)
    out = {}
    if self.obj_size_range:
      draws = jax.random.uniform(
          k1, (2,), self.dtype, *self.obj_size_range)
      sizes = jnp.asarray(m.geom_size, self.dtype)
      for i, g in enumerate(self.ball_gids):
        sizes = sizes.at[g, 0].set(draws[i])
      out["geom_size"] = sizes
    if self.obj_mass_range:
      draws = jax.random.uniform(
          k2, (2,), self.dtype, *self.obj_mass_range)
      masses = jnp.asarray(m.body_mass, self.dtype)
      for i, b in enumerate(self.ball_bids):
        masses = masses.at[b].set(draws[i])
      out["body_mass"] = masses
    if self.obj_friction_change:
      delta = jnp.asarray(self.obj_friction_change, self.dtype)
      nominal = jnp.asarray(m.geom_friction, self.dtype)
      draws = jax.random.uniform(
          k3, (2, 3), self.dtype, -delta, delta)
      fric = nominal
      for i, g in enumerate(self.ball_gids):
        fric = fric.at[g].set(nominal[g] + draws[i])
      out["geom_friction"] = fric
    return out

  def _target_world(self, data: Data, aux: dict):
    """Target site world positions for the current step."""
    t = data.time  # counter * dt
    base = aux["sign"] * 2 * jnp.pi * (t / aux["time_period"])
    a1 = base + aux["angle1"]
    a2 = base + aux["angle1"] - jnp.pi
    cx, cy = self.center_pos
    local1 = jnp.stack([aux["x_radius"] * jnp.cos(a1) + cx,
                        aux["y_radius"] * jnp.sin(a1) + cy,
                        jnp.asarray(self.target_z[0], self.dtype)])
    local2 = jnp.stack([aux["x_radius"] * jnp.cos(a2) + cx,
                        aux["y_radius"] * jnp.sin(a2) + cy,
                        jnp.asarray(self.target_z[1], self.dtype)])
    bpos = data.xpos[self.palm_bid]
    bmat = data.xmat[self.palm_bid]
    return bpos + bmat @ local1, bpos + bmat @ local2

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    t1, t2 = self._target_world(data, aux)
    o1 = data.site_xpos[self.object1_sid]
    o2 = data.site_xpos[self.object2_sid]
    return {
        "time": jnp.atleast_1d(data.time),
        "hand_pos": data.qpos[:-14],
        "object1_pos": o1,
        "object2_pos": o2,
        "object1_velp": data.qvel[-12:-9] * self.dt,
        "object2_velp": data.qvel[-6:-3] * self.dt,
        "target1_pos": t1,
        "target2_pos": t2,
        "target1_err": t1 - o1,
        "target2_err": t2 - o2,
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    d1 = jnp.linalg.norm(obs_dict["target1_err"], axis=-1)
    d2 = jnp.linalg.norm(obs_dict["target2_err"], axis=-1)
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    is_fall = ((obs_dict["object1_pos"][2] < self.drop_th)
               | (obs_dict["object2_pos"][2] < self.drop_th))
    return {
        "pos_dist_1": -1.0 * d1,
        "pos_dist_2": -1.0 * d2,
        "act_reg": -1.0 * act_mag,
        "sparse": -(d1 + d2),
        "solved": ((d1 < self.proximity_th) & (d2 < self.proximity_th)
                   & (~is_fall)),
        "done": is_fall,
    }
