"""MyoDM motion-tracking task (TrackEnv): hand + object follow a reference.

Behavior parity with the reference task surface
(/root/reference/myosuite/envs/myo/myodm/myodm_v0.py:23-341): DeepMimic-style
rewards (object com/rot exp-errors, wrist-base reward, qpos/qvel pose
rewards, lift bonus) and object/base terminations; reference lookup is the
traceable ReferenceMotion (FIXED / RANDOM / TRACK).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.logger.reference_motion import (
    ReferenceMotion, ReferenceType)
from myosuite_mjx_tpu.models import assets
from myosuite_mjx_tpu.ops import quat as qmath


class TrackEnv(MyoEnv):
  DEFAULT_OBS_KEYS = ["qp", "qv", "hand_qpos_err", "hand_qvel_err",
                      "obj_com_err"]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "pose": 0.0,
      "object": 1.0,
      "bonus": 1.0,
      "penalty": -2,
  }

  def __init__(self, object_name: str, reference, **kwargs):
    self.object_name = object_name
    model_path = assets.object_scene_xml(object_name)
    self._reference_data = reference
    super().__init__(model_path=model_path, **kwargs)

  def _setup(self, motion_start_time: float = 0.0,
             motion_extrapolation: bool = True,
             terminate_obj_fail: bool = True,
             terminate_pose_fail: bool = False,
             **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.ref = ReferenceMotion(
        self._reference_data, motion_extrapolation=motion_extrapolation,
        dtype=self.dtype)
    self.motion_start_time = motion_start_time
    self.term_obj = terminate_obj_fail
    self.term_pose = terminate_pose_fail

    # task constants (myodm_v0.py:125-147)
    self.lift_bonus_thresh = 0.02
    self.obj_err_scale = 50.0
    self.base_err_scale = 40.0
    self.lift_bonus_mag = 1.0
    self.qpos_reward_weight = 0.35
    self.qpos_err_scale = 5.0
    self.qvel_reward_weight = 0.05
    self.qvel_err_scale = 0.1
    self.obj_fail_thresh = 0.25
    self.base_fail_thresh = 0.25
    self.qpos_fail_thresh = 0.75

    self.object_bid = m.name2id("body", self.object_name)
    self.wrist_bid = m.name2id("body", "lunate")

    # init pose from the reference clip
    robot_init, object_init = self.ref.get_init()
    rd = self.ref.robot_dim
    if robot_init is not None:
      self.init_qpos[:rd] = np.asarray(robot_init)
    if object_init is not None:
      oi = np.asarray(object_init)
      self.init_qpos[rd:rd + 3] = oi[:3]
      self.init_qpos[-3:] = np.asarray(qmath.quat_to_euler(oi[3:7]))

    # lift height baseline: object com at init pose
    from myosuite_mjx_tpu.engine import data as data_mod, smooth
    d0 = data_mod.make_data(m, dtype=jnp.float64)
    kin = smooth.kinematics(
        m, jnp.asarray(self.init_qpos), d0.mocap_pos, d0.mocap_quat)
    self._lift_z = float(
        np.asarray(kin["xipos"][self.object_bid][2])) \
        + self.lift_bonus_thresh

  def reset_aux(self, rng: jax.Array) -> dict:
    if self.ref.type == ReferenceType.RANDOM:
      return {"ref_rng": jax.random.split(rng, 1)[0]}
    return {}

  def _curr_ref(self, data: Data, aux: dict) -> dict:
    rng = aux.get("ref_rng")
    return self.ref.get_reference(
        data.time + self.motion_start_time, rng)

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    ref = self._curr_ref(data, aux)
    rd = self.ref.robot_dim
    obj_com = data.xipos[self.object_bid]
    obj_rot = qmath.mat_to_quat(data.ximat[self.object_bid])
    wrist = data.xipos[self.wrist_bid]
    hand_qpos = data.qpos[:rd]
    hand_qvel = data.qvel[:rd]
    targ_qpos = ref["robot"]
    targ_qvel = (jnp.zeros(1, self.dtype) if ref["robot_vel"] is None
                 else ref["robot_vel"])
    obs = {
        "time": jnp.atleast_1d(data.time),
        "qp": data.qpos,
        "qv": data.qvel,
        "curr_hand_qpos": hand_qpos,
        "curr_hand_qvel": hand_qvel,
        "targ_hand_qpos": targ_qpos,
        "targ_hand_qvel": targ_qvel,
        "curr_obj_com": obj_com,
        "curr_obj_rot": obj_rot,
        "wrist_err": wrist,
        "base_error": obj_com - wrist,
        "targ_obj_com": ref["object"][:3],
        "targ_obj_rot": ref["object"][3:7],
        "hand_qpos_err": hand_qpos - targ_qpos,
        "hand_qvel_err": (hand_qvel - targ_qvel
                          if ref["robot_vel"] is not None
                          else jnp.zeros(1, self.dtype)),
        "obj_com_err": obj_com - ref["object"][:3],
        "act": data.act if self.model.na else jnp.zeros_like(data.qpos),
    }
    return obs

  def _rotation_distance(self, q1, q2):
    """|angle| between quaternions (myodm_v0.py rotation_distance)."""
    vel = qmath.quat_diff_vel(q2, q1, 1.0)
    return jnp.abs(vel[0])

  def _check_termination(self, obs_dict):
    norm2 = lambda x: jnp.sum(jnp.square(x))
    term = jnp.zeros((), bool)
    if self.term_obj:
      obj_term = norm2(obs_dict["obj_com_err"]) >= self.obj_fail_thresh ** 2
      base_term = norm2(obs_dict["base_error"]) >= self.base_fail_thresh ** 2
      term = term | obj_term | base_term
    if self.term_pose:
      term = term | (norm2(obs_dict["hand_qpos_err"])
                     >= self.qpos_fail_thresh)
    return term

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    norm2 = lambda x: jnp.sum(jnp.square(x))
    obj_com_err = jnp.sqrt(norm2(
        obs_dict["targ_obj_com"] - obs_dict["curr_obj_com"]))
    obj_rot_err = self._rotation_distance(
        obs_dict["curr_obj_rot"], obs_dict["targ_obj_rot"]) / jnp.pi
    obj_reward = jnp.exp(
        -self.obj_err_scale * (obj_com_err + 0.1 * obj_rot_err))
    lift_bonus = ((obs_dict["targ_obj_com"][2] >= self._lift_z)
                  & (obs_dict["curr_obj_com"][2] >= self._lift_z))
    qpos_reward = jnp.exp(
        -self.qpos_err_scale * norm2(obs_dict["hand_qpos_err"]))
    qvel_reward = jnp.exp(
        -self.qvel_err_scale * norm2(obs_dict["hand_qvel_err"]))
    base_reward = jnp.exp(
        -self.base_err_scale * jnp.sqrt(norm2(obs_dict["base_error"])))
    term = self._check_termination(obs_dict)
    return {
        "pose": (self.qpos_reward_weight * qpos_reward
                 + self.qvel_reward_weight * qvel_reward),
        "object": obj_reward + base_reward,
        "bonus": self.lift_bonus_mag * lift_bonus,
        "penalty": term.astype(self.dtype),
        "sparse": jnp.zeros((), self.dtype),
        "solved": jnp.zeros((), bool),
        "done": term,
    }
