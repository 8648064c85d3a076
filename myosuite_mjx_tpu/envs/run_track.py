"""MyoChallenge-2024 RunTrack: trans-femoral myoLeg + OSL prosthesis.

Behavior parity with RunTrack (/root/reference/myosuite/envs/myo/
myochallenge/run_track_v0.py:32-945): 54-muscle action space with the two
OSL torque actuators driven internally by the 4-state impedance machine
(envs/osl.py, parity-tested against myoosl_control.py), per-episode track
terrain (flat / random / random_mixed difficulty schedules), keyframe or
gait-cycle-data initialization with height adjustment, and the win/lose/
score rules (run forward to y < end_pos; lose on leaving the track, going
backward past start+2, or falling).

The OSL "load" input and the socket_force obs read the real site <force>
sensors (r_osl_load / r_socket_load) through the engine's
mj_rnePostConstraint-equivalent (engine/sensors.force_sensor,
parity-tested in tests/test_sensors.py). Remaining approximation,
documented inline: the per-joint pain signal reads the engine's
joint-limit constraint forces directly (Data.efc_force_limit) instead of
re-projecting efc rows through mj_mulJacTVec.
"""
from __future__ import annotations

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine import constraint, sensors
from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs import osl
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.envs.heightfields import (ChallengeTrackField,
                                                local_heightmap)
from myosuite_mjx_tpu.ops import quat as qmath

# run_track_v0.py:58-91
PAIN_JNT = [
    "hip_adduction_l", "hip_adduction_r", "hip_flexion_l", "hip_flexion_r",
    "hip_rotation_l", "hip_rotation_r", "knee_angle_l",
    "knee_angle_l_rotation2", "knee_angle_l_rotation3", "mtp_angle_l",
    "ankle_angle_l", "subtalar_angle_l",
]
BIOLOGICAL_JNT = [
    "hip_adduction_l", "hip_flexion_l", "hip_rotation_l", "hip_adduction_r",
    "hip_flexion_r", "hip_rotation_r", "knee_angle_l",
    "knee_angle_l_beta_rotation1", "knee_angle_l_beta_translation1",
    "knee_angle_l_beta_translation2", "knee_angle_l_rotation2",
    "knee_angle_l_rotation3", "knee_angle_l_translation1",
    "knee_angle_l_translation2", "mtp_angle_l", "ankle_angle_l",
    "subtalar_angle_l",
]
# run_track_v0.py:92-147 (the obs order for muscle length/velocity/force)
BIOLOGICAL_ACT = [
    "addbrev_l", "addbrev_r", "addlong_l", "addlong_r", "addmagDist_l",
    "addmagIsch_l", "addmagMid_l", "addmagProx_l", "bflh_l", "bfsh_l",
    "edl_l", "ehl_l", "fdl_l", "fhl_l", "gaslat_l", "gasmed_l", "glmax1_l",
    "glmax1_r", "glmax2_l", "glmax2_r", "glmax3_l", "glmax3_r", "glmed1_l",
    "glmed1_r", "glmed2_l", "glmed2_r", "glmed3_l", "glmed3_r", "glmin1_l",
    "glmin1_r", "glmin2_l", "glmin2_r", "glmin3_l", "glmin3_r", "grac_l",
    "iliacus_l", "iliacus_r", "perbrev_l", "perlong_l", "piri_l", "piri_r",
    "psoas_l", "psoas_r", "recfem_l", "sart_l", "semimem_l", "semiten_l",
    "soleus_l", "tfl_l", "tibant_l", "tibpost_l", "vasint_l", "vaslat_l",
    "vasmed_l",
]
# gait-cycle row index -> OSL machine state (run_track_v0.py:203-218);
# state codes follow envs/osl.py (0 e_stance, 1 l_stance, 2 e_swing,
# 3 l_swing)
_GAIT_STATE_BOUNDS = [(0, 48, 2), (48, 99, 3), (99, 183, 0), (183, 247, 1)]


class RunTrackEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "internal_qpos", "internal_qvel", "grf", "torso_angle",
      "model_root_pos", "model_root_vel", "muscle_length",
      "muscle_velocity", "muscle_force",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "sparse": 1,
      "solved": +10,
  }

  def _setup(self, reset_type="random", terrain="flat",
             hills_difficulties=(0, 0), rough_difficulties=(0, 0),
             stairs_difficulties=(0, 0), real_width=1.0, end_pos=-15,
             start_pos=14, init_pose_path=None, osl_param_set=4,
             max_episode_steps=1000, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.action_dim = int(m.na)  # OSL motors are internally controlled
    self.reset_type = reset_type
    self.real_width = float(real_width)
    self.end_pos = float(end_pos)
    self.start_pos = float(start_pos)
    self.max_time = self.dt * max_episode_steps

    self.pelvis_bid = m.name2id("body", "pelvis")
    self.head_sid = m.name2id("site", "head")
    self.talus_l_bid = m.name2id("body", "talus_l")
    self.osl_foot_bid = m.name2id("body", "osl_foot_assembly")
    self.grf_sensors = ["l_foot", "l_toes"]
    self.osl_touch = int(m.sensor_objid[m.name2id("sensor", "r_osl_foot")])
    # site <force> sensors (engine/sensors.force_sensor): the OSL load
    # cell and the residual-limb socket load (run_track_v0.py:638,925-928)
    self.osl_load_site = int(m.sensor_objid[m.name2id("sensor",
                                                      "r_osl_load")])
    self.socket_site = int(m.sensor_objid[m.name2id("sensor",
                                                    "r_socket_load")])
    self.btm_sites = [m.name2id("site", s) for s in
                      ("r_heel_btm", "r_toe_btm", "l_heel_btm", "l_toe_btm")]

    self._bio_qadr = np.array(
        [m.jnt_qposadr[m.name2id("joint", j)] for j in BIOLOGICAL_JNT])
    self._bio_dadr = np.array(
        [m.jnt_dofadr[m.name2id("joint", j)] for j in BIOLOGICAL_JNT])
    self._bio_act = np.array(
        [m.name2id("actuator", a) for a in BIOLOGICAL_ACT])
    kq, kd = [], []
    for j in ("osl_knee_angle_r", "osl_ankle_angle_r"):
      jid = m.name2id("joint", j)
      kq.append(int(m.jnt_qposadr[jid]))
      kd.append(int(m.jnt_dofadr[jid]))
    self._osl_qadr, self._osl_dadr = kq, kd
    self._osl_act = [m.name2id("actuator", f"osl_{j}_torque_actuator")
                     for j in ("knee", "ankle")]
    self._osl_gear = np.array(
        [m.actuator_gear[a][0] for a in self._osl_act])
    self._osl_ctrlrange = np.array(
        [m.actuator_ctrlrange[a] for a in self._osl_act])
    self._osl_params = osl.OSLParams(
        body_weight=float(np.sum(m.body_mass)) * 9.81)

    # pain joints -> limited-joint slot in Data.efc_force_limit
    spec = constraint._limit_spec(m)
    dadr_to_slot = {int(d): i for i, d in enumerate(spec.jl_dadr)}
    self._pain_slots = np.array([
        dadr_to_slot[int(m.jnt_dofadr[m.name2id("joint", j)])]
        for j in PAIN_JNT if
        int(m.jnt_dofadr[m.name2id("joint", j)]) in dadr_to_slot])
    self._pain_n = len(PAIN_JNT)

    self.trackfield = ChallengeTrackField(
        int(m.hfield_nrow[0]), int(m.hfield_ncol[0]),
        rough_difficulties, hills_difficulties, stairs_difficulties,
        reset_type=terrain)
    self._hf_size = (float(m.hfield_size[0][0]), float(m.hfield_size[0][1]))

    if init_pose_path is not None:
      self._init_data = np.loadtxt(init_pose_path, skiprows=1,
                                   delimiter=",")
      with open(init_pose_path) as f:
        headers = next(csv.reader(f))
      self._gait_cols = {h: i for i, h in enumerate(headers)}
      self._gait_states = np.zeros(self._init_data.shape[0], np.int32)
      for lo, hi, s in _GAIT_STATE_BOUNDS:
        self._gait_states[lo:min(hi, len(self._gait_states))] = s
    else:
      self._init_data = None

    self.init_qpos[:] = m.key_qpos[0]
    self.init_qvel[:] = 0.0

  # ---- reset --------------------------------------------------------------

  def reset_aux(self, rng: jax.Array) -> dict:
    k_terrain, k_state = jax.random.split(rng)
    hfield, terrain_type = self.trackfield.generate(k_terrain, self.dtype)
    qpos, qvel, osl_state = self._reset_state(k_state)
    return {"hfield": hfield, "terrain_type": terrain_type,
            "osl_state": osl_state, "qpos0": qpos, "qvel0": qvel}

  def _reset_state(self, rng: jax.Array):
    m = self.model
    dtype = self.dtype
    if self.reset_type == "random":
      k_key, k_x, k_yaw = jax.random.split(rng, 3)
      idx = jax.random.randint(k_key, (), 0, 3)
      qpos = jnp.asarray(m.key_qpos[:3], dtype)[idx]
      qvel = jnp.asarray(m.key_qvel[:3], dtype)[idx]
      osl_state = jnp.where((idx == 0) | (idx == 2), 0, 2).astype(jnp.int32)
      # x / yaw randomization (run_track_v0.py:447-527)
      x = jax.random.uniform(k_x, (), dtype, -0.8 * self.real_width,
                             0.8 * self.real_width)
      yaw = jax.random.uniform(k_yaw, (), dtype, jnp.deg2rad(-125.0),
                               jnp.deg2rad(-60.0))
      eul = qmath.quat_to_euler_intrinsic(qpos[3:7])
      quat = qmath.euler_intrinsic_to_quat(
          jnp.stack([eul[0], eul[1], yaw]))
      speed = jnp.linalg.norm(qvel[:2])
      qpos = qpos.at[0].set(x).at[1].set(self.start_pos + 1).at[3:7].set(
          quat)
      qvel = qvel.at[0].set(speed * jnp.cos(yaw)).at[1].set(
          speed * jnp.sin(yaw))
      return qpos, qvel, osl_state
    if self.reset_type == "osl_init" and self._init_data is not None:
      return self._init_from_gait_data(rng)
    # "init" / fallback: stand keyframe, e_stance
    return (jnp.asarray(m.key_qpos[0], dtype),
            jnp.asarray(m.key_qvel[0], dtype), jnp.asarray(0, jnp.int32))

  def _init_from_gait_data(self, rng: jax.Array):
    """Initialize from a random gait-cycle sample (run_track_v0.py:774-829)."""
    m = self.model
    dtype = self.dtype
    n = self._init_data.shape[0]
    idx = jax.random.randint(rng, (), 0, n)
    data = jnp.asarray(self._init_data, dtype)[idx]
    qpos = jnp.asarray(m.key_qpos[0], dtype)
    qvel = jnp.zeros(m.nv, dtype)
    skip = {"pelvis_euler_roll", "pelvis_euler_pitch", "pelvis_euler_yaw",
            "l_foot_relative_X", "l_foot_relative_Y", "l_foot_relative_Z",
            "r_foot_relative_X", "r_foot_relative_Y", "r_foot_relative_Z",
            "pelvis_vel_X", "pelvis_vel_Y", "pelvis_vel_Z"}
    for name, col in self._gait_cols.items():
      if name in skip:
        continue
      qadr = int(m.jnt_qposadr[m.name2id("joint", name)])
      qpos = qpos.at[qadr].set(data[col])
    default_yaw = qmath.quat_to_euler_intrinsic(qpos[3:7])[2]
    quat = qmath.euler_intrinsic_to_quat(jnp.stack([
        data[self._gait_cols["pelvis_euler_roll"]],
        data[self._gait_cols["pelvis_euler_pitch"]],
        data[self._gait_cols["pelvis_euler_yaw"]]]))
    qpos = qpos.at[3:7].set(quat)
    vx = data[self._gait_cols["pelvis_vel_X"]]
    vy = data[self._gait_cols["pelvis_vel_Y"]]
    c, s = jnp.cos(default_yaw), jnp.sin(default_yaw)
    qvel = qvel.at[0].set(c * vx - s * vy).at[1].set(s * vx + c * vy)
    qvel = qvel.at[2].set(data[self._gait_cols["pelvis_vel_Z"]])
    osl_state = jnp.asarray(self._gait_states)[idx]
    return qpos, qvel, osl_state

  def reset_qpos_qvel(self, rng: jax.Array, aux: dict):
    qpos, qvel = aux["qpos0"], aux["qvel0"]
    if self.reset_type != "init":
      # height adjustment: lowest heel/toe site to 0.005
      # (run_track_v0.py:831-848), via an explicit kinematics pass
      from myosuite_mjx_tpu.engine import data as data_mod, smooth
      d0 = data_mod.make_data(self.model, dtype=self.dtype)
      kin = smooth.kinematics(self.model, qpos, d0.mocap_pos, d0.mocap_quat)
      lows = kin["site_xpos"][np.asarray(self.btm_sites), 2]
      qpos = qpos.at[2].add(0.005 - jnp.min(lows))
    return qpos, qvel

  def reset_overlay(self, rng: jax.Array, aux: dict) -> dict:
    return {"hfield_data": aux["hfield"]}

  # ---- OSL-in-the-loop step ------------------------------------------------

  def _osl_sens(self, data: Data) -> jax.Array:
    # load: -1 x the y-component of the r_osl_load site force sensor
    # (run_track_v0.py:925-928), via the engine's mj_rnePostConstraint-
    # style force sensor
    load = -sensors.force_sensor(self.model, data, self.osl_load_site)[1]
    return jnp.stack([
        data.qpos[self._osl_qadr[0]], data.qvel[self._osl_dadr[0]],
        data.qpos[self._osl_qadr[1]], data.qvel[self._osl_dadr[1]],
        load])

  def step(self, state, action):
    aux = dict(state.aux)
    sens = self._osl_sens(state.data).astype(self.dtype)
    new_state, torque = osl.step(aux["osl_state"], sens, self._osl_params)
    aux["osl_state"] = new_state
    # muscles: sigmoid projection; OSL: torque -> raw ctrl, clipped
    # (run_track_v0.py:869-909)
    full_action = jnp.concatenate(
        [action, jnp.zeros((2,), action.dtype)]).astype(self.dtype)
    ctrl = self._action_to_ctrl(full_action)
    gear = jnp.asarray(self._osl_gear, self.dtype)
    cr = jnp.asarray(self._osl_ctrlrange, self.dtype)
    osl_ctrl = jnp.clip(torque / gear, cr[:, 0], cr[:, 1])
    ctrl = ctrl.at[np.asarray(self._osl_act)].set(osl_ctrl)
    ctrl, aux = self._apply_muscle_condition(ctrl, aux)
    d = state.data.replace(ctrl=ctrl)

    from myosuite_mjx_tpu.engine import forward as forward_mod

    def substep(d, _):
      return forward_mod.step(self.model, d), ()

    d, _ = jax.lax.scan(substep, d, (), length=self.frame_skip)
    return self._mk_state(d, state.rng, aux, state.steps + 1)

  # ---- obs / reward --------------------------------------------------------

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    m = self.model
    grf = jnp.stack([
        sensors.touch_sensor(m, data, int(m.sensor_objid[
            m.name2id("sensor", n)])) for n in self.grf_sensors])
    hmap = local_heightmap(
        data.overlay["hfield_data"], int(m.hfield_nrow[0]),
        int(m.hfield_ncol[0]), self._hf_size, data.qpos[:2])
    return {
        "time": jnp.atleast_1d(data.time),
        "terrain": jnp.atleast_1d(aux["terrain_type"]).astype(self.dtype),
        "internal_qpos": data.qpos[self._bio_qadr],
        "internal_qvel": data.qvel[self._bio_dadr] * self.dt,
        "grf": grf,
        "socket_force": sensors.force_sensor(
            m, data, self.socket_site).astype(self.dtype),
        "torso_angle": data.xquat[self.pelvis_bid],
        "muscle_length": data.actuator_length[self._bio_act],
        "muscle_velocity": jnp.clip(
            data.actuator_velocity[self._bio_act], -100, 100),
        "muscle_force": jnp.clip(
            data.actuator_force[self._bio_act] / 1000, -100, 100),
        "model_root_pos": data.qpos[:2],
        "model_root_vel": data.qvel[:2],
        "hfield": hmap.ravel(),
        "act": data.act,
    }

  def _fallen(self, data: Data) -> jax.Array:
    head = data.site_xpos[self.head_sid]
    feet = 0.5 * (data.xpos[self.talus_l_bid] + data.xpos[self.osl_foot_bid])
    return (head[2] - feet[2] < 0.2) | (head[2] < 1.5)

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    x, y = obs_dict["model_root_pos"][0], obs_dict["model_root_pos"][1]
    vel_y = obs_dict["model_root_vel"][1]
    win = y < self.end_pos
    lose = ((jnp.abs(x) > self.real_width) | (y > self.start_pos + 2)
            | self._fallen(data))
    act_mag = jnp.mean(jnp.square(obs_dict["act"]))
    pain_f = data.efc_force_limit[np.asarray(self._pain_slots)]
    pain = jnp.sum(jnp.clip(jnp.abs(pain_f), 0, 1000) / 1000) / self._pain_n
    return {
        "act_reg": act_mag,
        "pain": pain,
        "sparse": -vel_y,
        "solved": win,
        "done": win | lose,
    }
