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


class WalkEnv(MyoEnv):
  """Gait task: walk at a target velocity with cyclic hip motion.

  Behavior parity with WalkEnvV0
  (/root/reference/myosuite/envs/myo/myobase/walk_v0.py:184-480): gaussian
  com-velocity reward, cyclic hip-extension tracking with a phase variable,
  reference-rotation reward, hip add/rotation regularizer, height/rotation
  terminations. The com velocity here is the physical mass-weighted body
  com velocity (the reference approximates it via its com-frame cvel).
  """

  DEFAULT_OBS_KEYS = [
      "qpos_without_xy", "qvel", "com_vel", "torso_angle", "feet_heights",
      "height", "feet_rel_positions", "phase_var", "muscle_length",
      "muscle_velocity", "muscle_force",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "vel_reward": 5.0,
      "done": -100,
      "cyclic_hip": -10,
      "ref_rot": 10.0,
      "joint_angle_rew": 5.0,
  }

  move_terrain_away = True

  def _setup(self, min_height=0.8, max_rot=0.8, hip_period=100,
             reset_type="init", target_x_vel=0.0, target_y_vel=1.2,
             target_rot=None, com_vel_type="physical", **kwargs):
    super()._setup(**kwargs)
    if self.move_terrain_away and "terrain" in self.model.names["geom"]:
      import dataclasses as _dc
      gp = np.array(self.model.geom_pos)
      gp[self.model.name2id("geom", "terrain")] = [0, 0, -10]
      self.model = _dc.replace(self.model, geom_pos=gp)
    m = self.model
    self.min_height = min_height
    self.max_rot = max_rot
    self.hip_period = hip_period
    self.reset_type = reset_type
    self.target_x_vel = target_x_vel
    self.target_y_vel = target_y_vel
    self.init_qpos[:] = m.key_qpos[0]
    self.init_qvel[:] = 0.0
    self.target_rot = (np.asarray(target_rot) if target_rot is not None
                       else self.init_qpos[3:7].copy())
    self.talus_l = m.name2id("body", "talus_l")
    self.talus_r = m.name2id("body", "talus_r")
    self.pelvis_bid = m.name2id("body", "pelvis")
    self.torso_bid = m.name2id("body", "torso")
    self.hip_flex_adr = np.asarray([
        m.jnt_qposadr[m.name2id("joint", n)]
        for n in ("hip_flexion_l", "hip_flexion_r")])
    self.hip_reg_adr = np.asarray([
        m.jnt_qposadr[m.name2id("joint", n)]
        for n in ("hip_adduction_l", "hip_adduction_r",
                  "hip_rotation_l", "hip_rotation_r")])
    if com_vel_type not in ("physical", "reference"):
      raise ValueError(f"com_vel_type must be physical|reference, "
                       f"got {com_vel_type!r}")
    self.com_vel_type = com_vel_type
    self._mass = np.asarray(m.body_mass)
    self._total_mass = float(self._mass.sum())

  def reset_qpos_qvel(self, rng, aux):
    m = self.model
    if self.reset_type == "random" and len(m.key_qpos) > 3:
      k1, k2 = jax.random.split(rng)
      pick = jax.random.uniform(k1) < 0.5
      qpos = jnp.where(pick, jnp.asarray(m.key_qpos[2], self.dtype),
                       jnp.asarray(m.key_qpos[3], self.dtype))
      qvel = jnp.where(pick, jnp.asarray(m.key_qvel[2], self.dtype),
                       jnp.asarray(m.key_qvel[3], self.dtype))
      noise = 0.02 * jax.random.normal(k2, qpos.shape, self.dtype)
      noisy = qpos + noise
      # keep root height + orientation exact
      noisy = noisy.at[2].set(qpos[2])
      noisy = noisy.at[3:7].set(qpos[3:7])
      return noisy, qvel
    if self.reset_type == "init" and len(m.key_qpos) > 2:
      return (jnp.asarray(m.key_qpos[2], self.dtype),
              jnp.asarray(m.key_qvel[2], self.dtype))
    return (jnp.asarray(m.key_qpos[0], self.dtype),
            jnp.zeros(m.nv, self.dtype))

  def _com(self, data):
    return (self._mass[:, None] * data.xipos).sum(0) / self._total_mass

  def _com_vel_xy(self, data):
    ang = data.cvel[:, :3]
    lin = data.cvel[:, 3:]
    if self.com_vel_type == "reference":
      # reference-exact mode (walk_v0.py:442-449): the reference mass-
      # averages MuJoCo's *negated* com-frame cvel linear rows. MuJoCo
      # anchors cvel at subtree_com[rootid]; with one kinematic tree that
      # anchor is the whole-model com, so re-anchor our world-origin
      # spatial velocity there and negate.
      com = self._com(data)
      v = lin + jnp.cross(ang, jnp.broadcast_to(com, ang.shape))
      return -(self._mass[:, None] * v).sum(0)[:2] / self._total_mass
    # v(xipos_i) from world-origin spatial velocity, mass-weighted
    v = lin + jnp.cross(ang, data.xipos)
    return (self._mass[:, None] * v).sum(0)[:2] / self._total_mass

  def get_obs_dict(self, data, aux):
    m = self.model
    phase = (data.time / self.dt) / self.hip_period % 1.0
    return {
        "time": jnp.atleast_1d(data.time),
        "qpos_without_xy": data.qpos[2:],
        "qvel": data.qvel * self.dt,
        "com_vel": self._com_vel_xy(data),
        "torso_angle": data.xquat[self.torso_bid],
        "feet_heights": jnp.stack([
            data.xpos[self.talus_l][2], data.xpos[self.talus_r][2]]),
        "height": jnp.atleast_1d(self._com(data)[2]),
        "feet_rel_positions": jnp.concatenate([
            data.xpos[self.talus_l] - data.xpos[self.pelvis_bid],
            data.xpos[self.talus_r] - data.xpos[self.pelvis_bid]]),
        "phase_var": jnp.atleast_1d(phase),
        "muscle_length": data.actuator_length,
        "muscle_velocity": jnp.clip(data.actuator_velocity, -100, 100),
        "muscle_force": jnp.clip(data.actuator_force / 1000, -100, 100),
        "act": data.act if m.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict, data, aux):
    vel = obs_dict["com_vel"]
    vel_reward = (jnp.exp(-jnp.square(self.target_y_vel - vel[1]))
                  + jnp.exp(-jnp.square(self.target_x_vel - vel[0])))
    phase = obs_dict["phase_var"][0]
    des = 0.8 * jnp.stack([jnp.cos(phase * 2 * jnp.pi + jnp.pi),
                           jnp.cos(phase * 2 * jnp.pi)])
    angles = data.qpos[self.hip_flex_adr]
    cyclic_hip = jnp.linalg.norm(des - angles)
    ref_rot = jnp.exp(-jnp.linalg.norm(
        5.0 * (data.qpos[3:7] - jnp.asarray(self.target_rot, self.dtype))))
    reg_angles = data.qpos[self.hip_reg_adr]
    joint_angle_rew = jnp.exp(-5 * jnp.mean(jnp.abs(reg_angles)))
    height = obs_dict["height"][0]
    # facing direction from root quat
    from myosuite_mjx_tpu.ops import quat as qmath
    fwd = qmath.quat_rotate(data.qpos[3:7],
                            jnp.array([1.0, 0, 0], self.dtype))
    rot_bad = jnp.abs(fwd[0]) > self.max_rot
    done = (height < self.min_height) | rot_bad
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    return {
        "vel_reward": vel_reward,
        "cyclic_hip": cyclic_hip,
        "ref_rot": ref_rot,
        "joint_angle_rew": joint_angle_rew,
        "act_mag": act_mag,
        "sparse": vel_reward,
        "solved": vel_reward >= 1.0,
        "done": done,
    }


class TerrainWalkEnv(WalkEnv):
  """Walk over procedurally-generated terrain (rough / hilly / stairs).

  Behavior parity with TerrainEnvV0
  (/root/reference/myosuite/envs/myo/myobase/walk_v0.py:490-650): the same
  generation recipes (uniform rubble scaled 0.08 with -0.02 offset, flat
  lead-in + sinusoid hills, flat + 12 stairs), produced on device as a
  per-episode hfield overlay instead of host-side model writes.
  """

  move_terrain_away = False

  def _setup(self, terrain="rough", variant=None, **kwargs):
    self.terrain = terrain
    self.variant = variant
    super()._setup(**kwargs)

  def reset_overlay(self, rng, aux):
    n = len(self.model.hfield_data)
    if n == 0:
      return {}
    nrow = int(self.model.hfield_nrow[0])
    ncol = int(self.model.hfield_ncol[0])
    if self.terrain == "rough":
      r = jax.random.uniform(rng, (n,), self.dtype, -0.5, 0.5)
      norm = (r - r.min()) / (r.max() - r.min())
      data = norm * 0.08 - 0.02
    elif self.terrain == "hilly":
      flat_len, freq = 3000, 3
      scalar = (0.63 if self.variant == "fixed"
                else jax.random.uniform(rng, (), self.dtype, 0.53, 0.73))
      ramp = -2 + 0.5 * (jnp.sin(
          jnp.linspace(0, freq * jnp.pi, n - flat_len) + jnp.pi / 2) - 1)
      comb = jnp.concatenate([-2 * jnp.ones(flat_len, self.dtype), ramp])
      norm = (comb - comb.min()) / (comb.max() - comb.min())
      data = jnp.flip(
          norm.reshape(nrow, ncol) * scalar, (0, 1)).ravel()
    elif self.terrain == "stairs":
      num_stairs, stair_height = 12, 0.1
      flat_cells = int(5200 - (n - 5200) % num_stairs)
      stairs_width = (n - flat_cells) // num_stairs
      scalar = (2.5 if self.variant == "fixed"
                else jax.random.uniform(rng, (), self.dtype, 1.5, 3.5))
      rows = [jnp.full((flat_cells // ncol, ncol), -2.0, self.dtype)]
      for j in range(num_stairs):
        rows.append(jnp.full((int(stairs_width // ncol), ncol),
                             -2.0 + stair_height * j, self.dtype))
      terr = jnp.concatenate(rows, axis=0)
      norm = (terr + 2) / (2 + stair_height * num_stairs)
      padded = jnp.zeros((nrow, ncol), self.dtype)
      padded = padded.at[:norm.shape[0]].set(norm[:nrow])
      data = jnp.flip(padded * scalar, (0, 1)).ravel()
    else:
      data = jnp.zeros(n, self.dtype)
    return {"hfield_data": data.astype(self.dtype)}
