"""MyoChallenge ChaseTag: myoLegs vs a scripted mocap opponent.

Behavior parity with ChaseTagEnvV0 + ChallengeOpponent
(/root/reference/myosuite/envs/myo/myochallenge/chasetag_v0.py:24-963):
CHASE/EVADE tasks, opponent policies (static / stationary / correlated-noise
random / chase-player), colored-noise drive (exact 1/f^2 spectrum via FFT at
reset instead of the reference's pink-noise process), GRF touch-sensor
observations, quadrant terrain (ChaseTagField) as an hfield overlay, and the
reference's win/lose/score rules. The opponent is the scene's mocap body;
its pose advances inside the jitted step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine import sensors
from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.envs.heightfields import ChaseTagField
from myosuite_mjx_tpu.ops import quat as qmath

_NOISE_LEN = 2048


def _colored_noise(rng, beta=2.0, size=(2, _NOISE_LEN), scale=10.0,
                   dtype=jnp.float32):
  """Gaussian 1/f^beta noise rows via spectral shaping (rfft)."""
  n = size[-1]
  k1, k2 = jax.random.split(rng)
  freqs = jnp.fft.rfftfreq(n)
  amp = jnp.where(freqs > 0, freqs ** (-beta / 2.0), 0.0)
  re = jax.random.normal(k1, size[:-1] + (amp.shape[0],))
  im = jax.random.normal(k2, size[:-1] + (amp.shape[0],))
  spec = (re + 1j * im) * amp
  x = jnp.fft.irfft(spec, n=n, axis=-1)
  x = x / jnp.maximum(x.std(axis=-1, keepdims=True), 1e-8) * scale
  return x.astype(dtype)


class ChaseTagEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "internal_qpos", "internal_qvel", "grf", "torso_angle",
      "opponent_pose", "opponent_vel", "model_root_pos", "model_root_vel",
      "muscle_length", "muscle_velocity", "muscle_force",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "distance": -0.1,
      "lose": -1000,
  }

  def _setup(self, reset_type="none", win_distance=0.5,
             min_spawn_distance=2.0, task_choice="CHASE", terrain="FLAT",
             hills_range=(0, 0), rough_range=(0, 0), relief_range=(0, 0),
             chase_vel_range=(1.0, 1.0), random_vel_range=(1.0, 1.0),
             opponent_probabilities=(0.1, 0.45, 0.45),
             repeller_opponent=False, repeller_vel_range=(1.0, 1.0),
             **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.reset_type = reset_type
    self.win_distance = win_distance
    self.min_spawn_distance = min_spawn_distance
    self.task_choice = task_choice
    self.terrain = terrain
    self.max_time = 20.0
    self.chase_vel_range = tuple(chase_vel_range)
    self.random_vel_range = tuple(random_vel_range)
    self.opponent_probabilities = tuple(opponent_probabilities)
    self.pelvis_bid = m.name2id("body", "pelvis")
    self.grf_sensors = ["r_foot", "r_toes", "l_foot", "l_toes"]
    self.init_qpos[:] = m.key_qpos[0]
    self.init_qvel[:] = 0.0
    if terrain != "FLAT" and m.nhfield:
      nrow, ncol = int(m.hfield_nrow[0]), int(m.hfield_ncol[0])
      self.field = ChaseTagField(
          nrow, ncol,
          rough_amplitude=rough_range[1],
          hills_amplitude=hills_range[1],
          relief_amplitude=relief_range[1])
    else:
      self.field = None

  # ---- opponent ----------------------------------------------------------

  def reset_aux(self, rng: jax.Array) -> dict:
    k_task, k_pol, k_spawn, k_noise, k_chase = jax.random.split(rng, 5)
    if self.task_choice == "random":
      task = jax.random.randint(k_task, (), 0, 2)  # 0 CHASE, 1 EVADE
    else:
      task = jnp.asarray(0 if self.task_choice == "CHASE" else 1, jnp.int32)
    # opponent policy: 0 static_stationary, 1 stationary, 2 random;
    # 3 = chase_player when the player EVADEs
    p = jnp.asarray(self.opponent_probabilities, self.dtype)
    u = jax.random.uniform(k_pol, ())
    policy = jnp.where(u < p[0], 0,
                       jnp.where(u < p[0] + p[1], 1, 2)).astype(jnp.int32)
    policy = jnp.where(task == 1, 3, policy)
    # rejection-free spawn: draw angle/radius in the feasible annulus
    k_a, k_r = jax.random.split(k_spawn)
    ang = jax.random.uniform(k_a, (), self.dtype, 0, 2 * jnp.pi)
    rad = jax.random.uniform(k_r, (), self.dtype,
                             self.min_spawn_distance, 5.0)
    pose = jnp.stack([rad * jnp.cos(ang), rad * jnp.sin(ang),
                      jax.random.uniform(k_a, (), self.dtype,
                                         -2 * jnp.pi, 2 * jnp.pi)])
    return {
        "task": task,
        "policy": policy,
        "opp_pose": pose,
        "opp_vel": jnp.zeros(2, self.dtype),
        "noise": _colored_noise(k_noise, dtype=self.dtype),
        "chase_vel": jax.random.uniform(
            k_chase, (), self.dtype, *self.chase_vel_range),
    }

  def reset_overlay(self, rng, aux):
    if self.field is None:
      return {}
    return {"hfield_data": self.field.generate(rng).astype(self.dtype)}

  def _opponent_step(self, aux: dict, data: Data, step_idx) -> dict:
    pose = aux["opp_pose"]
    pel = data.xpos[self.pelvis_bid][:2]
    idx = jnp.mod(step_idx, _NOISE_LEN)
    noise_vel = jnp.clip(aux["noise"][:, idx], *self.random_vel_range)
    # chase_player: drive toward the pelvis
    theta = pose[2]
    heading = jnp.stack([jnp.cos(theta), jnp.sin(theta)])
    to_player = pel - pose[:2]
    chase_vel = jnp.stack(
        [aux["chase_vel"], jnp.dot(heading, to_player)])
    vel = jnp.select(
        [aux["policy"] == 0, aux["policy"] == 1, aux["policy"] == 2],
        [jnp.zeros(2, self.dtype), jnp.zeros(2, self.dtype), noise_vel],
        chase_vel)
    vel = jnp.clip(vel.at[0].set(jnp.abs(vel[0])), -2, 2)
    x_vel = vel[0] * jnp.cos(pose[2] + 0.5 * jnp.pi)
    y_vel = vel[0] * jnp.sin(pose[2] + 0.5 * jnp.pi)
    new_pose = jnp.stack([
        jnp.clip(pose[0] - self.dt * x_vel, -5.5, 5.5),
        jnp.clip(pose[1] - self.dt * y_vel, -5.5, 5.5),
        pose[2] + self.dt * vel[1]])
    return {**aux, "opp_pose": new_pose, "opp_vel": vel}

  def step(self, state, action):
    aux = self._opponent_step(state.aux, state.data, state.steps)
    quat = qmath.euler_to_quat(
        jnp.stack([jnp.zeros((), self.dtype), jnp.zeros((), self.dtype),
                   aux["opp_pose"][2]]))
    data = state.data.replace(
        mocap_pos=state.data.mocap_pos.at[0, :2].set(aux["opp_pose"][:2]),
        mocap_quat=state.data.mocap_quat.at[0].set(quat))
    state = state.replace(data=data, aux=aux)
    return super().step(state, action)

  # ---- obs / reward ------------------------------------------------------

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    m = self.model
    grf = jnp.stack([
        sensors.touch_sensor(m, data, int(m.sensor_objid[
            m.name2id("sensor", n)])) for n in self.grf_sensors])
    return {
        "time": jnp.atleast_1d(data.time),
        "internal_qpos": data.qpos[7:35],
        "internal_qvel": data.qvel[6:34] * self.dt,
        "grf": grf,
        "torso_angle": data.xquat[self.pelvis_bid],
        "opponent_pose": aux["opp_pose"],
        "opponent_vel": aux["opp_vel"],
        "model_root_pos": data.qpos[:2],
        "model_root_vel": data.qvel[:2],
        "muscle_length": data.actuator_length,
        "muscle_velocity": jnp.clip(data.actuator_velocity, -100, 100),
        "muscle_force": jnp.clip(data.actuator_force / 1000, -100, 100),
        "act": data.act if m.na else jnp.zeros_like(data.qpos),
    }

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    root = data.xpos[self.pelvis_bid][:2]
    opp = aux["opp_pose"][:2]
    dist = jnp.linalg.norm(root - opp)
    t = data.time
    tagged = dist <= self.win_distance
    oob = (jnp.abs(root[0]) > 6.5) | (jnp.abs(root[1]) > 6.5)
    fallen = data.xpos[self.pelvis_bid][2] < 0.5
    timeout = t >= self.max_time
    is_chase = aux["task"] == 0
    win = jnp.where(is_chase, tagged, timeout)
    lose = jnp.where(is_chase, fallen | timeout | oob, tagged | oob)
    score_chase = 1.0 - t / self.max_time
    score_evade = t / self.max_time
    score = jnp.where(
        is_chase, jnp.where(win, score_chase, 0.0),
        jnp.where(win | lose, score_evade, 0.0))
    act_mag = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
               if self.model.na else 0.0)
    return {
        "act_reg": act_mag,
        "distance": dist,
        "lose": lose,
        "sparse": score,
        "solved": win,
        "done": win | lose,
    }
