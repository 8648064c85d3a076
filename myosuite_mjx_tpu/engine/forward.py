"""Forward dynamics pipeline and integration.

Pure functions ``forward(m, d) -> d`` and ``step(m, d) -> d`` (the TPU
equivalent of the reference's `sim.forward()` / `sim.advance()` surface,
/root/reference/myosuite/physics/sim_scene.py:167-208). The pipeline mirrors
MuJoCo's stage order — position, velocity, actuation, acceleration,
constraint, integrate — with every stage a pure JAX function of (Model, Data).

Constraint handling lives in engine/solver.py; when a model has no active
constraints the smooth acceleration is used directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myosuite_mjx_tpu.engine import muscle as muscle_mod
from myosuite_mjx_tpu.engine import smooth
from myosuite_mjx_tpu.engine import tendon as tendon_mod
from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.engine.model import (
    DSBL_ACTUATION, DSBL_CLAMPCTRL, DSBL_GRAVITY, DSBL_PASSIVE,
    BiasType, DynType, GainType, IntegratorType, JointType, Model, TrnType,
)


# ---------------------------------------------------------------------------
# position stage
# ---------------------------------------------------------------------------


def fwd_position(m: Model, d: Data) -> Data:
  kin = smooth.kinematics(m, d.qpos, d.mocap_pos, d.mocap_quat, d.overlay)
  subtree_com, cinert, cdof = smooth.com_pos(m, kin, d.overlay)
  ten_length, ten_J = tendon_mod.tendon(m, kin, cdof)
  if m.ntendon:
    ten_length = ten_length + tendon_mod.fixed_tendon_length(m, d.qpos)
  qM = smooth.crb(m, cinert, cdof)
  qLD = smooth.factor_m(qM)
  act_length, act_moment = _transmission(m, d.qpos, ten_length, ten_J)
  return d.replace(
      xpos=kin["xpos"], xquat=kin["xquat"], xmat=kin["xmat"],
      xipos=kin["xipos"], ximat=kin["ximat"], xanchor=kin["xanchor"],
      xaxis=kin["xaxis"], site_xpos=kin["site_xpos"],
      site_xmat=kin["site_xmat"], geom_xpos=kin["geom_xpos"],
      geom_xmat=kin["geom_xmat"], subtree_com=subtree_com, cinert=cinert,
      cdof=cdof, ten_length=ten_length, ten_J=ten_J, qM=qM, qLD=qLD,
      actuator_length=act_length, actuator_moment=act_moment)


def _transmission(m: Model, qpos: jax.Array, ten_length: jax.Array,
                  ten_J: jax.Array):
  """Actuator lengths/moments, vectorized per transmission type."""
  dtype = qpos.dtype
  if m.nu == 0:
    return jnp.zeros((0,), dtype), jnp.zeros((0, m.nv), dtype)
  import numpy as np
  trn = np.asarray(m.actuator_trntype)
  gear = jnp.asarray(m.actuator_gear[:, 0], dtype)          # [nu]
  tid = np.asarray(m.actuator_trnid[:, 0])
  bad = set(np.unique(trn)) - {int(TrnType.JOINT), int(TrnType.TENDON)}
  if bad:
    raise NotImplementedError(f"transmission types {sorted(bad)}")

  lengths = jnp.zeros((m.nu,), dtype)
  moments = jnp.zeros((m.nu, m.nv), dtype)
  is_j = trn == TrnType.JOINT
  if is_j.any():
    ju = np.where(is_j)[0]
    jts = m.jnt_type[tid[ju]]
    if not np.isin(jts, (JointType.HINGE, JointType.SLIDE)).all():
      raise NotImplementedError("joint transmission on ball/free joints")
    qadr = m.jnt_qposadr[tid[ju]]
    dadr = m.jnt_dofadr[tid[ju]]
    lengths = lengths.at[ju].set(gear[ju] * qpos[qadr])
    moments = moments.at[ju, dadr].set(gear[ju])
  is_t = trn == TrnType.TENDON
  if is_t.any():
    tu = np.where(is_t)[0]
    lengths = lengths.at[tu].set(gear[tu] * ten_length[tid[tu]])
    moments = moments.at[tu].set(gear[tu, None] * ten_J[tid[tu]])
  return lengths, moments


# ---------------------------------------------------------------------------
# velocity stage
# ---------------------------------------------------------------------------


def fwd_velocity(m: Model, d: Data) -> Data:
  cvel, cdof_dot = smooth.com_vel(m, d.cdof, d.qvel)
  qfrc_bias = smooth.rne(m, d.cinert, d.cdof, cdof_dot, cvel, d.qvel)
  ten_velocity = d.ten_J @ d.qvel if m.ntendon else d.ten_velocity
  actuator_velocity = d.actuator_moment @ d.qvel
  return d.replace(
      cvel=cvel, cdof_dot=cdof_dot, qfrc_bias=qfrc_bias,
      ten_velocity=ten_velocity, actuator_velocity=actuator_velocity)


# ---------------------------------------------------------------------------
# actuation
# ---------------------------------------------------------------------------


def fwd_actuation(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  if m.nu == 0 or (m.opt.disableflags & DSBL_ACTUATION):
    return d.replace(
        actuator_force=jnp.zeros((m.nu,), dtype),
        qfrc_actuator=jnp.zeros((m.nv,), dtype),
        act_dot=jnp.zeros((m.na,), dtype))

  ctrl = d.ctrl
  if not (m.opt.disableflags & DSBL_CLAMPCTRL):
    limited = jnp.asarray(m.actuator_ctrllimited)
    lo = jnp.asarray(m.actuator_ctrlrange[:, 0], dtype)
    hi = jnp.asarray(m.actuator_ctrlrange[:, 1], dtype)
    ctrl = jnp.where(limited, jnp.clip(ctrl, lo, hi), ctrl)

  # activation dynamics (muscle / integrator / filter)
  act_dot = jnp.zeros((m.na,), dtype)
  act_inputs = []
  for u in range(m.nu):
    dyn = int(m.actuator_dyntype[u])
    aadr = int(m.actuator_actadr[u])
    if dyn == DynType.NONE:
      act_inputs.append(ctrl[u])
      continue
    a = d.act[aadr]
    if dyn == DynType.MUSCLE:
      ad = muscle_mod.muscle_dynamics(
          ctrl[u], a, jnp.asarray(m.actuator_dynprm[u, :3], dtype))
    elif dyn == DynType.INTEGRATOR:
      ad = ctrl[u]
    elif dyn in (DynType.FILTER, DynType.FILTEREXACT):
      tau = max(float(m.actuator_dynprm[u, 0]), 1e-15)
      ad = (ctrl[u] - a) / tau
    else:
      raise NotImplementedError(f"dyntype {dyn}")
    act_dot = act_dot.at[aadr].set(ad)
    act_inputs.append(a)
  act_input = jnp.stack(act_inputs)

  # gains / biases
  forces = []
  for u in range(m.nu):
    gt = int(m.actuator_gaintype[u])
    bt = int(m.actuator_biastype[u])
    length = d.actuator_length[u]
    vel = d.actuator_velocity[u]
    # actuator-gain DR overlay (SimRandomizer.randomize_actuators,
    # physics/randomize.py:209-250)
    if "actuator_gainprm" in d.overlay:
      gp = jnp.asarray(d.overlay["actuator_gainprm"], dtype)[u, :9]
    else:
      gp = jnp.asarray(m.actuator_gainprm[u, :9], dtype)
    if "actuator_biasprm" in d.overlay:
      bp = jnp.asarray(d.overlay["actuator_biasprm"], dtype)[u, :9]
    else:
      bp = jnp.asarray(m.actuator_biasprm[u, :9], dtype)
    lr = jnp.asarray(m.actuator_lengthrange[u], dtype)
    acc0 = jnp.asarray(m.actuator_acc0[u], dtype)
    if gt == GainType.FIXED:
      gain = gp[0]
    elif gt == GainType.AFFINE:
      gain = gp[0] + gp[1] * length + gp[2] * vel
    elif gt == GainType.MUSCLE:
      gain = muscle_mod.muscle_gain(length, vel, lr, acc0, gp)
    else:
      raise NotImplementedError(f"gaintype {gt}")
    if bt == BiasType.NONE:
      bias = jnp.zeros((), dtype)
    elif bt == BiasType.AFFINE:
      bias = bp[0] + bp[1] * length + bp[2] * vel
    elif bt == BiasType.MUSCLE:
      bias = muscle_mod.muscle_bias(length, lr, acc0, bp)
    else:
      raise NotImplementedError(f"biastype {bt}")
    forces.append(gain * act_input[u] + bias)
  force = jnp.stack(forces)

  limited = jnp.asarray(m.actuator_forcelimited)
  flo = jnp.asarray(m.actuator_forcerange[:, 0], dtype)
  fhi = jnp.asarray(m.actuator_forcerange[:, 1], dtype)
  force = jnp.where(limited, jnp.clip(force, flo, fhi), force)

  qfrc_actuator = d.actuator_moment.T @ force
  return d.replace(actuator_force=force, qfrc_actuator=qfrc_actuator,
                   act_dot=act_dot)


# ---------------------------------------------------------------------------
# passive forces
# ---------------------------------------------------------------------------


def fwd_passive(m: Model, d: Data) -> Data:
  dtype = d.qpos.dtype
  if m.opt.disableflags & DSBL_PASSIVE:
    return d.replace(qfrc_passive=jnp.zeros((m.nv,), dtype))

  # joint dampers (dof_damping DR overlay: SimRandomizer.randomize_dofs,
  # physics/randomize.py:170-207)
  if "dof_damping" in d.overlay:
    damping = jnp.asarray(d.overlay["dof_damping"], dtype)
  else:
    damping = jnp.asarray(m.dof_damping, dtype)
  qfrc = -damping * d.qvel

  # joint springs (hinge/slide dofs; ball/free springs unsupported for now)
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    k = float(m.jnt_stiffness[j])
    if k == 0.0:
      continue
    if jt not in (JointType.HINGE, JointType.SLIDE):
      raise NotImplementedError("spring on ball/free joint")
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    qfrc = qfrc.at[dadr].add(-k * (d.qpos[qadr] - float(m.qpos_spring[qadr])))

  # tendon springs/dampers
  if m.ntendon:
    k = jnp.asarray(m.tendon_stiffness, dtype)
    c = jnp.asarray(m.tendon_damping, dtype)
    lo = jnp.asarray(m.tendon_lengthspring[:, 0], dtype)
    hi = jnp.asarray(m.tendon_lengthspring[:, 1], dtype)
    L = d.ten_length
    stretch = jnp.where(L > hi, L - hi, jnp.where(L < lo, L - lo, 0.0))
    frc = -k * stretch - c * d.ten_velocity
    qfrc = qfrc + d.ten_J.T @ frc

  return d.replace(qfrc_passive=qfrc)


# ---------------------------------------------------------------------------
# acceleration + constraint
# ---------------------------------------------------------------------------


def fwd_acceleration(m: Model, d: Data) -> Data:
  # applied cartesian wrenches -> generalized forces (vectorized over bodies)
  qfrc_applied = d.qfrc_applied
  if m.nbody > 1:
    import numpy as np
    bodies = np.arange(1, m.nbody)
    lin_rows = smooth.point_jac_dir(
        m, d.cdof, d.xipos[1:], bodies, d.xfrc_applied[1:, :3])  # [B, nv]
    mask = jnp.asarray(smooth.body_dof_mask(m), d.qpos.dtype)[bodies]
    rot_rows = jnp.einsum(
        "nk,bk->bn", d.cdof[:, :3], d.xfrc_applied[1:, 3:]) * mask
    qfrc_applied = qfrc_applied + (lin_rows + rot_rows).sum(axis=0)
  qfrc_smooth = (d.qfrc_passive - d.qfrc_bias + d.qfrc_actuator
                 + qfrc_applied)
  qacc_smooth = smooth.solve_m(d.qLD, qfrc_smooth)
  return d.replace(qfrc_smooth=qfrc_smooth, qacc_smooth=qacc_smooth)


def forward(m: Model, d: Data) -> Data:
  """Full forward dynamics at the current state."""
  d = fwd_position(m, d)
  d = fwd_velocity(m, d)
  d = fwd_actuation(m, d)
  d = fwd_passive(m, d)
  d = fwd_acceleration(m, d)
  from myosuite_mjx_tpu.engine import solver  # cycle-free late import
  d = solver.fwd_constraint(m, d)
  return d


# ---------------------------------------------------------------------------
# integration
# ---------------------------------------------------------------------------


def _integrate_pos(m: Model, qpos: jax.Array, qvel: jax.Array,
                   dt) -> jax.Array:
  from myosuite_mjx_tpu.ops import quat as qmath
  out = qpos
  for j in range(m.njnt):
    jt = int(m.jnt_type[j])
    qadr = int(m.jnt_qposadr[j])
    vadr = int(m.jnt_dofadr[j])
    if jt == JointType.FREE:
      out = out.at[qadr:qadr + 3].add(dt * qvel[vadr:vadr + 3])
      q = qmath.quat_integrate(
          qpos[qadr + 3:qadr + 7], qvel[vadr + 3:vadr + 6], dt)
      out = out.at[qadr + 3:qadr + 7].set(q)
    elif jt == JointType.BALL:
      q = qmath.quat_integrate(qpos[qadr:qadr + 4], qvel[vadr:vadr + 3], dt)
      out = out.at[qadr:qadr + 4].set(q)
    else:
      out = out.at[qadr].add(dt * qvel[vadr])
  return out


def _clamp_act(m: Model, act: jax.Array) -> jax.Array:
  if m.na == 0:
    return act
  out = act
  for u in range(m.nu):
    aadr = int(m.actuator_actadr[u])
    if aadr < 0:
      continue
    if int(m.actuator_dyntype[u]) == DynType.MUSCLE:
      out = out.at[aadr].set(jnp.clip(out[aadr], 0.0, 1.0))
    elif bool(m.actuator_actlimited[u]):
      lo, hi = (float(m.actuator_actrange[u, 0]),
                float(m.actuator_actrange[u, 1]))
      out = out.at[aadr].set(jnp.clip(out[aadr], lo, hi))
  return out


def euler(m: Model, d: Data) -> Data:
  """Semi-implicit Euler with implicit joint damping (MuJoCo Euler).

  Damping is integrated implicitly: (M + h D) qacc = qfrc_smooth +
  qfrc_constraint, which keeps stiff tendon-driven models stable at the
  reference's 2 ms timestep.
  """
  dt = m.opt.timestep
  dtype = d.qpos.dtype
  qfrc = d.qfrc_smooth + d.qfrc_constraint
  if "dof_damping" in d.overlay:
    damping = jnp.asarray(d.overlay["dof_damping"], dtype)
  elif float(abs(m.dof_damping).sum()) > 0:
    damping = jnp.asarray(m.dof_damping, dtype)
  else:
    damping = None
  if damping is not None:
    # M + h*D is SPD: unrolled Cholesky solve (ops/linalg; XLA's batched
    # factor/solve loops are ~10x slower at nv ~23)
    from myosuite_mjx_tpu.ops import linalg
    mhb = d.qM + dt * jnp.diag(damping)
    qacc = linalg.spd_solve(mhb, qfrc)
  else:
    qacc = d.qacc
  qvel = d.qvel + dt * qacc
  act = _clamp_act(m, d.act + dt * d.act_dot)
  qpos = _integrate_pos(m, d.qpos, qvel, dt)
  return d.replace(qpos=qpos, qvel=qvel, act=act, time=d.time + dt)


def step(m: Model, d: Data) -> Data:
  """One physics step: forward dynamics + integrate."""
  d = forward(m, d)
  integ = int(m.opt.integrator)
  if integ == IntegratorType.EULER:
    return euler(m, d)
  raise NotImplementedError(f"integrator {integ}")
