"""Constraint row construction (efc system).

Builds the fixed-size constraint system consumed by the Newton solver:
equality couplings, joint/tendon limits, and contacts, each as dense rows
J [nv], with reference acceleration ``aref`` and inverse regularizer ``D``
derived from MuJoCo's solref/solimp impedance semantics (so solver fixed
points match the reference engine's).

Row layout is static per model (all potentially-active rows are always
materialized; inactive rows get D = 0), which keeps shapes vmap-uniform —
the TPU-native replacement for MuJoCo's dynamically-sized efc arrays.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.engine.model import (
    DSBL_CONSTRAINT, DSBL_CONTACT, DSBL_EQUALITY, DSBL_LIMIT,
    EqType, JointType, Model,
)

_MINVAL = 1e-15
_MINIMP = 0.0001
_MAXIMP = 0.9999


def kbi(m: Model, solref: jax.Array, solimp: jax.Array, pos: jax.Array):
  """Stiffness k, damping b, impedance imp from solref/solimp and violation.

  Implements MuJoCo's standard impedance model (positive solref) and the
  direct (negative solref) form; `refsafe` clamps timeconst to 2*timestep.
  """
  timeconst, dampratio = solref[..., 0], solref[..., 1]
  dmin = jnp.clip(solimp[..., 0], _MINIMP, _MAXIMP)
  dmax = jnp.clip(solimp[..., 1], _MINIMP, _MAXIMP)
  width = jnp.maximum(solimp[..., 2], _MINVAL)
  mid = jnp.clip(solimp[..., 3], _MINIMP, _MAXIMP)
  power = jnp.maximum(solimp[..., 4], 1.0)

  tc = jnp.maximum(timeconst, 2.0 * m.opt.timestep)
  k_std = 1.0 / jnp.maximum(dmax * dmax * tc * tc * dampratio * dampratio,
                            _MINVAL)
  b_std = 2.0 / jnp.maximum(dmax * tc, _MINVAL)
  direct = (solref[..., 0] <= 0) | (solref[..., 1] <= 0)
  k = jnp.where(direct, -solref[..., 0] / jnp.maximum(dmax * dmax, _MINVAL),
                k_std)
  b = jnp.where(direct, -solref[..., 1] / jnp.maximum(dmax, _MINVAL), b_std)

  x = jnp.abs(pos) / width
  ya = jnp.power(x / jnp.maximum(mid, _MINVAL), power) * mid
  yb = 1.0 - jnp.power((1.0 - x) / jnp.maximum(1.0 - mid, _MINVAL),
                       power) * (1.0 - mid)
  y = jnp.where(x < mid, ya, yb)
  imp = dmin + y * (dmax - dmin)
  imp = jnp.clip(imp, dmin, dmax)
  imp = jnp.where(x > 1.0, dmax, imp)
  return k, b, imp


@dataclasses.dataclass
class Rows:
  """Dense constraint rows (lists host-assembled, stacked by caller)."""
  J: list
  pos: list            # constraint violation (efc_pos)
  invweight: list
  solref: list
  solimp: list
  margin: list
  is_equality: list    # python bools (static)


def _joint_limit_rows(m: Model, d: Data, rows: Rows):
  for j in range(m.njnt):
    if not bool(m.jnt_limited[j]):
      continue
    jt = int(m.jnt_type[j])
    if jt not in (JointType.HINGE, JointType.SLIDE):
      raise NotImplementedError("ball joint limits")
    qadr, dadr = int(m.jnt_qposadr[j]), int(m.jnt_dofadr[j])
    lo, hi = float(m.jnt_range[j, 0]), float(m.jnt_range[j, 1])
    q = d.qpos[qadr]
    dist_lo = q - lo
    dist_hi = hi - q
    lower_closer = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(lower_closer, 1.0, -1.0)
    J = jnp.zeros(m.nv, d.qpos.dtype).at[dadr].set(sign)
    rows.J.append(J)
    rows.pos.append(dist - float(m.jnt_margin[j]))
    rows.invweight.append(jnp.asarray(m.dof_invweight0[dadr], d.qpos.dtype))
    rows.solref.append(jnp.asarray(m.jnt_solref[j], d.qpos.dtype))
    rows.solimp.append(jnp.asarray(m.jnt_solimp[j], d.qpos.dtype))
    rows.margin.append(float(m.jnt_margin[j]))
    rows.is_equality.append(False)


def _tendon_limit_rows(m: Model, d: Data, rows: Rows):
  for t in range(m.ntendon):
    if not bool(m.tendon_limited[t]):
      continue
    lo, hi = float(m.tendon_range[t, 0]), float(m.tendon_range[t, 1])
    L = d.ten_length[t]
    dist_lo = L - lo
    dist_hi = hi - L
    lower_closer = dist_lo < dist_hi
    dist = jnp.minimum(dist_lo, dist_hi)
    sign = jnp.where(lower_closer, 1.0, -1.0)
    rows.J.append(sign * d.ten_J[t])
    rows.pos.append(dist - float(m.tendon_margin[t]))
    rows.invweight.append(
        jnp.asarray(m.tendon_invweight0[t], d.qpos.dtype))
    rows.solref.append(jnp.asarray(m.tendon_solref_lim[t], d.qpos.dtype))
    rows.solimp.append(jnp.asarray(m.tendon_solimp_lim[t], d.qpos.dtype))
    rows.margin.append(float(m.tendon_margin[t]))
    rows.is_equality.append(False)


def _eq_joint_rows(m: Model, d: Data, rows: Rows):
  for e in range(m.neq):
    if int(m.eq_type[e]) != EqType.JOINT:
      raise NotImplementedError(f"equality type {int(m.eq_type[e])}")
    if not bool(m.eq_active0[e]):
      continue
    j1 = int(m.eq_obj1id[e])
    j2 = int(m.eq_obj2id[e])
    data = m.eq_data[e]
    q1adr, d1adr = int(m.jnt_qposadr[j1]), int(m.jnt_dofadr[j1])
    dtype = d.qpos.dtype
    if j2 < 0:
      pos = d.qpos[q1adr] - m.qpos0[q1adr] - float(data[0])
      J = jnp.zeros(m.nv, dtype).at[d1adr].set(1.0)
      iw = m.dof_invweight0[d1adr]
    else:
      q2adr, d2adr = int(m.jnt_qposadr[j2]), int(m.jnt_dofadr[j2])
      dif = d.qpos[q2adr] - m.qpos0[q2adr]
      # quartic coupling: qpos1 - qpos0_1 = poly(dif)
      poly = (data[0] + data[1] * dif + data[2] * dif**2
              + data[3] * dif**3 + data[4] * dif**4)
      dpoly = (data[1] + 2 * data[2] * dif + 3 * data[3] * dif**2
               + 4 * data[4] * dif**3)
      pos = d.qpos[q1adr] - m.qpos0[q1adr] - poly
      J = jnp.zeros(m.nv, dtype).at[d1adr].set(1.0).at[d2adr].set(-dpoly)
      iw = m.dof_invweight0[d1adr] + m.dof_invweight0[d2adr]
    rows.J.append(J)
    rows.pos.append(pos)
    rows.invweight.append(jnp.asarray(iw, dtype))
    rows.solref.append(jnp.asarray(m.eq_solref[e], dtype))
    rows.solimp.append(jnp.asarray(m.eq_solimp[e], dtype))
    rows.margin.append(0.0)
    rows.is_equality.append(True)


def make_efc(m: Model, d: Data, contact_rows: Rows | None = None):
  """Assemble the dense constraint system.

  Returns (J [nefc, nv], aref [nefc], D [nefc], active_fn) where D is zero
  for rows that cannot be active at this state and ``is_equality`` marks
  two-sided rows. Returns None if the model can produce no constraints.
  """
  dtype = d.qpos.dtype
  rows = Rows([], [], [], [], [], [], [])
  dsbl = m.opt.disableflags
  if dsbl & DSBL_CONSTRAINT:
    return None
  if m.neq and not (dsbl & DSBL_EQUALITY):
    _eq_joint_rows(m, d, rows)
  if not (dsbl & DSBL_LIMIT):
    _joint_limit_rows(m, d, rows)
    _tendon_limit_rows(m, d, rows)
  if contact_rows is not None and not (dsbl & DSBL_CONTACT):
    rows.J += contact_rows.J
    rows.pos += contact_rows.pos
    rows.invweight += contact_rows.invweight
    rows.solref += contact_rows.solref
    rows.solimp += contact_rows.solimp
    rows.margin += contact_rows.margin
    rows.is_equality += contact_rows.is_equality

  if not rows.J:
    return None

  J = jnp.stack(rows.J)
  pos = jnp.stack([jnp.asarray(p, dtype) for p in rows.pos])
  invweight = jnp.stack(rows.invweight)
  solref = jnp.stack(rows.solref)
  solimp = jnp.stack(rows.solimp)
  is_eq = np.asarray(rows.is_equality)

  k, b, imp = kbi(m, solref, solimp, pos)
  vel = J @ d.qvel
  aref = -b * vel - k * imp * pos
  r = jnp.maximum(invweight * (1.0 - imp) / jnp.maximum(imp, _MINVAL),
                  _MINVAL)
  D = 1.0 / r

  # inequality rows are only active when violated (pos < 0); equality rows
  # are always active. Inactive rows keep zero D so they drop out of the
  # solver cost entirely.
  eq_mask = jnp.asarray(is_eq)
  active_now = eq_mask | (pos < 0)
  D = jnp.where(active_now, D, 0.0)
  return J, aref, D, jnp.asarray(is_eq), pos
