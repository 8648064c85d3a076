"""Constraint solver: primal Newton with exact-ish line search.

Minimizes MuJoCo's convex primal objective over accelerations

  cost(qacc) = 0.5 ||qacc - qacc_smooth||^2_M
             + 0.5 sum_i D_i [active_i] (J_i qacc - aref_i)^2

where inequality rows are active only while accelerating into the
constraint (jar < 0). Matches the reference's solver configuration space
(mjSOL_NEWTON, iterations, ls_iterations —
/root/reference/myosuite/mjx/myodm_v0.py:38-41) with TPU-friendly structure:
fixed-shape dense rows, fixed iteration counts, masked early-exit.

The Hessian M + J' diag(w) J is dense [nv, nv] (nv <= ~40 for Myo models)
— batched Cholesky factorizations map well onto the MXU under vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from myosuite_mjx_tpu.engine import constraint
from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.engine.model import Model


def _newton_solve(m: Model, d: Data, J, aref, D, is_eq,
                  iterations: int, ls_iterations: int):
  qM = d.qM
  x0 = d.qacc_smooth
  dtype = x0.dtype

  def weights(jar):
    active = is_eq | (jar < 0)
    return D * active

  def cost_grad_hess(qacc):
    jar = J @ qacc - aref
    w = weights(jar)
    dx = qacc - x0
    mdx = qM @ dx
    grad = mdx + J.T @ (w * jar)
    return jar, w, grad

  def linesearch(qacc, p, jar):
    """1D exact-ish minimization of the piecewise-quadratic along p."""
    jp = J @ p
    mp = qM @ p
    pmx = p @ (qM @ (qacc - x0))
    pmp = jnp.maximum(p @ mp, 1e-15)

    def dphi(alpha):
      jar_a = jar + alpha * jp
      w = weights(jar_a)
      return pmx + alpha * pmp + jnp.sum(w * jar_a * jp)

    # bracket: phi' is increasing; expand alpha_hi until positive slope
    def expand(_, hi):
      return jnp.where(dphi(hi) < 0, hi * 2.0, hi)
    hi = jax.lax.fori_loop(0, 16, expand, jnp.asarray(1.0, dtype))
    lo = jnp.zeros((), dtype)

    def bisect(_, carry):
      lo, hi = carry
      mid = 0.5 * (lo + hi)
      pos = dphi(mid) > 0
      return jnp.where(pos, lo, mid), jnp.where(pos, mid, hi)
    lo, hi = jax.lax.fori_loop(0, ls_iterations, bisect, (lo, hi))
    return 0.5 * (lo + hi)

  def body(_, qacc):
    jar, w, grad = cost_grad_hess(qacc)
    H = qM + (J.T * w) @ J
    L = jnp.linalg.cholesky(H)
    p = -jax.scipy.linalg.cho_solve((L, True), grad[:, None])[:, 0]
    alpha = linesearch(qacc, p, jar)
    improved = jnp.dot(grad, p) < -1e-16
    return jnp.where(improved, qacc + alpha * p, qacc)

  qacc = jax.lax.fori_loop(0, iterations, body, x0)
  jar = J @ qacc - aref
  w = weights(jar)
  force = -w * jar
  return qacc, force


def fwd_constraint(m: Model, d: Data) -> Data:
  """Solve for constraint forces and the constrained acceleration."""
  from myosuite_mjx_tpu.engine import collision
  contact_blocks, contact_info = collision.contacts(m, d)
  efc = constraint.make_efc(m, d, contact_blocks)
  if efc is None:
    return d.replace(
        qfrc_constraint=jnp.zeros_like(d.qfrc_smooth),
        qacc=d.qacc_smooth)
  J, aref, D, is_eq, _pos, meta = efc
  iterations = min(int(m.opt.solver_iterations), 30)
  ls_iterations = min(int(m.opt.ls_iterations), 25)
  qacc, force = _newton_solve(m, d, J, aref, D, is_eq,
                              iterations, ls_iterations)
  out = d.replace(qfrc_constraint=J.T @ force, qacc=qacc)
  nl = len(meta["jl_dadr"])
  if nl:
    # signed per-limited-joint dof force (pain-metric diagnostic)
    jl = force[meta["jl_offset"]:meta["jl_offset"] + nl]
    out = out.replace(efc_force_limit=meta["jl_sign"] * jl)
  from myosuite_mjx_tpu.engine.model import DSBL_CONTACT
  if contact_info is not None and not (m.opt.disableflags & DSBL_CONTACT):
    # normal force per contact: pyramid rows have unit normal coefficient,
    # so the slot's normal force is the sum of its row forces
    ncon = contact_info.dist.shape[0]
    nrows_contact = contact_blocks["J"].shape[0]
    rows_per = nrows_contact // max(ncon, 1)
    cforce = force[-nrows_contact:].reshape(ncon, rows_per).sum(axis=1)
    out = out.replace(contact=contact_info,
                      contact_force=cforce,
                      ne_active=jnp.sum(contact_info.dist < 0))
  return out
