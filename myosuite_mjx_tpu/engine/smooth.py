"""Smooth (unconstrained) dynamics: FK, composite inertia, CRB, RNE.

Replaces the MuJoCo C smooth-dynamics stage the reference consumes through
dm_control (/root/reference/myosuite/physics/mj_sim_scene.py:51-65). Design is
TPU-first rather than a translation:

* The kinematic tree is **statically unrolled** at trace time (nbody is tiny,
  <= ~30 for myoHand): every tree gather becomes a static index, so XLA sees
  straight-line dense math it can fuse; the batch axis (vmap over envs) is the
  parallel axis.
* Spatial algebra uses 6D motion/force vectors in a **world-origin frame**
  ([angular; linear-at-origin]) — one global frame for the whole tree keeps
  every pairwise product a plain dense op (MXU-friendly), vs MuJoCo's
  per-tree com-centered frames.
* The mass matrix is built densely: M = mask * (F @ cdof^T) with
  F_i = I_subtree(body(i)) @ cdof_i — a single [nv,6]x[6,nv] contraction.

Functions are single-env; batching is vmap at the step/env layer.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.model import JointType, Model
from myosuite_mjx_tpu.ops import quat as qmath


# ---------------------------------------------------------------------------
# spatial algebra (world-origin frame): u = [angular(3); linear(3)]
# ---------------------------------------------------------------------------


def motion_cross(u: jax.Array, v: jax.Array) -> jax.Array:
  """Spatial cross product of motion vectors: u x_m v."""
  ang = jnp.cross(u[..., :3], v[..., :3])
  lin = jnp.cross(u[..., :3], v[..., 3:]) + jnp.cross(u[..., 3:], v[..., :3])
  return jnp.concatenate([ang, lin], axis=-1)


def force_cross(u: jax.Array, f: jax.Array) -> jax.Array:
  """Spatial cross product applied to a force vector: u x_f f."""
  ang = jnp.cross(u[..., :3], f[..., :3]) + jnp.cross(u[..., 3:], f[..., 3:])
  lin = jnp.cross(u[..., :3], f[..., 3:])
  return jnp.concatenate([ang, lin], axis=-1)


def spatial_inertia(mass: jax.Array, inertia_diag: jax.Array,
                    com: jax.Array, imat: jax.Array) -> jax.Array:
  """6x6 spatial inertia about the world origin.

  mass: (), inertia_diag: (3,) principal moments, com: (3,) world com,
  imat: (3,3) world orientation of the principal axes.
  """
  ic = imat @ (inertia_diag[:, None] * imat.T)  # rotated 3x3 inertia at com
  cx = qmath.cross_matrix(com)
  eye = jnp.eye(3, dtype=com.dtype)
  top_left = ic + mass * (cx @ cx.T)
  top_right = mass * cx
  bottom_left = mass * cx.T
  bottom_right = mass * eye
  return jnp.concatenate(
      [
          jnp.concatenate([top_left, top_right], axis=1),
          jnp.concatenate([bottom_left, bottom_right], axis=1),
      ],
      axis=0,
  )


# ---------------------------------------------------------------------------
# forward kinematics
# ---------------------------------------------------------------------------


def kinematics(m: Model, qpos: jax.Array, mocap_pos: jax.Array,
               mocap_quat: jax.Array, overlay: dict | None = None):
  """Body/joint/site/geom world poses. Mirrors mj_kinematics semantics.

  ``overlay['body_pos']`` (nbody, 3) overrides local body offsets per
  episode (SimRandomizer.randomize_bodies, physics/randomize.py:64-91).
  """
  dtype = qpos.dtype
  overlay_body_pos = None
  if overlay and "body_pos" in overlay:
    overlay_body_pos = jnp.asarray(overlay["body_pos"], dtype)
  xpos = [jnp.zeros(3, dtype)] * m.nbody
  xquat = [qmath.quat_identity(dtype=dtype)] * m.nbody
  xanchor = [jnp.zeros(3, dtype)] * max(m.njnt, 1)
  xaxis = [jnp.zeros(3, dtype)] * max(m.njnt, 1)

  for i in range(1, m.nbody):
    p = int(m.body_parentid[i])
    body_pos = (overlay_body_pos[i] if overlay_body_pos is not None
                else jnp.asarray(m.body_pos[i], dtype))
    body_quat = jnp.asarray(m.body_quat[i], dtype)
    mid = int(m.body_mocapid[i])
    if mid >= 0:
      body_pos = mocap_pos[mid]
      body_quat = mocap_quat[mid]
    xp = xpos[p] + qmath.quat_rotate(xquat[p], body_pos)
    xq = qmath.quat_mul(xquat[p], body_quat)

    ja, jn = int(m.body_jntadr[i]), int(m.body_jntnum[i])
    for j in range(ja, ja + jn):
      jtype = int(m.jnt_type[j])
      adr = int(m.jnt_qposadr[j])
      jpos = jnp.asarray(m.jnt_pos[j], dtype)
      jaxis = jnp.asarray(m.jnt_axis[j], dtype)
      if jtype == JointType.FREE:
        xp = qpos[adr:adr + 3]
        xq = qmath.normalize(qpos[adr + 3:adr + 7])
        xanchor[j] = xp
        xaxis[j] = jaxis
      else:
        anchor = xp + qmath.quat_rotate(xq, jpos)
        axis = qmath.quat_rotate(xq, jaxis)
        xanchor[j] = anchor
        xaxis[j] = axis
        if jtype == JointType.BALL:
          qloc = qmath.normalize(qpos[adr:adr + 4])
          xq = qmath.quat_mul(xq, qloc)
          xp = anchor - qmath.quat_rotate(xq, jpos)
        elif jtype == JointType.SLIDE:
          xp = xp + axis * (qpos[adr] - float(m.qpos0[adr]))
        elif jtype == JointType.HINGE:
          qloc = qmath.axis_angle_to_quat(jaxis, qpos[adr] - float(m.qpos0[adr]))
          xq = qmath.quat_mul(xq, qloc)
          xp = anchor - qmath.quat_rotate(xq, jpos)
    xpos[i] = xp
    xquat[i] = qmath.normalize(xq)

  xpos = jnp.stack(xpos)
  xquat = jnp.stack(xquat)
  xmat = qmath.quat_to_mat(xquat)
  xanchor = jnp.stack(xanchor)[:m.njnt]
  xaxis = jnp.stack(xaxis)[:m.njnt]

  # inertial frames
  ipos = jnp.asarray(m.body_ipos, dtype)
  iquat = jnp.asarray(m.body_iquat, dtype)
  xipos = xpos + jnp.einsum("bij,bj->bi", xmat, ipos)
  ximat = xmat @ qmath.quat_to_mat(iquat)

  # sites / geoms: static gathers over body ids
  sb = m.site_bodyid
  site_xpos = xpos[sb] + jnp.einsum(
      "bij,bj->bi", xmat[sb], jnp.asarray(m.site_pos, dtype))
  site_xmat = xmat[sb] @ qmath.quat_to_mat(jnp.asarray(m.site_quat, dtype))
  gb = m.geom_bodyid
  geom_xpos = xpos[gb] + jnp.einsum(
      "bij,bj->bi", xmat[gb], jnp.asarray(m.geom_pos, dtype))
  geom_xmat = xmat[gb] @ qmath.quat_to_mat(jnp.asarray(m.geom_quat, dtype))

  return dict(
      xpos=xpos, xquat=xquat, xmat=xmat, xipos=xipos, ximat=ximat,
      xanchor=xanchor, xaxis=xaxis, site_xpos=site_xpos, site_xmat=site_xmat,
      geom_xpos=geom_xpos, geom_xmat=geom_xmat)


# ---------------------------------------------------------------------------
# com-level quantities: subtree com, spatial inertia, dof axes
# ---------------------------------------------------------------------------


def com_pos(m: Model, kin: dict, overlay: dict | None = None):
  """subtree_com, cinert (world-origin 6x6), cdof (world-origin axes).

  ``overlay['body_mass']`` (domain randomization) overrides the static
  masses; inertia tensors stay nominal, matching the reference's
  setConst-skipping approximation (baoding_v1.py:364).
  """
  xipos, ximat = kin["xipos"], kin["ximat"]
  dtype = xipos.dtype
  if overlay and "body_mass" in overlay:
    mass = jnp.asarray(overlay["body_mass"], dtype)
  else:
    mass = jnp.asarray(m.body_mass, dtype)

  # subtree com by reverse accumulation (statically unrolled)
  wsum = [mass[i] * xipos[i] for i in range(m.nbody)]
  msum = [mass[i] for i in range(m.nbody)]
  for i in range(m.nbody - 1, 0, -1):
    p = int(m.body_parentid[i])
    wsum[p] = wsum[p] + wsum[i]
    msum[p] = msum[p] + msum[i]
  subtree_com = jnp.stack(
      [wsum[i] / jnp.maximum(msum[i], 1e-12) for i in range(m.nbody)])

  inertia = jnp.asarray(m.body_inertia, dtype)
  cinert = jax.vmap(spatial_inertia)(mass, inertia, xipos, ximat)

  # dof motion axes at world origin
  cdof = [jnp.zeros(6, dtype)] * m.nv
  for j in range(m.njnt):
    jtype = int(m.jnt_type[j])
    vadr = int(m.jnt_dofadr[j])
    bid = int(m.jnt_bodyid[j])
    anchor = kin["xanchor"][j]
    axis = kin["xaxis"][j]
    xmat_b = kin["xmat"][bid]
    if jtype == JointType.FREE:
      for k in range(3):
        e = jnp.zeros(3, dtype).at[k].set(1.0)
        cdof[vadr + k] = jnp.concatenate([jnp.zeros(3, dtype), e])
      for k in range(3):
        w = xmat_b[:, k]  # child-frame axes (local angular velocity)
        cdof[vadr + 3 + k] = jnp.concatenate(
            [w, jnp.cross(anchor, w)])
    elif jtype == JointType.BALL:
      for k in range(3):
        w = xmat_b[:, k]
        cdof[vadr + k] = jnp.concatenate([w, jnp.cross(anchor, w)])
    elif jtype == JointType.SLIDE:
      cdof[vadr] = jnp.concatenate([jnp.zeros(3, dtype), axis])
    else:  # HINGE
      cdof[vadr] = jnp.concatenate([axis, jnp.cross(anchor, axis)])
  cdof = jnp.stack(cdof) if m.nv else jnp.zeros((0, 6), dtype)
  return subtree_com, cinert, cdof


# ---------------------------------------------------------------------------
# CRB mass matrix + dense factorization
# ---------------------------------------------------------------------------


def _ancestor_mask(m: Model) -> np.ndarray:
  """mask[i, j] = 1 where dof j is dof i or an ancestor of dof i (static)."""
  mask = np.zeros((m.nv, m.nv), dtype=np.float64)
  for i in range(m.nv):
    j = i
    while j >= 0:
      mask[i, j] = 1.0
      j = int(m.dof_parentid[j])
  return mask


def crb(m: Model, cinert: jax.Array, cdof: jax.Array) -> jax.Array:
  """Dense joint-space mass matrix via composite rigid bodies."""
  dtype = cdof.dtype
  # composite (subtree) inertia per body
  csub = [cinert[i] for i in range(m.nbody)]
  for i in range(m.nbody - 1, 0, -1):
    p = int(m.body_parentid[i])
    csub[p] = csub[p] + csub[i]
  # F_i = I_subtree(body(dof_i)) @ cdof_i  -> [nv, 6]
  f_rows = [csub[int(m.dof_bodyid[i])] @ cdof[i] for i in range(m.nv)]
  F = jnp.stack(f_rows) if m.nv else jnp.zeros((0, 6), dtype)
  lower = (F @ cdof.T) * jnp.asarray(_ancestor_mask(m), dtype)
  qM = lower + lower.T - jnp.diag(jnp.diag(lower))
  return qM + jnp.diag(jnp.asarray(m.dof_armature, dtype))


def factor_m(qM: jax.Array) -> jax.Array:
  """Cholesky factor (lower) of the mass matrix (unrolled; ops/linalg)."""
  from myosuite_mjx_tpu.ops import linalg
  return linalg.chol_factor(qM)


def solve_m(qLD: jax.Array, x: jax.Array) -> jax.Array:
  """Solve M y = x given the Cholesky factor (supports vector or matrix x)."""
  from myosuite_mjx_tpu.ops import linalg
  return linalg.cho_solve(qLD, x)


# ---------------------------------------------------------------------------
# velocity products
# ---------------------------------------------------------------------------


def com_vel(m: Model, cdof: jax.Array, qvel: jax.Array):
  """Body spatial velocities and dof-axis time derivatives (mj_comVel)."""
  dtype = cdof.dtype
  cvel = [jnp.zeros(6, dtype)] * m.nbody
  cdof_dot = [jnp.zeros(6, dtype)] * max(m.nv, 1)

  for i in range(1, m.nbody):
    p = int(m.body_parentid[i])
    v = cvel[p]
    ja, jn = int(m.body_jntadr[i]), int(m.body_jntnum[i])
    for j in range(ja, ja + jn):
      jtype = int(m.jnt_type[j])
      vadr = int(m.jnt_dofadr[j])
      if jtype == JointType.FREE:
        # translations: world-fixed axes, no derivative
        v = v + (cdof[vadr] * qvel[vadr] + cdof[vadr + 1] * qvel[vadr + 1]
                 + cdof[vadr + 2] * qvel[vadr + 2])
        vnew = v
        for k in range(3):
          vnew = vnew + cdof[vadr + 3 + k] * qvel[vadr + 3 + k]
        # rotational axes ride the child frame: differentiate against the
        # full velocity including the joint's own angular motion
        for k in range(3):
          cdof_dot[vadr + 3 + k] = motion_cross(vnew, cdof[vadr + 3 + k])
        v = vnew
      elif jtype == JointType.BALL:
        vnew = v
        for k in range(3):
          vnew = vnew + cdof[vadr + k] * qvel[vadr + k]
        for k in range(3):
          cdof_dot[vadr + k] = motion_cross(vnew, cdof[vadr + k])
        v = vnew
      else:  # SLIDE / HINGE: axis invariant under own motion
        cdof_dot[vadr] = motion_cross(v, cdof[vadr])
        v = v + cdof[vadr] * qvel[vadr]
    cvel[i] = v

  cvel = jnp.stack(cvel)
  cdof_dot = (jnp.stack(cdof_dot)[:m.nv] if m.nv
              else jnp.zeros((0, 6), dtype))
  return cvel, cdof_dot


def rne(m: Model, cinert: jax.Array, cdof: jax.Array, cdof_dot: jax.Array,
        cvel: jax.Array, qvel: jax.Array) -> jax.Array:
  """Bias force C(q, qvel) via recursive Newton-Euler (qacc = 0)."""
  dtype = cdof.dtype
  gravity = jnp.asarray(m.opt.gravity, dtype)
  from myosuite_mjx_tpu.engine.model import DSBL_GRAVITY
  if m.opt.disableflags & DSBL_GRAVITY:
    gravity = jnp.zeros(3, dtype)

  cacc = [jnp.zeros(6, dtype)] * m.nbody
  cacc[0] = jnp.concatenate([jnp.zeros(3, dtype), -gravity])
  for i in range(1, m.nbody):
    p = int(m.body_parentid[i])
    a = cacc[p]
    da, dn = int(m.body_dofadr[i]), int(m.body_dofnum[i])
    for j in range(da, da + dn):
      a = a + cdof_dot[j] * qvel[j]
    cacc[i] = a

  cfrc = [jnp.zeros(6, dtype)] * m.nbody
  for i in range(1, m.nbody):
    mom = cinert[i] @ cvel[i]
    cfrc[i] = cinert[i] @ cacc[i] + force_cross(cvel[i], mom)
  for i in range(m.nbody - 1, 0, -1):
    p = int(m.body_parentid[i])
    if p > 0:
      cfrc[p] = cfrc[p] + cfrc[i]

  bias = [cdof[j] @ cfrc[int(m.dof_bodyid[j])] for j in range(m.nv)]
  return jnp.stack(bias) if m.nv else jnp.zeros((0,), dtype)


# ---------------------------------------------------------------------------
# jacobians
# ---------------------------------------------------------------------------


_mask_cache: dict[int, np.ndarray] = {}


def body_dof_mask(m: Model) -> np.ndarray:
  """[nbody, nv] mask: dofs on the ancestor chain of each body (static)."""
  key = id(m)
  if key not in _mask_cache:
    mask = np.zeros((m.nbody, m.nv))
    for b in range(m.nbody):
      i = b
      while i > 0:
        da, dn = int(m.body_dofadr[i]), int(m.body_dofnum[i])
        mask[b, da:da + dn] = 1.0
        i = int(m.body_parentid[i])
    _mask_cache[key] = mask
  return _mask_cache[key]


def point_jac_dir(m: Model, cdof: jax.Array, points: jax.Array,
                  bodyids, dirs: jax.Array) -> jax.Array:
  """Directional point jacobians, vectorized: rows (jacp(p_i, b_i)^T d_i).

  points: [S, 3], bodyids: [S] (static numpy or traced int array),
  dirs: [S, 3]. Returns [S, nv] — the generalized-coordinate gradient of
  each point's displacement along its direction. One fused computation for
  all tendon segments / contacts instead of per-point unrolled jacobians.
  """
  mask = jnp.asarray(body_dof_mask(m), cdof.dtype)[bodyids]      # [S, nv]
  ang = cdof[:, :3]                                              # [nv, 3]
  lin = cdof[:, 3:]
  # v(point) = lin + ang x point per dof; projecting on dir uses the scalar
  # triple product (ang x p) . d = ang . (p x d), so the [S, nv, 3] cross
  # intermediate never materializes — two [S,3]x[3,nv] matmuls instead
  pc = jnp.cross(points, dirs)                                   # [S, 3]
  proj = dirs @ lin.T + pc @ ang.T                               # [S, nv]
  return proj * mask


def rot_jac_dir(m: Model, cdof: jax.Array, bodyids,
                dirs: jax.Array) -> jax.Array:
  """Rotational analogue of point_jac_dir: rows (jacr(b_i)^T d_i)."""
  mask = jnp.asarray(body_dof_mask(m), cdof.dtype)[bodyids]      # [S, nv]
  proj = jnp.einsum("nk,sk->sn", cdof[:, :3], dirs)
  return proj * mask


def point_jacobian(m: Model, cdof: jax.Array, point: jax.Array,
                   bodyid: int) -> tuple[jax.Array, jax.Array]:
  """(jacp, jacr): translational/rotational Jacobian of a world point on a
  body. Static ancestor chain -> dense [3, nv] with a static mask."""
  dtype = cdof.dtype
  mask = np.zeros((m.nv,), np.float64)
  b = int(bodyid)
  while b > 0:
    da, dn = int(m.body_dofadr[b]), int(m.body_dofnum[b])
    mask[da:da + dn] = 1.0
    b = int(m.body_parentid[b])
  maskj = jnp.asarray(mask, dtype)
  ang = cdof[:, :3] * maskj[:, None]      # [nv, 3]
  lin0 = cdof[:, 3:] * maskj[:, None]
  # velocity of the point: v(point) = lin0 + ang x point
  jacp = (lin0 + jnp.cross(ang, point[None, :])).T
  jacr = ang.T
  return jacp, jacr
