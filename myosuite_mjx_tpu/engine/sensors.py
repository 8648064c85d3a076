"""Sensor evaluation (subset used by the Myo suite).

Touch sensors (ground-reaction forces for ChaseTag/RunTrack) sum the normal
forces of contacts on the sensor site's body — a faithful approximation of
MuJoCo's site-volume matching for the foot-sized sensor zones. Joint /
actuator sensors read state directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.engine.model import Model, SensorType


def touch_sensor(m: Model, d: Data, site_id: int) -> jax.Array:
  """Total contact normal force on the site's body."""
  body = int(m.site_bodyid[site_id])
  g1b = jnp.asarray(m.geom_bodyid)[d.contact.geom1]
  g2b = jnp.asarray(m.geom_bodyid)[d.contact.geom2]
  on_body = (g1b == body) | (g2b == body)
  active = d.contact.dist < d.contact.includemargin
  return jnp.sum(jnp.where(on_body & active,
                           jnp.maximum(d.contact_force, 0.0), 0.0))


def _subtree_mask(m: Model, body: int) -> np.ndarray:
  """[nbody] 0/1: bodies in the subtree rooted at ``body`` (static)."""
  mask = np.zeros(m.nbody)
  parent = np.asarray(m.body_parentid)
  for b in range(m.nbody):
    c = b
    while True:
      if c == body:
        mask[b] = 1.0
        break
      if c == 0:
        break
      c = int(parent[c])
  return mask


def force_sensor(m: Model, d: Data, site_id: int) -> jax.Array:
  """Site ``<force>`` sensor: interaction force between the site's body
  subtree and its parent, in the site frame.

  MuJoCo computes this in mj_rnePostConstraint (mjSENS_FORCE reads
  cfrc_int of the site's body): with world-origin spatial accelerations
  cacc (gravity folded into the base, d'Alembert), the subtree force
  balance gives

    F_int(b) = sum_{c in subtree(b)} [ (I_c cacc_c + cvel_c x* I_c cvel_c)
                                       - F_ext_c ]_linear

  where F_ext covers contact forces and xfrc_applied (actuator/tendon
  forces are treated as transmitted through the joints, matching MuJoCo's
  accounting). The linear part of a world-origin wrench is
  translation-invariant, so torques never need to be propagated for a
  force-only sensor. Reference consumer: r_socket_load at
  run_track_v0.py:638-639.
  """
  from myosuite_mjx_tpu.engine import smooth
  dtype = d.qpos.dtype
  body = int(m.site_bodyid[site_id])

  gravity = jnp.asarray(m.opt.gravity, dtype)
  from myosuite_mjx_tpu.engine.model import DSBL_GRAVITY
  if m.opt.disableflags & DSBL_GRAVITY:
    gravity = jnp.zeros(3, dtype)

  # world-origin spatial acceleration per body: base (0, -g) plus the
  # ancestor-chain dof contributions cdof qacc + cdof_dot qvel
  bdm = jnp.asarray(smooth.body_dof_mask(m), dtype)          # [nbody, nv]
  contrib = d.cdof * d.qacc[:, None] + d.cdof_dot * d.qvel[:, None]
  cacc = bdm @ contrib                                       # [nbody, 6]
  cacc = cacc + jnp.concatenate([jnp.zeros(3, dtype), -gravity])[None, :]

  mom = smooth.inert_mul(d.cinert, d.cvel)
  cfrc = smooth.inert_mul(d.cinert, cacc) + smooth.force_cross(d.cvel, mom)
  f_body = cfrc[:, 3:]                                       # linear part

  # external forces: contacts (force on body2 = +F, body1 = -F) and
  # xfrc_applied linear part
  ext = jnp.zeros((m.nbody, 3), dtype)
  gb = jnp.asarray(m.geom_bodyid)
  active = (d.contact.dist < d.contact.includemargin)[:, None]
  fvec = jnp.where(active, d.contact_force_vec, 0.0)
  ext = ext.at[gb[d.contact.geom2]].add(fvec)
  ext = ext.at[gb[d.contact.geom1]].add(-fvec)
  ext = ext + d.xfrc_applied[:, :3]

  sub = jnp.asarray(_subtree_mask(m, body), dtype)           # [nbody]
  f_int = sub @ (f_body - ext)                               # [3]
  # site frame; MuJoCo reports the force applied TO the child subtree
  # (sign fixed against the CPU oracle in tests/test_sensors.py)
  return d.site_xmat[site_id].T @ f_int


def sensor_by_name(m: Model, d: Data, name: str) -> jax.Array:
  """Evaluate one named sensor (touch/jointpos/jointvel/force/...)."""
  sid = m.name2id("sensor", name)
  stype = int(m.sensor_type[sid])
  objid = int(m.sensor_objid[sid])
  if stype == SensorType.TOUCH:
    return jnp.atleast_1d(touch_sensor(m, d, objid))
  if stype == SensorType.JOINTPOS:
    return d.qpos[int(m.jnt_qposadr[objid])][None]
  if stype == SensorType.JOINTVEL:
    return d.qvel[int(m.jnt_dofadr[objid])][None]
  if stype == SensorType.ACTUATORPOS:
    return d.actuator_length[objid][None]
  if stype == SensorType.ACTUATORVEL:
    return d.actuator_velocity[objid][None]
  if stype == SensorType.ACTUATORFRC:
    return d.actuator_force[objid][None]
  if stype == SensorType.FORCE:
    return force_sensor(m, d, objid)
  raise NotImplementedError(f"sensor type {stype}")
