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


def sensor_by_name(m: Model, d: Data, name: str) -> jax.Array:
  """Evaluate one named sensor (touch/jointpos/jointvel/actuatorfrc)."""
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
  raise NotImplementedError(f"sensor type {stype}")
