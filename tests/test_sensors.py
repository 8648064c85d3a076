"""Site <force> sensor parity vs the CPU MuJoCo oracle.

MuJoCo evaluates mjSENS_FORCE from cfrc_int in mj_rnePostConstraint;
engine/sensors.force_sensor reimplements that accounting (subtree force
balance with contact + applied external forces). Reference consumer:
r_socket_load, run_track_v0.py:638-639.
"""
import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward, sensors
from myosuite_mjx_tpu.engine import model as emodel

ARM_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="upper" pos="0 0 1">
      <joint name="shoulder" type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" fromto="0 0 0 0.3 0 0" size="0.03" mass="1.0"/>
      <body name="lower" pos="0.3 0 0">
        <joint name="elbow" type="hinge" axis="0 1 0" damping="0.1"/>
        <geom type="capsule" fromto="0 0 0 0.25 0 0" size="0.025"
              mass="0.7"/>
        <site name="wrist" pos="0.05 0 0" euler="0.3 0.5 0.1"/>
        <body name="hand" pos="0.25 0 0">
          <joint name="wristj" type="hinge" axis="1 0 0" damping="0.05"/>
          <geom type="sphere" size="0.04" mass="0.3"/>
        </body>
      </body>
    </body>
  </worldbody>
  <actuator>
    <motor joint="shoulder" gear="5"/>
    <motor joint="elbow" gear="3"/>
  </actuator>
  <sensor>
    <force name="wrist_load" site="wrist"/>
  </sensor>
</mujoco>
"""

# plate on a hinge with a free ball resting on it: contact forces must
# flow into the subtree force balance
PLATE_XML = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body name="plate" pos="0 0 0.5">
      <joint name="tilt" type="hinge" axis="0 1 0" damping="0.5"/>
      <geom type="box" size="0.2 0.2 0.01" mass="0.5"/>
      <site name="mount" pos="0 0 0" euler="0 0 0.4"/>
    </body>
    <body name="ball" pos="0.0 0 0.56">
      <freejoint/>
      <geom type="sphere" size="0.04" mass="0.2"/>
    </body>
  </worldbody>
  <sensor>
    <force name="plate_load" site="mount"/>
  </sensor>
</mujoco>
"""


def _compare(xml, steps, tol, ctrl_fn=None):
  mj = mujoco.MjModel.from_xml_string(xml)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  rng = np.random.default_rng(3)
  template = edata.make_data(m, dtype=jnp.float64)
  fwd = jax.jit(functools.partial(forward.forward, m))
  sid = int(m.name2id("sensor", list(
      mujoco.mj_id2name(mj, mujoco.mjtObj.mjOBJ_SENSOR, i)
      for i in range(mj.nsensor))[0]))
  site = int(m.sensor_objid[sid])

  worst = 0.0
  for t in range(steps):
    if ctrl_fn is not None:
      dref.ctrl[:] = ctrl_fn(rng)
    mujoco.mj_step(mj, dref)
    if (t + 1) % 10 != 0:
      continue
    mujoco.mj_forward(mj, dref)
    ours = fwd(template.replace(
        qpos=jnp.asarray(dref.qpos.copy()),
        qvel=jnp.asarray(dref.qvel.copy()),
        ctrl=jnp.asarray(dref.ctrl.copy())))
    got = np.asarray(sensors.force_sensor(m, ours, site))
    adr = mj.sensor_adr[0]
    want = dref.sensordata[adr:adr + 3].copy()
    err = np.abs(got - want).max()
    worst = max(worst, err)
    assert err < tol, (t, got, want)
  return worst


def test_force_sensor_smooth_chain():
  """No-contact chain under gravity + motors: exact inertial accounting."""
  _compare(ARM_XML, steps=120, tol=1e-6,
           ctrl_fn=lambda rng: rng.uniform(-1, 1, 2))


def test_force_sensor_with_contact():
  """Ball resting on a hinged plate: contact forces transmit through the
  sensor mount (solver differences bound the tolerance)."""
  worst = _compare(PLATE_XML, steps=400, tol=0.05)
  # the resting load is ~(0.2 kg) g ~ 2 N: demand errors well under that
  assert worst < 0.05


def test_force_sensor_matches_static_weight():
  """Sanity anchor independent of the oracle: at rest the plate sensor
  carries plate + ball weight along the site z-axis rotation."""
  mj = mujoco.MjModel.from_xml_string(PLATE_XML)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  for _ in range(1500):
    mujoco.mj_step(mj, dref)
  assert np.abs(dref.qvel).max() < 1e-3, "did not settle"
  template = edata.make_data(m, dtype=jnp.float64)
  d = forward.forward(m, template.replace(
      qpos=jnp.asarray(dref.qpos.copy()),
      qvel=jnp.asarray(dref.qvel.copy())))
  got = np.asarray(sensors.force_sensor(
      m, d, int(m.sensor_objid[m.name2id("sensor", "plate_load")])))
  total_w = (0.5 + 0.2) * 9.81
  assert abs(np.linalg.norm(got) - total_w) / total_w < 0.05
