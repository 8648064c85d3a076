"""Parity: condim 4/6 friction rows (torsional + rolling) vs CPU MuJoCo.

condim 4 is reachable from registered tasks: the pen (myohand_pen.xml),
die (myohand_die.xml), relocate (myoarm_relocate.xml) and SAR
(myohand_sar.xml) scenes all mark their object geoms condim="4"
(reference assets, e.g.
/root/reference/myosuite/envs/myo/assets/hand/myohand_pen.xml).  These
tests isolate the extra pyramid rows on scenes where they are the ONLY
thing that changes the motion:

- condim 3 vs 4: a sphere spinning in place about the contact normal.
  With condim 3 nothing opposes the spin (it persists); with condim 4
  torsional friction spins it down.  Trajectory must match MuJoCo.
- condim 6: a ball rolling without slipping.  Rolling friction
  decelerates it; trajectory must match MuJoCo.
"""
import functools

import jax
import jax.numpy as jnp
import mujoco
import numpy as np

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel


def _scene(condim, friction):
  return f"""
<mujoco><compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <geom name="floor" type="plane" size="1 1 1" condim="{condim}"
        friction="{friction}"/>
  <body pos="0 0 0.0499">
    <freejoint/>
    <geom name="ball" type="sphere" size="0.05" mass="0.1"
          condim="{condim}" friction="{friction}"/>
  </body>
</worldbody></mujoco>"""


def _run_pair(xml, nsteps, qvel0, atol):
  mj = mujoco.MjModel.from_xml_string(xml)
  m = emodel.from_mj(mj)
  dref = mujoco.MjData(mj)
  dref.qvel[:] = qvel0
  d = edata.make_data(m, dtype=jnp.float64)
  d = d.replace(qvel=jnp.asarray(qvel0, jnp.float64))
  step = jax.jit(functools.partial(forward.step, m))
  for _ in range(nsteps):
    mujoco.mj_step(mj, dref)
    d = step(d)
  np.testing.assert_allclose(np.asarray(d.qpos), dref.qpos, atol=atol)
  np.testing.assert_allclose(np.asarray(d.qvel), dref.qvel, atol=atol * 100)
  return d, dref


def test_condim4_torsional_spindown():
  # ball spinning about the vertical contact normal; torsional friction
  # (second slot) must decelerate it exactly as MuJoCo does
  qvel0 = np.zeros(6)
  qvel0[5] = 20.0                       # wz spin
  d, dref = _run_pair(_scene(4, "1 0.05 0.0001"), 150, qvel0, atol=1e-6)
  # the row did real work: spin visibly decayed
  assert abs(dref.qvel[5]) < 15.0


def test_condim3_spin_persists_condim4_decays():
  # differential check: identical scene, only condim changes; condim 3
  # must leave the spin untouched relative to condim 4
  qvel0 = np.zeros(6)
  qvel0[5] = 20.0
  d3, r3 = _run_pair(_scene(3, "1 0.05 0.0001"), 100, qvel0, atol=1e-6)
  d4, r4 = _run_pair(_scene(4, "1 0.05 0.0001"), 100, qvel0, atol=1e-6)
  assert abs(float(d3.qvel[5])) > abs(float(d4.qvel[5])) + 1.0


def test_condim6_rolling_decay():
  # ball rolling along +x; rolling friction (third slot) decelerates the
  # roll; condim 6 exercises all five pyramid friction dims
  qvel0 = np.zeros(6)
  qvel0[0] = 0.5                        # vx
  qvel0[4] = 10.0                       # wy (rolling forward)
  d, dref = _run_pair(_scene(6, "1 0.05 0.01"), 150, qvel0, atol=1e-6)
  assert abs(dref.qvel[4]) < 9.0        # rolling friction acted


def test_condim4_ellipsoid_pen_like():
  # pen-scene analogue: condim-4 ellipsoid (the actual pen geom type)
  # resting and spinning on a plane
  xml = """
<mujoco><compiler angle="radian"/>
<option timestep="0.002"/>
<worldbody>
  <geom name="floor" type="plane" size="1 1 1"/>
  <body pos="0 0 0.0149">
    <freejoint/>
    <geom name="obj" type="ellipsoid" size="0.015 0.015 0.045"
          condim="4" density="1500" euler="0 1.5708 0"/>
  </body>
</worldbody></mujoco>"""
  qvel0 = np.zeros(6)
  qvel0[5] = 10.0
  _run_pair(xml, 100, qvel0, atol=5e-5)
