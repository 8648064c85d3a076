"""Heightfield generators: determinism + shape + overlay integration.

Mirrors the reference determinism pattern
(/root/reference/myosuite/tests/test_heightfields.py:49-68): same seed =>
identical terrain.
"""
import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.envs import heightfields as hf


def test_chasetag_deterministic():
  f = hf.ChaseTagField(40, 40)
  a = np.asarray(f.generate(jax.random.PRNGKey(7)))
  b = np.asarray(f.generate(jax.random.PRNGKey(7)))
  c = np.asarray(f.generate(jax.random.PRNGKey(8)))
  np.testing.assert_array_equal(a, b)
  assert not np.array_equal(a, c)
  assert a.shape == (1600,)
  assert np.isfinite(a).all() and a.min() >= 0


def test_trackfield_difficulty_scales():
  f = hf.TrackField(48, 16)
  easy = np.asarray(f.generate(jax.random.PRNGKey(0), difficulty=0.2))
  hard = np.asarray(f.generate(jax.random.PRNGKey(0), difficulty=1.0))
  assert hard.max() > easy.max()


def test_local_heightmap():
  data = jnp.arange(100.0).reshape(10, 10).ravel()
  patch = hf.local_heightmap(data, 10, 10, (1.0, 1.0),
                             jnp.array([0.0, 0.0]), patch=(4, 4))
  assert patch.shape == (4, 4)


def test_hfield_overlay_changes_dynamics():
  """A terrain overlay actually alters contact heights."""
  import functools
  import mujoco
  from myosuite_mjx_tpu.engine import data as edata, forward, model as emodel
  xml = """
  <mujoco><option timestep="0.002"/>
  <asset><hfield name="hf" nrow="20" ncol="20" size="0.5 0.5 0.2 0.05"/></asset>
  <worldbody>
    <geom name="terrain" type="hfield" hfield="hf"/>
    <body pos="0 0 0.4"><freejoint/><geom type="sphere" size="0.05" mass="0.1"/></body>
  </worldbody></mujoco>"""
  mj = mujoco.MjModel.from_xml_string(xml)
  m = emodel.from_mj(mj)
  step = jax.jit(functools.partial(forward.step, m))
  d0 = edata.make_data(m, dtype=jnp.float64)
  # flat overlay vs raised overlay
  flat = d0.replace(overlay={"hfield_data": jnp.zeros(400, jnp.float64)})
  high = d0.replace(overlay={"hfield_data": jnp.ones(400, jnp.float64)})
  for _ in range(300):
    flat = step(flat)
    high = step(high)
  z_flat = float(flat.qpos[2])
  z_high = float(high.qpos[2])
  assert abs(z_flat - 0.05) < 0.01          # rests on the base plane
  assert abs(z_high - 0.25) < 0.01          # rests on raised terrain (0.2+r)
