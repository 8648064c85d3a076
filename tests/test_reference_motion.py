"""ReferenceMotion: real myodm clips, interpolation + classification.

Mirrors the reference's dual-implementation parity suite
(/root/reference/myosuite/tests/mjx/test_reference_motion.py): every real
clip loads, classifies as TRACK, interpolates linearly, clamps at the end.
"""
import glob

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_mjx_tpu.logger.reference_motion import (
    ReferenceMotion, ReferenceType)

CLIPS = sorted(glob.glob(
    "/root/reference/myosuite/envs/myo/myodm/data/*.npz"))


def test_all_real_clips_load_and_classify():
  assert len(CLIPS) >= 90
  for clip in CLIPS:
    ref = ReferenceMotion(clip, dtype=jnp.float64)
    assert ref.type == ReferenceType.TRACK
    assert ref.robot_dim == 29
    assert ref.object_dim == 7
    assert ref.horizon == len(np.load(clip)["time"])


def test_track_interpolation_exact_and_midpoint():
  ref = ReferenceMotion(CLIPS[0], dtype=jnp.float64)
  raw = np.load(CLIPS[0])
  t = raw["time"]
  robot = raw["robot"]
  # exact frame
  out = ref.get_reference(jnp.asarray(t[10]))
  np.testing.assert_allclose(np.asarray(out["robot"]), robot[10], atol=1e-9)
  # midpoint
  tm = 0.5 * (t[10] + t[11])
  out = ref.get_reference(jnp.asarray(tm))
  np.testing.assert_allclose(
      np.asarray(out["robot"]), 0.5 * (robot[10] + robot[11]), atol=1e-9)
  # extrapolation clamps to last frame
  out = ref.get_reference(jnp.asarray(t[-1] + 5.0))
  np.testing.assert_allclose(np.asarray(out["robot"]), robot[-1], atol=1e-9)


def test_track_interp_traceable_under_vmap():
  ref = ReferenceMotion(CLIPS[0], dtype=jnp.float64)
  times = jnp.linspace(0.0, 1.5, 32)
  outs = jax.jit(jax.vmap(lambda t: ref.get_reference(t)["robot"]))(times)
  assert outs.shape == (32, 29)
  assert np.isfinite(np.asarray(outs)).all()


def test_random_reference_draws_within_range():
  reference = {
      "time": np.array((0.0, 4.0)),
      "robot": np.array([[-1.0, 0.0], [1.0, 2.0]]),
      "object": np.array([[-0.2, -0.2, 0.1, 1, 0, 0, -1],
                          [0.2, 0.2, 0.1, 1, 0, 0, 1]]),
  }
  ref = ReferenceMotion(reference, dtype=jnp.float64)
  assert ref.type == ReferenceType.RANDOM
  draws = [np.asarray(ref.get_reference(
      0.0, jax.random.PRNGKey(s))["robot"]) for s in range(20)]
  draws = np.stack(draws)
  assert (draws[:, 0] >= -1).all() and (draws[:, 0] <= 1).all()
  assert (draws[:, 1] >= 0).all() and (draws[:, 1] <= 2).all()
  # different keys give different draws (reference bug: fixed PRNGKey(0))
  assert np.std(draws[:, 0]) > 0.1


def test_fixed_reference():
  reference = {
      "time": np.array((0.0,)),
      "robot": np.zeros((1, 4)),
      "object": np.reshape(np.array((0.2, 0.2, 0.1, 1, 0, 0, 0.1)), (1, 7)),
  }
  ref = ReferenceMotion(reference, dtype=jnp.float64)
  assert ref.type == ReferenceType.FIXED
  out = ref.get_reference(2.0)
  np.testing.assert_allclose(np.asarray(out["object"]).ravel(),
                             reference["object"][0])
