"""Trace logger + examine CLI round-trip."""
import numpy as np

from myosuite_mjx_tpu.logger.trace import Trace


def test_trace_roundtrip(tmp_path):
  t = Trace("test")
  for ep in range(2):
    for i in range(5):
      t.append_datums(f"Trial{ep}", obs=np.arange(3) + i, rew=float(i))
  assert t.verify()
  t.stack()
  assert t.trace["Trial0"]["obs"].shape == (5, 3)

  for ext in ("h5", "pkl"):
    p = str(tmp_path / f"trace.{ext}")
    t.save(p)
    t2 = Trace.load(p)
    np.testing.assert_allclose(
        np.asarray(t2.trace["Trial1"]["obs"]), t.trace["Trial1"]["obs"])


def test_examine_env_rollout():
  import jax
  from myosuite_mjx_tpu import envs
  from myosuite_mjx_tpu.utils.examine_env import random_policy, rollout
  env = envs.make("myoFingerPoseFixed-v0", cache=True)
  policy = random_policy(env, None)
  trace, _ = rollout(env, policy, num_episodes=1, seed=0)
  assert "Trial0" in trace.trace
  assert trace.trace["Trial0"]["observations"].shape[0] > 1
