"""Gymnasium-surface parity tests (reference contract: env_base.py:31,
:100-113 spaces; tests/test_envs.py:33-129 contract sweep patterns)."""
import numpy as np
import pytest

from myosuite_mjx_tpu import envs

gymnasium = pytest.importorskip("gymnasium")


def test_gym_env_contract():
  env = envs.gym_make("myoFingerPoseFixed-v0", seed=0)
  assert isinstance(env, gymnasium.Env)
  obs, info = env.reset(seed=3)
  assert env.observation_space.contains(obs.astype(np.float32))
  assert env.action_space.shape == (env.unwrapped_myo.action_dim,)
  a = env.action_space.sample()
  obs2, r, term, trunc, info = env.step(a)
  assert obs2.shape == obs.shape and np.isfinite(r)
  assert isinstance(term, bool) and isinstance(trunc, bool)
  assert "solved" in info and "rwd_sparse" in info

  # reseed determinism (tests/test_envs.py:100-104)
  o1, _ = env.reset(seed=7)
  o2, _ = env.reset(seed=7)
  np.testing.assert_allclose(o1, o2)


def test_gym_env_truncates_at_horizon():
  env = envs.gym_make("myoFingerPoseFixed-v0", seed=0, horizon=3)
  env.reset(seed=0)
  a = np.zeros(env.action_space.shape, np.float32)
  flags = [env.step(a)[2:4] for _ in range(3)]
  assert flags[-1][1] or flags[-1][0]   # truncated (or terminated) at horizon


def test_gym_vec_env():
  venv = envs.gym_make("myoFingerPoseRandom-v0", seed=0, num_envs=4)
  obs, _ = venv.reset()
  assert obs.shape[0] == 4
  acts = np.zeros((4,) + venv.single_action_space.shape, np.float32)
  obs2, rew, done, trunc, info = venv.step(acts)
  assert obs2.shape == obs.shape and rew.shape == (4,)
  # random task: per-env variation
  assert not np.allclose(obs[0], obs[1])
