"""Env pickling contract + offline path evaluation utilities.

The reference pickle-round-trips every env in its contract sweep
(/root/reference/myosuite/tests/test_envs.py:100-104) and exposes
compute_path_rewards / truncate_paths / evaluate_success
(envs/env_base.py:709-770).
"""
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu import envs
from myosuite_mjx_tpu.utils import paths as paths_mod


def test_myoenv_pickle_roundtrip():
  env = envs.make("myoFingerPoseRandom-v0")
  env2 = pickle.loads(pickle.dumps(env))
  k = jax.random.PRNGKey(2)
  s1 = env.reset(k)
  s2 = env2.reset(k)
  np.testing.assert_allclose(np.asarray(s1.obs), np.asarray(s2.obs))
  a = jnp.full((env.action_dim,), 0.3)
  n1 = env.step(s1, a)
  n2 = env2.step(s2, a)
  np.testing.assert_allclose(np.asarray(n1.obs), np.asarray(n2.obs))
  np.testing.assert_allclose(float(n1.reward), float(n2.reward))


def test_gymenv_pickle_roundtrip():
  from myosuite_mjx_tpu.envs.gym_adapter import gym_make
  g = gym_make("myoFingerPoseFixed-v0", seed=3)
  obs1, _ = g.reset(seed=3)
  g2 = pickle.loads(pickle.dumps(g))
  obs2, _ = g2.reset(seed=3)
  np.testing.assert_allclose(obs1, obs2)
  a = np.zeros(g2.action_space.shape, np.float32)
  o1 = g.step(a)
  o2 = g2.step(a)
  np.testing.assert_allclose(o1[0], o2[0])
  assert o1[1] == o2[1]


def test_obs_codec_roundtrip():
  env = envs.make("myoFingerPoseFixed-v0")
  st = env.reset(jax.random.PRNGKey(0))
  od = paths_mod.obsvec2obsdict(env, np.asarray(st.obs)[None, None])
  assert set(od) == set(env.obs_keys)
  rebuilt = np.concatenate([od[k].ravel() for k in env.obs_keys])
  np.testing.assert_allclose(rebuilt, np.asarray(st.obs))


def test_compute_path_rewards_and_success():
  env = envs.make("myoFingerPoseFixed-v0")
  st = env.reset(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  obs, infos = [], {"solved": [], "rwd_dense": [], "rwd_sparse": []}
  for t in range(10):
    st = step(st, jnp.zeros(env.action_dim))
    obs.append(np.asarray(st.obs))
    for k in infos:
      infos[k].append(np.asarray(st.info[k]))
  path = {"observations": np.asarray(obs)[None],          # [1, T, obs]
          "env_infos": {k: np.asarray(v) for k, v in infos.items()},
          "aux": st.aux}
  out = paths_mod.compute_path_rewards(env, path)
  assert out["rewards"].shape == (10,)
  assert np.isfinite(out["rewards"]).all()
  # online dense reward at the matching (time-shifted) index agrees
  online = float(st.info["rwd_dense"])
  np.testing.assert_allclose(out["rewards"][-2], online, rtol=1e-5)

  # success evaluation over the env_infos contract
  p = {"env_infos": {"solved": np.zeros(10),
                     "rwd_dense": np.zeros(10),
                     "rwd_sparse": np.zeros(10)},
       "done": np.zeros(10, bool)}
  p2 = {"env_infos": {"solved": np.ones(10),
                      "rwd_dense": np.ones(10),
                      "rwd_sparse": np.ones(10)},
        "done": np.zeros(10, bool)}
  assert paths_mod.evaluate_success([p, p2]) == 50.0

  # truncate_paths cuts at first done
  p3 = {"done": np.array([False] * 6 + [True] * 4),
        "rewards": np.arange(10.0)}
  out3 = paths_mod.truncate_paths([p3])[0]
  assert out3["terminated"] is True
  assert len(out3["rewards"]) == 8
