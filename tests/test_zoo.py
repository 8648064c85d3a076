"""Policy zoo: snapshot round-trip + inference contract.

Reference anchor: the agents baselines zoo consumed by
utils/examine_env.py --policy_path (myosuite/agents + examine_env.py).
"""
import os

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu import envs
from myosuite_mjx_tpu.train.ppo import PPO, PPOConfig
from myosuite_mjx_tpu.train import zoo


def test_snapshot_roundtrip(tmp_path):
  env = envs.make("myoFingerPoseFixed-v0")
  ppo = PPO(env, PPOConfig(num_envs=4, unroll_length=2, num_minibatches=2,
                           update_epochs=1, hidden=(16, 16)))
  ts = ppo.init(0)
  path = os.path.join(tmp_path, "policy.pkl")
  zoo.save_snapshot(path, ppo, ts, env_id="myoFingerPoseFixed-v0")

  pol = zoo.load_policy(path)
  assert pol.env_id == "myoFingerPoseFixed-v0"
  st = env.reset(jax.random.PRNGKey(0))
  a = pol.act(st.obs)
  assert a.shape == (env.action_dim,)
  assert np.isfinite(np.asarray(a)).all()
  assert (np.abs(np.asarray(a)) <= 1.0).all()
  # deterministic and jit/vmap-able (pure function of obs)
  np.testing.assert_allclose(np.asarray(a), np.asarray(pol.act(st.obs)))
  batch = jnp.stack([st.obs, st.obs + 0.1])
  ab = jax.jit(jax.vmap(pol.act))(batch)
  assert ab.shape == (2, env.action_dim)

  # obs normalization stats are folded in: perturbing them changes actions
  snap2 = dict(pol.snap)
  snap2["obs_mean"] = snap2["obs_mean"] + 5.0
  pol2 = zoo.Policy(snap2)
  assert not np.allclose(np.asarray(pol2.act(st.obs)), np.asarray(a))


def test_load_baseline_missing():
  import pytest
  with pytest.raises(FileNotFoundError):
    zoo.load_baseline("definitely-not-an-env-id")
