"""Sharded training: 8-virtual-device CPU mesh (SURVEY.md §4 pattern)."""
import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu import envs
from myosuite_mjx_tpu.parallel import mesh as pmesh
from myosuite_mjx_tpu.train.ppo import PPO, PPOConfig


def small_ppo(num_envs=8):
  env = envs.make("myoFingerPoseRandom-v0")
  cfg = PPOConfig(num_envs=num_envs, unroll_length=4, num_minibatches=4,
                  update_epochs=2)
  return PPO(env, cfg)


def test_train_step_runs_and_learns_shapes():
  ppo = small_ppo()
  ts = ppo.init(0)
  step = jax.jit(ppo.train_step)
  ts2, metrics = step(ts)
  assert int(ts2.steps) == 4 * 8
  assert np.isfinite(float(metrics["loss"]))
  assert np.isfinite(float(metrics["reward_mean"]))
  # params actually changed
  p0 = jax.tree.leaves(ts.params)[0]
  p1 = jax.tree.leaves(ts2.params)[0]
  assert not np.allclose(np.asarray(p0), np.asarray(p1))


def test_sharded_train_step_matches_mesh():
  assert jax.device_count() >= 8, "conftest forces 8 virtual devices"
  ppo = small_ppo(num_envs=8)
  sharded = pmesh.ShardedPPO(ppo, pmesh.data_mesh())
  ts = sharded.init(0)
  # env batch is actually sharded over the data axis
  shard_devs = {s.device for s in ts.env_state.obs.addressable_shards}
  assert len(shard_devs) == 8
  ts2 = sharded.train_step(ts)[0]
  assert int(ts2.steps) == 4 * 8
  # params stay replicated
  p = jax.tree.leaves(ts2.params)[0]
  assert len({s.device for s in p.addressable_shards}) == 8


def test_sharded_matches_single_device():
  ppo = small_ppo(num_envs=8)
  ts_a, m_a = jax.jit(ppo.train_step)(ppo.init(0))
  sharded = pmesh.ShardedPPO(ppo, pmesh.data_mesh())
  ts_b, m_b = sharded.train_step(sharded.init(0))
  np.testing.assert_allclose(
      float(m_a["reward_mean"]), float(m_b["reward_mean"]), rtol=1e-5)
  pa = np.asarray(jax.tree.leaves(ts_a.params)[0])
  pb = np.asarray(jax.tree.leaves(ts_b.params)[0])
  np.testing.assert_allclose(pa, pb, atol=1e-5)
