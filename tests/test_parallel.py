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


def test_sharded_npg_matches_single_device():
  """NPG sharded-vs-single on the virtual mesh.

  Trajectory-level parity cannot be bitwise here: a horizon-100 rollout
  of chaotic musculoskeletal dynamics amplifies per-device reduction-
  order float differences (unlike the unroll-4 PPO test above). The
  contract checked instead: identical PRNG streams, the same update
  *structure* (finite KL-scaled step of the same magnitude), returns
  within 1%, a parameter step in the same direction (cosine > 0.9), and
  params replicated across all 8 devices."""
  from myosuite_mjx_tpu.train.npg import NPG, NPGConfig
  env = envs.make("myoFingerPoseRandom-v0")
  cfg = NPGConfig(num_envs=8, hidden=(16,), vf_hidden=(16,),
                  vf_batch_size=32, cg_iters=4)
  npg = NPG(env, cfg)
  ts0 = npg.init(0)
  p0 = np.concatenate([np.ravel(x) for x in jax.tree.leaves(ts0.params)])
  ts_a, m_a = jax.jit(npg.train_step)(ts0)

  npg_b = NPG(env, cfg)
  sharded = pmesh.ShardedNPG(npg_b, pmesh.data_mesh())
  ts_b, m_b = sharded.train_step(sharded.init(0))
  np.testing.assert_allclose(
      float(m_a["stoc_pol_mean"]), float(m_b["stoc_pol_mean"]), rtol=1e-2)
  np.testing.assert_allclose(
      float(m_a["kl_step_alpha"]), float(m_b["kl_step_alpha"]), rtol=5e-2)
  da = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
      ts_a.params)]) - p0
  db = np.concatenate([np.ravel(x) for x in jax.tree.leaves(
      ts_b.params)]) - p0
  cos = float(da @ db / (np.linalg.norm(da) * np.linalg.norm(db) + 1e-12))
  assert cos > 0.9, f"update directions diverged: cosine={cos:.3f}"
  # params stay replicated on every device
  p = jax.tree.leaves(ts_b.params)[0]
  assert len({s.device for s in p.addressable_shards}) == 8
