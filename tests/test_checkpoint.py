"""Checkpoint round-trip: exact resume of PPO TrainState."""
import jax
import numpy as np

from myosuite_mjx_tpu import envs
from myosuite_mjx_tpu.train import checkpoint
from myosuite_mjx_tpu.train.ppo import PPO, PPOConfig


def test_checkpoint_roundtrip(tmp_path):
  ppo = PPO(envs.make("myoFingerPoseRandom-v0"),
            PPOConfig(num_envs=4, unroll_length=2, num_minibatches=2,
                      update_epochs=1))
  ts = ppo.init(0)
  ts2, _ = jax.jit(ppo.train_step)(ts)
  p = str(tmp_path / "ckpt")
  checkpoint.save(p, ts2)
  restored = checkpoint.restore(p, ts2)
  for a, b in zip(jax.tree.leaves(ts2), jax.tree.leaves(restored)):
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
  # resumed training continues identically
  ts3a, m3a = jax.jit(ppo.train_step)(ts2)
  ts3b, m3b = jax.jit(ppo.train_step)(restored)
  np.testing.assert_allclose(float(m3a["loss"]), float(m3b["loss"]),
                             rtol=1e-6)
