"""SAC trainer smoke + learning-dynamics checks (reference runs SB3 SAC,
agents/sb3_job_script.py; contract mirrored from tests/test_sb.py's
learn(total_timesteps=2) smoke)."""
import jax
import numpy as np
import pytest

from myosuite_mjx_tpu import envs
from myosuite_mjx_tpu.train.sac import SAC, SACConfig


def test_sac_smoke_and_update_gating():
  env = envs.make("myoFingerPoseFixed-v0")
  cfg = SACConfig(num_envs=8, buffer_size=1024, batch_size=32,
                  learning_starts=16, updates_per_step=2,
                  hidden=(32, 32))
  sac = SAC(env, cfg)
  ts = sac.init(seed=0)
  step = jax.jit(sac.train_step)

  p0 = jax.tree.leaves(ts.actor_params)[0]
  ts, m = step(ts)  # steps 0 -> 8: still warming up, no update applied
  p1 = jax.tree.leaves(ts.actor_params)[0]
  np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
  assert int(m["buffer_size"]) == 8

  for _ in range(4):
    ts, m = step(ts)
  p2 = jax.tree.leaves(ts.actor_params)[0]
  # past learning_starts: parameters moved, losses finite
  assert not np.allclose(np.asarray(p1), np.asarray(p2))
  assert np.isfinite(m["q_loss"]) and np.isfinite(m["a_loss"])
  assert m["alpha"] > 0
  assert int(ts.steps) == 40
  assert int(m["buffer_size"]) == 40


def test_sac_buffer_wraps():
  env = envs.make("myoFingerPoseFixed-v0")
  cfg = SACConfig(num_envs=8, buffer_size=16, batch_size=8,
                  learning_starts=0, updates_per_step=1, hidden=(16,))
  sac = SAC(env, cfg)
  ts = sac.init(seed=1)
  step = jax.jit(sac.train_step)
  for _ in range(3):  # 24 rows into a 16-slot ring
    ts, m = step(ts)
  assert bool(ts.buf_full)
  assert int(m["buffer_size"]) == 16


@pytest.mark.slow
def test_sac_solves_finger_pose():
  """SAC graduation regression (round-4 ask: prove it or drop it).

  The proof run (train_artifacts/sac_proof/myoFingerPoseFixed-v0.json)
  hit eval_success 1.0 at every 100k-step checkpoint; this regression
  replays the recipe to 200k steps and requires >= 0.8.
  """
  import jax.numpy as jnp
  env = envs.make("myoFingerPoseFixed-v0")
  cfg = SACConfig(num_envs=32, updates_per_step=8, learning_starts=5000)
  sac = SAC(env, cfg)
  step = jax.jit(sac.train_step)
  ts = sac.init(seed=0)
  for _ in range(200_000 // cfg.num_envs):
    ts, _ = step(ts)

  def body(carry, _):
    st, cnt = carry
    mean, _ = sac.actor.apply(ts.actor_params, st.obs)
    nxt = jax.vmap(env.step)(st, jnp.tanh(mean))
    return (nxt, cnt + nxt.info["solved"].astype(jnp.float32)), None

  st0 = jax.vmap(env.reset)(
      jax.random.split(jax.random.PRNGKey(7), 32))
  (_, cnt), _ = jax.lax.scan(body, (st0, jnp.zeros(32)), (),
                             length=env.horizon)
  success = float((cnt > 5).mean())
  assert success >= 0.8, f"SAC eval_success {success}"
