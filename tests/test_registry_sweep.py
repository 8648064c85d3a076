"""Full-registry contract sweep: every one of the ~334 registered IDs.

Mirrors the reference's every-ID integration sweep
(/root/reference/myosuite/tests/test_envs.py:33-129) at trace level:
construct the env, abstractly evaluate reset and step (jax.eval_shape runs
the full tracer through the physics pipeline, catching shape errors, bad
kwargs, missing sites/joints, and obs-assembly bugs without paying XLA
compile for 334 hand-scale programs), and check the obs layout is
well-formed. Numeric execution for every model family is covered by
tests/test_envs.py and the oracle parity suites.

Run explicitly: pytest -m sweep tests/test_registry_sweep.py
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_mjx_tpu import envs

pytestmark = pytest.mark.sweep

ALL_IDS = envs.registry_ids()


def test_registry_size():
  # every reference family must be present (334 as of round 2)
  assert len(ALL_IDS) >= 334


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_construct_and_trace(env_id):
  env = envs.make(env_id)
  key = jax.random.PRNGKey(0)

  st = jax.eval_shape(env.reset, key)
  assert st.obs.ndim == 1 and st.obs.size > 0, "empty obs layout"
  assert st.reward.shape == ()
  assert st.done.shape == ()

  act = jnp.zeros((env.action_dim,), jnp.float32)
  st2 = jax.eval_shape(env.step, st, act)
  assert st2.obs.shape == st.obs.shape
  for k in ("rwd_dense", "rwd_sparse", "solved", "terminated", "truncated"):
    assert k in st2.info, f"missing info key {k}"

  # autoreset path must also trace (structure-stable pytrees)
  st3 = jax.eval_shape(env.autoreset_step, st, act)
  assert jax.tree_util.tree_structure(st3) == \
      jax.tree_util.tree_structure(st2)


@pytest.mark.parametrize("env_id", ALL_IDS)
def test_numeric_reset_step(env_id):
  """Numeric reset + one step + finiteness for EVERY registered ID —
  behavior-level coverage matching the reference's every-ID sweep
  (/root/reference/myosuite/tests/test_envs.py:33-129), which runs each
  env rather than only tracing it. Runs eagerly (no whole-env jit): the
  physics scan body is the only compiled piece and its cache key is the
  model, so the ~190 myodm hand IDs share one compile instead of paying
  XLA for 334 hand-scale programs."""
  env = envs.make(env_id)
  st = env.reset(jax.random.PRNGKey(0))
  obs = np.asarray(st.obs)
  assert np.isfinite(obs).all(), "non-finite obs at reset"

  act = jnp.zeros((env.action_dim,), jnp.float32)
  st2 = env.step(st, act)
  assert np.isfinite(np.asarray(st2.obs)).all(), "non-finite obs after step"
  assert np.isfinite(float(st2.reward)), "non-finite reward"
  for k in ("rwd_dense", "rwd_sparse"):
    assert np.isfinite(np.asarray(st2.info[k])).all(), f"non-finite {k}"
