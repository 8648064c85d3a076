"""PPO learner: on-device rollout + clipped-surrogate updates.

In-repo replacement for the reference's external trainers — brax PPO
(/root/reference/myosuite/mjx/ppo_continuous_action.py:27-67) and SB3 PPO
(/root/reference/myosuite/agents/sb3_job_script.py:31-131). Defaults follow
the reference configs: MLP [256, 128] policy/value (hydra_myo_sb3_ppo_config
.yaml:30-33), brax-style num_envs/unroll/minibatch layout.

Everything — rollout (lax.scan over the batched env), GAE, minibatch SGD —
lives in one jitted train_step. Multi-chip: shard the env batch over a
``data`` mesh axis (see parallel/mesh.py); gradients all-reduce over ICI
automatically under jit-with-shardings.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn
from flax import struct

from myosuite_mjx_tpu.envs.base import EnvState, MyoEnv


class ActorCritic(nn.Module):
  """Tanh-MLP actor-critic with state-independent log-std."""
  act_dim: int
  hidden: tuple = (256, 128)

  @nn.compact
  def __call__(self, obs):
    x = obs
    for h in self.hidden:
      x = nn.tanh(nn.Dense(h)(x))
    mean = nn.Dense(self.act_dim)(x)
    log_std = self.param(
        "log_std", nn.initializers.constant(-0.5), (self.act_dim,))
    v = obs
    for h in self.hidden:
      v = nn.tanh(nn.Dense(h)(v))
    value = nn.Dense(1)(v)[..., 0]
    return mean, log_std, value


@dataclasses.dataclass(frozen=True)
class PPOConfig:
  num_envs: int = 128
  unroll_length: int = 50
  num_minibatches: int = 32
  update_epochs: int = 8
  learning_rate: float = 3e-4
  gamma: float = 0.99
  gae_lambda: float = 0.95
  clip_eps: float = 0.2
  vf_coef: float = 0.5
  ent_coef: float = 0.0
  max_grad_norm: float = 0.5
  hidden: tuple = (256, 128)


@struct.dataclass
class TrainState:
  params: Any
  opt_state: Any
  env_state: EnvState       # batched [num_envs]
  key: jax.Array
  steps: jax.Array          # total env steps


def _gaussian_logp(mean, log_std, action):
  var = jnp.exp(2 * log_std)
  return jnp.sum(
      -0.5 * ((action - mean) ** 2 / var + 2 * log_std + jnp.log(2 * jnp.pi)),
      axis=-1)


class PPO:
  """PPO trainer bound to a MyoEnv."""

  def __init__(self, env: MyoEnv, config: PPOConfig = PPOConfig()):
    self.env = env
    self.cfg = config
    self.net = ActorCritic(act_dim=getattr(env, "action_dim", env.model.nu),
                           hidden=config.hidden)
    self.tx = optax.chain(
        optax.clip_by_global_norm(config.max_grad_norm),
        optax.adam(config.learning_rate),
    )

  # ---- initialization ----------------------------------------------------

  def init(self, seed: int = 0) -> TrainState:
    key = jax.random.PRNGKey(seed)
    key, k_net, k_env = jax.random.split(key, 3)
    obs_dim = int(np.prod(jax.eval_shape(
        self.env.reset, key).obs.shape))
    params = self.net.init(k_net, jnp.zeros((obs_dim,)))
    opt_state = self.tx.init(params)
    env_keys = jax.random.split(k_env, self.cfg.num_envs)
    env_state = jax.vmap(self.env.reset)(env_keys)
    return TrainState(params=params, opt_state=opt_state,
                      env_state=env_state, key=key,
                      steps=jnp.zeros((), jnp.int64)
                      if jax.config.jax_enable_x64
                      else jnp.zeros((), jnp.int32))

  # ---- one training iteration -------------------------------------------

  def train_step(self, ts: TrainState) -> tuple[TrainState, dict]:
    cfg = self.cfg
    env = self.env

    def policy_sample(params, obs, key):
      mean, log_std, value = self.net.apply(params, obs)
      act = mean + jnp.exp(log_std) * jax.random.normal(key, mean.shape)
      logp = _gaussian_logp(mean, log_std, act)
      return act, logp, value

    # ---- rollout: scan T steps of the vmapped env ----
    def rollout_body(carry, _):
      env_state, key = carry
      key, k_act = jax.random.split(key)
      obs = env_state.obs
      act, logp, value = policy_sample(ts.params, obs, k_act)
      act_clipped = jnp.clip(act, -1.0, 1.0)
      nxt = jax.vmap(env.autoreset_step)(env_state, act_clipped)
      transition = dict(
          obs=obs, act=act, logp=logp, value=value,
          reward=nxt.info["rwd_dense"],
          done=(nxt.info["terminated"]
                | nxt.info["truncated"]).astype(jnp.float32),
          solved=nxt.info["solved"].astype(jnp.float32),
      )
      return (nxt, key), transition

    key, k_roll = jax.random.split(ts.key)
    (env_state, _), traj = jax.lax.scan(
        rollout_body, (ts.env_state, k_roll), (),
        length=cfg.unroll_length)

    # ---- GAE ----
    _, _, last_value = self.net.apply(ts.params, env_state.obs)

    def gae_body(carry, t):
      gae, next_value = carry
      delta = (traj["reward"][t] + cfg.gamma * next_value
               * (1 - traj["done"][t]) - traj["value"][t])
      gae = delta + cfg.gamma * cfg.gae_lambda * (1 - traj["done"][t]) * gae
      return (gae, traj["value"][t]), gae

    T = cfg.unroll_length
    (_, _), advs = jax.lax.scan(
        gae_body, (jnp.zeros_like(last_value), last_value),
        jnp.arange(T - 1, -1, -1))
    advs = advs[::-1]
    returns = advs + traj["value"]

    # ---- flatten batch ----
    def flat(x):
      return x.reshape((T * cfg.num_envs,) + x.shape[2:])

    batch = dict(
        obs=flat(traj["obs"]), act=flat(traj["act"]),
        logp=flat(traj["logp"]), adv=flat(advs), ret=flat(returns),
        value=flat(traj["value"]))

    # ---- minibatch updates ----
    def loss_fn(params, mb):
      mean, log_std, value = self.net.apply(params, mb["obs"])
      logp = _gaussian_logp(mean, log_std, mb["act"])
      ratio = jnp.exp(logp - mb["logp"])
      adv = (mb["adv"] - mb["adv"].mean()) / (mb["adv"].std() + 1e-8)
      pg1 = ratio * adv
      pg2 = jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps) * adv
      pg_loss = -jnp.minimum(pg1, pg2).mean()
      v_loss = 0.5 * jnp.square(value - mb["ret"]).mean()
      ent = jnp.sum(log_std + 0.5 * jnp.log(2 * jnp.pi * jnp.e))
      loss = pg_loss + cfg.vf_coef * v_loss - cfg.ent_coef * ent
      return loss, dict(pg_loss=pg_loss, v_loss=v_loss)

    def epoch_body(carry, _):
      params, opt_state, key = carry
      key, k_perm = jax.random.split(key)
      n = T * cfg.num_envs
      perm = jax.random.permutation(k_perm, n)
      mb_size = n // cfg.num_minibatches

      def mb_body(carry, i):
        params, opt_state = carry
        idx = jax.lax.dynamic_slice_in_dim(perm, i * mb_size, mb_size)
        mb = {k: v[idx] for k, v in batch.items()}
        (loss, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

      (params, opt_state), losses = jax.lax.scan(
          mb_body, (params, opt_state), jnp.arange(cfg.num_minibatches))
      return (params, opt_state, key), losses.mean()

    (params, opt_state, key), losses = jax.lax.scan(
        epoch_body, (ts.params, ts.opt_state, key), (),
        length=cfg.update_epochs)

    metrics = dict(
        loss=losses.mean(),
        reward_mean=traj["reward"].mean(),
        solved_frac=traj["solved"].mean(),
    )
    new_ts = TrainState(
        params=params, opt_state=opt_state, env_state=env_state, key=key,
        steps=ts.steps + T * cfg.num_envs)
    return new_ts, metrics

  # ---- training loop -----------------------------------------------------

  def train(self, total_env_steps: int, seed: int = 0,
            progress: Callable | None = None):
    """Run training; returns (TrainState, list of metric dicts)."""
    cfg = self.cfg

    def _prec(fn):
      def wrapped(*a):
        with jax.default_matmul_precision("highest"):
          return fn(*a)
      return wrapped

    step_fn = jax.jit(_prec(self.train_step))
    ts = self.init(seed)
    per_iter = cfg.unroll_length * cfg.num_envs
    iters = max(1, total_env_steps // per_iter)
    history = []
    t0 = time.time()
    for it in range(iters):
      ts, metrics = step_fn(ts)
      if progress is not None:
        metrics = {k: float(v) for k, v in metrics.items()}
        metrics["wall"] = time.time() - t0
        metrics["env_steps"] = (it + 1) * per_iter
        history.append(metrics)
        progress(it, metrics)
    return ts, history
