"""Distributed runtime: mesh construction + sharded rollout/training.

The reference's only distributed machinery is brax's pmap data-parallelism
(max_devices_per_host=8, /root/reference/myosuite/mjx/ppo_continuous_action
.py:59) and SLURM job farming. TPU-native replacement (SURVEY.md §2.4):

* one ``Mesh`` over all chips/hosts with a single ``data`` axis — env batch
  sharded across it, learner params replicated,
* jit-with-shardings so XLA lowers gradient reductions to ICI all-reduces,
* ``jax.distributed.initialize`` for multi-host pods (one program, all
  hosts).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None) -> Mesh:
  """1-D mesh with a single ``data`` axis over all (or given) devices."""
  devices = devices if devices is not None else jax.devices()
  return Mesh(np.asarray(devices), ("data",))


def init_distributed():
  """Multi-host initialization (no-op on single host)."""
  if jax.process_count() > 1:
    return
  try:
    jax.distributed.initialize()
  except (RuntimeError, ValueError):
    pass  # single-host / already initialized


def shard_env_batch(mesh: Mesh, tree):
  """Place a batched pytree with its leading axis split over ``data``."""
  sharding = NamedSharding(mesh, P("data"))
  return jax.tree.map(
      lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim
      else jax.device_put(x, NamedSharding(mesh, P())), tree)


def replicate(mesh: Mesh, tree):
  sharding = NamedSharding(mesh, P())
  return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


class ShardedPPO:
  """Data-parallel PPO: env batch sharded over the mesh, params replicated.

  Wraps train.ppo.PPO's pure train_step with explicit shardings; XLA inserts
  the psum for gradients (they contract the sharded batch axis into the
  replicated params) over ICI.
  """

  def __init__(self, ppo, mesh: Mesh | None = None):
    self.ppo = ppo
    self.mesh = mesh or data_mesh()
    n = self.mesh.devices.size
    if ppo.cfg.num_envs % n:
      raise ValueError(
          f"num_envs={ppo.cfg.num_envs} not divisible by mesh size {n}")

    def _prec(fn):
      def wrapped(*a):
        with jax.default_matmul_precision("highest"):
          return fn(*a)
      return wrapped

    self._step = jax.jit(_prec(ppo.train_step))

  def init(self, seed: int = 0):
    ts = self.ppo.init(seed)
    return self.place(ts)

  def place(self, ts):
    env_state = shard_env_batch(self.mesh, ts.env_state)
    rest = replicate(
        self.mesh, (ts.params, ts.opt_state, ts.key, ts.steps))
    params, opt_state, key, steps = rest
    return ts.replace(params=params, opt_state=opt_state,
                      env_state=env_state, key=key, steps=steps)

  def train_step(self, ts):
    return self._step(ts)
