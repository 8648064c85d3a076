"""Checkpoint/resume for training state (orbax).

Capability parity with the reference's trainer-side checkpointing
(SB3 CheckpointCallback/resume, agents/sb3_job_script.py:85-118; brax
model.save_params) — here a single orbax checkpoint of the full PPO
TrainState pytree (params + optimizer + env states + PRNG), which makes
resume exact.
"""
from __future__ import annotations

import os

import jax
import orbax.checkpoint as ocp


def _prune_empty(tree):
  """orbax rejects zero-size arrays; drop them (restored from template)."""
  return jax.tree.map(
      lambda x: None if getattr(x, "size", 1) == 0 else x, tree)


def save(path: str, train_state) -> None:
  path = os.path.abspath(path)
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(path, _prune_empty(train_state), force=True)
  ckptr.wait_until_finished()


def restore(path: str, template):
  """Restore into the shape/dtype structure of ``template``."""
  path = os.path.abspath(path)
  ckptr = ocp.StandardCheckpointer()
  abstract = jax.tree.map(
      ocp.utils.to_shape_dtype_struct, _prune_empty(template))
  restored = ckptr.restore(path, abstract)
  # reinsert zero-size leaves from the template
  return jax.tree.map(
      lambda t, r: t if getattr(t, "size", 1) == 0 else r,
      template, restored,
      is_leaf=lambda x: x is None or getattr(x, "size", 1) == 0)


def save_params(path: str, params) -> None:
  """Policy-only export (pickle) for examine_env-style consumers."""
  import pickle
  with open(path, "wb") as f:
    pickle.dump(jax.tree.map(lambda x: __import__("numpy").asarray(x),
                             params), f)
