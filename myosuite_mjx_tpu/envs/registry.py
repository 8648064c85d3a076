"""Task registry: data-driven task specs + variant derivation.

Replaces the reference's gym-registry-as-task-config
(/root/reference/myosuite/envs/myo/myobase/__init__.py) and its
register_env_variant deep-merge (/root/reference/myosuite/envs/
env_variants.py:113-161). ~200 task variants stay maintainable as data:
an entry is (env class, kwargs); variants clone an entry with a deep-merged
kwargs overlay.
"""
from __future__ import annotations

import copy
import os
from typing import Any, Type

_REGISTRY: dict[str, tuple[type, dict]] = {}

ASSET_ROOT = os.environ.get(
    "MYOSUITE_TPU_ASSETS",
    "/root/reference/myosuite")


def asset(relpath: str) -> str:
  return os.path.join(ASSET_ROOT, relpath)


def register(env_id: str, cls: type, kwargs: dict,
             max_episode_steps: int = 100):
  if env_id in _REGISTRY:
    raise ValueError(f"duplicate env id {env_id}")
  kw = dict(kwargs)
  kw.setdefault("horizon", max_episode_steps)
  _REGISTRY[env_id] = (cls, kw)


def registry_ids() -> list[str]:
  return sorted(_REGISTRY)


def deep_update(base: dict, overlay: dict) -> dict:
  out = copy.deepcopy(base)
  for k, v in overlay.items():
    if isinstance(v, dict) and isinstance(out.get(k), dict):
      out[k] = deep_update(out[k], v)
    else:
      out[k] = copy.deepcopy(v)
  return out


def register_env_variant(env_id: str, variant_id: str, variants: dict,
                         silent: bool = True):
  """Clone a registered env with deep-merged kwarg overrides."""
  cls, kwargs = _REGISTRY[env_id]
  register(variant_id, cls, deep_update(kwargs, variants))
  return variant_id


_env_cache: dict[str, Any] = {}


def make(env_id: str, cache: bool = True, **overrides):
  """Instantiate a task env (cached — envs are immutable task objects)."""
  cls, kwargs = _REGISTRY[env_id]
  if overrides or not cache:
    return cls(**deep_update(kwargs, overrides))
  if env_id not in _env_cache:
    _env_cache[env_id] = cls(**kwargs)
  return _env_cache[env_id]
