"""Offline path (rollout dataset) evaluation utilities.

Capability parity with the reference's dataset-scoring surface —
``compute_path_rewards`` / ``truncate_paths`` / ``evaluate_success``
(/root/reference/myosuite/envs/env_base.py:709-770) and the paths-file
tooling in utils/paths_utils.py — over this repo's batched envs: a "path"
is a dict with (at least) ``observations`` [T, obs_dim] (or [N, T, obs]),
``actions``, and optionally ``env_infos`` sub-dicts, exactly the layout
logger.trace produces.
"""
from __future__ import annotations

import types

import jax
import numpy as np


def obs_layout(env) -> dict:
  """Static key -> (start, stop) slices of the env's obs vector
  (ObsVecDict.initialize equivalent, obs_vec_dict.py:56-71)."""
  st = jax.eval_shape(env.reset, jax.random.PRNGKey(0))
  od = jax.eval_shape(
      lambda d, a: env.get_obs_dict(d, a), st.data, st.aux)
  layout = {}
  off = 0
  for k in env.obs_keys:
    n = int(np.prod(od[k].shape))
    layout[k] = (off, off + n)
    off += n
  return layout


def obsvec2obsdict(env, obsvec: np.ndarray) -> dict:
  """Invert the env's obs codec over a [..., obs_dim] array
  (obs_vec_dict.py:101-111 equivalent)."""
  layout = obs_layout(env)
  return {k: obsvec[..., a:b] for k, (a, b) in layout.items()}


def compute_path_rewards(env, paths: dict, rwd_mode: str = "dense") -> dict:
  """Vectorized re-scoring of offline observations (env_base.py:709-726).

  paths["observations"]: [num_traj, horizon, obs_dim] (or [horizon, obs]).
  Adds time-aligned paths["rewards"] and paths["done"] (the reference's
  done[..., :-1] = done[..., 1:] shift is kept so returns match).
  """
  obs = np.asarray(paths["observations"])
  obs_dict = obsvec2obsdict(env, obs)
  # squeeze singleton key dims the codec flattened
  tvals = obs_dict.get("time", np.zeros(obs.shape[:-1] + (1,)))
  data = types.SimpleNamespace(time=tvals[..., 0])
  aux = paths.get("aux", {})
  rwd = env.get_reward_dict(
      {k: np.asarray(v) for k, v in obs_dict.items()}, data, aux)
  if rwd_mode == "sparse":
    rewards = np.asarray(rwd["sparse"])
  else:
    rewards = np.asarray(sum(
        wt * np.asarray(rwd[key]) for key, wt in env.rwd_keys_wt.items()))
  done = np.array(np.asarray(rwd["done"]), dtype=bool)
  # time-align: reward/done at index t describe the transition INTO t+1
  rewards = np.array(rewards)
  done[..., :-1] = done[..., 1:]
  rewards[..., :-1] = rewards[..., 1:]
  paths["done"] = done if done.ndim > 1 and done.shape[0] > 1 \
      else done.ravel()
  paths["rewards"] = rewards if rewards.ndim > 1 and rewards.shape[0] > 1 \
      else rewards.ravel()
  return paths


def truncate_paths(paths: list) -> list:
  """Cut each path at its first done (env_base.py:728-742 semantics)."""
  for path in paths:
    done = np.asarray(path["done"], dtype=bool)
    if not done[-1]:
      path["terminated"] = False
    elif not done[0]:
      terminated_idx = int(np.sum(~done)) + 1
      for key in list(path.keys()):
        v = path[key]
        if isinstance(v, np.ndarray) and v.ndim >= 1 and \
            v.shape[0] >= terminated_idx + 1:
          path[key] = v[: terminated_idx + 1, ...]
      path["terminated"] = True
  return paths


def evaluate_success(paths: list, logger=None,
                     successful_steps: int = 5, horizon: int | None = None):
  """Success %% over paths: solved for > successful_steps steps
  (env_base.py:744-770)."""
  num_success = 0
  for path in paths:
    solved = np.asarray(path["env_infos"]["solved"], dtype=np.float64)
    if solved.sum() > successful_steps:
      num_success += 1
  success_percentage = num_success * 100.0 / max(len(paths), 1)
  if logger is not None:
    rwd_sparse = float(np.mean(
        [np.mean(p["env_infos"]["rwd_sparse"]) for p in paths]))
    hor = horizon or max(len(p["env_infos"]["rwd_dense"]) for p in paths)
    rwd_dense = float(np.mean(
        [np.sum(p["env_infos"]["rwd_dense"]) / hor for p in paths]))
    logger.log_kv("rwd_sparse", rwd_sparse)
    logger.log_kv("rwd_dense", rwd_dense)
    logger.log_kv("success_percentage", success_percentage)
  return success_percentage


def paths2dataset(paths: list) -> dict:
  """Stack a list of equal-length paths into one batched dataset dict
  (tensor_utils/paths_utils stacking surface)."""
  keys = paths[0].keys()
  out = {}
  for k in keys:
    v0 = paths[0][k]
    if isinstance(v0, dict):
      out[k] = {kk: np.stack([np.asarray(p[k][kk]) for p in paths])
                for kk in v0}
    elif isinstance(v0, np.ndarray) or np.isscalar(v0):
      out[k] = np.stack([np.asarray(p[k]) for p in paths])
  return out
