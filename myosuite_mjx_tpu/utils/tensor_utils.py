"""Path/rollout tensor helpers + vector math.

Capability parity with the reference's mjrl-derived helpers
(/root/reference/myosuite/utils/tensor_utils.py:6-152) and
``calculate_cosine`` (/root/reference/myosuite/utils/vector_math.py:11-35).

These operate on host-side rollout paths (numpy), except
``calculate_cosine`` which is jnp and safe under jit/vmap (several task
rewards use it).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def calculate_cosine(vec1, vec2):
  """cos(theta) between (batches of) vectors; 0 where either norm is 0."""
  vec1 = jnp.asarray(vec1)
  vec2 = jnp.asarray(vec2)
  norm_product = (jnp.linalg.norm(vec1, axis=-1)
                  * jnp.linalg.norm(vec2, axis=-1))
  dot = jnp.einsum("...i,...i", vec1, vec2)
  return jnp.where(norm_product == 0, 0.0,
                   dot / jnp.where(norm_product == 0, 1.0, norm_product))


def flatten_tensors(tensors):
  if len(tensors) > 0:
    return np.concatenate([np.reshape(x, [-1]) for x in tensors])
  return np.asarray([])


def unflatten_tensors(flattened, tensor_shapes):
  tensor_sizes = list(map(np.prod, tensor_shapes))
  indices = np.cumsum(tensor_sizes)[:-1]
  return [np.reshape(chunk, shape) for chunk, shape in
          zip(np.split(flattened, indices), tensor_shapes)]


def pad_tensor(x, max_len, mode="zero"):
  padding = np.zeros_like(x[0]) if mode == "zero" else x[-1]
  return np.concatenate(
      [x, np.tile(padding, (max_len - len(x),) + (1,) * np.ndim(x[0]))])


def pad_tensor_n(xs, max_len):
  ret = np.zeros((len(xs), max_len) + xs[0].shape[1:], dtype=xs[0].dtype)
  for idx, x in enumerate(xs):
    ret[idx][:len(x)] = x
  return ret


def pad_tensor_dict(tensor_dict, max_len, mode="zero"):
  return {k: (pad_tensor_dict(v, max_len, mode) if isinstance(v, dict)
              else pad_tensor(v, max_len, mode))
          for k, v in tensor_dict.items()}


def stack_tensor_list(tensor_list):
  return np.array(tensor_list)


def stack_tensor_dict_list(tensor_dict_list):
  """List of nested dicts -> nested dict of stacked arrays."""
  keys = list(tensor_dict_list[0].keys())
  ret = {}
  for k in keys:
    example = tensor_dict_list[0][k]
    if isinstance(example, dict):
      ret[k] = stack_tensor_dict_list([d[k] for d in tensor_dict_list])
    else:
      ret[k] = stack_tensor_list([d[k] for d in tensor_dict_list])
  return ret


def concat_tensor_list(tensor_list):
  return np.concatenate(tensor_list, axis=0)


def concat_tensor_dict_list(tensor_dict_list):
  keys = list(tensor_dict_list[0].keys())
  ret = {}
  for k in keys:
    example = tensor_dict_list[0][k]
    if isinstance(example, dict):
      ret[k] = concat_tensor_dict_list([d[k] for d in tensor_dict_list])
    else:
      ret[k] = concat_tensor_list([d[k] for d in tensor_dict_list])
  return ret


def split_tensor_dict_list(tensor_dict):
  """Nested dict of arrays -> list of nested dicts (inverse of stack)."""
  keys = list(tensor_dict.keys())
  ret = None
  for k in keys:
    vals = (split_tensor_dict_list(tensor_dict[k])
            if isinstance(tensor_dict[k], dict) else tensor_dict[k])
    if ret is None:
      ret = [{k: v} for v in vals]
    else:
      for d, v in zip(ret, vals):
        d[k] = v
  return ret


def truncate_tensor_list(tensor_list, truncated_len):
  return tensor_list[:truncated_len]


def truncate_tensor_dict(tensor_dict, truncated_len):
  return {k: (truncate_tensor_dict(v, truncated_len) if isinstance(v, dict)
              else truncate_tensor_list(v, truncated_len))
          for k, v in tensor_dict.items()}
