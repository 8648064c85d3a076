"""Statically-unrolled dense linear algebra for tiny SPD systems.

XLA's generic batched Cholesky/triangular-solve lower to blocked while
loops with dynamic slicing — measured ~20 ms per [4096, 23, 23] factor on
TPU v5e, which made them the single most expensive primitive in the physics
step. Myo models have nv <= ~40 and the size is static, so a Python-unrolled
right-looking Cholesky (depth-n chain of rank-1 updates) and unrolled
forward/back substitution compile to straight-line fused code that is an
order of magnitude faster at these sizes.

All functions operate on a single matrix/vector; batch with vmap.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_factor(a: jax.Array) -> jax.Array:
  """Lower-triangular Cholesky factor of a static-size SPD matrix [n, n]."""
  n = a.shape[-1]
  if n == 0:
    return a
  dtype = a.dtype
  tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
  idx = jnp.arange(n)
  resid = a
  cols = []
  for j in range(n):
    d = jnp.sqrt(jnp.maximum(resid[j, j], tiny))
    col = jnp.where(idx >= j, resid[:, j] / d, 0.0).astype(dtype)
    resid = resid - col[:, None] * col[None, :]
    cols.append(col)
  return jnp.stack(cols, axis=1)


def solve_lower(L: jax.Array, b: jax.Array) -> jax.Array:
  """Solve L y = b for lower-triangular L [n, n], b [n]."""
  n = L.shape[-1]
  if n == 0:
    return b
  idx = jnp.arange(n)
  resid = b
  ys = []
  for i in range(n):
    yi = resid[i] / L[i, i]
    resid = resid - yi * jnp.where(idx > i, L[:, i], 0.0).astype(b.dtype)
    ys.append(yi)
  return jnp.stack(ys)


def solve_upper_t(L: jax.Array, y: jax.Array) -> jax.Array:
  """Solve L^T x = y for lower-triangular L [n, n], y [n]."""
  n = L.shape[-1]
  if n == 0:
    return y
  idx = jnp.arange(n)
  resid = y
  xs = [None] * n
  for i in range(n - 1, -1, -1):
    xi = resid[i] / L[i, i]
    resid = resid - xi * jnp.where(idx < i, L[i, :], 0.0).astype(y.dtype)
    xs[i] = xi
  return jnp.stack(xs)


def cho_solve(L: jax.Array, b: jax.Array) -> jax.Array:
  """Solve A x = b given the Cholesky factor L of A. b: [n] or [n, k]."""
  if b.ndim == 1:
    return solve_upper_t(L, solve_lower(L, b))
  cols = [solve_upper_t(L, solve_lower(L, b[:, k]))
          for k in range(b.shape[1])]
  return jnp.stack(cols, axis=1)


from jax import custom_batching


@custom_batching.custom_vmap
def spd_solve(a: jax.Array, b: jax.Array) -> jax.Array:
  """Solve the SPD system a x = b (factor + two substitutions).

  Under vmap on a TPU-class backend (f32, n <= 64, batch >= 1024) the
  batching rule dispatches to the lane-packed pallas kernel
  (ops/pallas_linalg.py) — one kernel for the whole batch instead of a
  ~70-op unrolled chain per solve. All other configurations (CPU test
  runs, f64 parity suites, small batches, double vmap) keep the unrolled
  path, which is bit-stable with previous rounds.
  """
  return cho_solve(chol_factor(a), b)


@spd_solve.def_vmap
def _spd_solve_vmap(axis_size, in_batched, a, b):
  a_b, b_b = in_batched
  if not a_b:
    a = jnp.broadcast_to(a, (axis_size,) + a.shape)
  if not b_b:
    b = jnp.broadcast_to(b, (axis_size,) + b.shape)
  from myosuite_mjx_tpu.ops import pallas_linalg
  if pallas_linalg.use_pallas(a, axis_size) and b.ndim == 2:
    return pallas_linalg.spd_solve_batched(a, b), True
  out = jax.vmap(lambda ai, bi: cho_solve(chol_factor(ai), bi))(a, b)
  return out, True
