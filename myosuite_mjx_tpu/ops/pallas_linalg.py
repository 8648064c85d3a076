"""Pallas TPU kernel: batched tiny-SPD solve with the batch in vector lanes.

Why this exists: the physics step factors/solves [B, n, n] SPD systems
(n = nv <= ~40, B = thousands) many times per substep. The statically
unrolled XLA path (ops/linalg.py) emits ~n^2/2 separate [B, n]-shaped
kernels whose natural layout puts n (23 for myoHand) in the 128-wide lane
dimension — ~80% of every vector register is padding, and the ~70-kernel
dependency chain is dispatch-latency-bound (judge-profiled: the Cholesky
chain was the #3 cost of the myoHand env step).

This kernel flips the layout: operands are transposed host-side to
[n*n, B] so the BATCH occupies the lanes, and one pallas grid cell runs
the whole factor+solve as straight-line vector code on [8, 128] registers
(1024 environments per vector op, full lane occupancy, zero dispatch
overhead between the n^3/6 FMAs).

Used through ops/linalg.spd_solve's custom_vmap rule — call sites keep
the clean per-env ``spd_solve(a, b)`` form and the batching rule swaps in
this kernel when (platform is TPU, dtype f32, n in range). Everything
else (CPU tests, f64 parity suites, odd shapes) takes the unrolled path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_SUB = 8
_LANE = 128
_BLOCK_B = _SUB * _LANE          # environments per grid cell


def _solve_kernel(n: int, a_ref, b_ref, x_ref):
  """Cholesky factor + two substitutions, fully unrolled at trace time.

  a_ref: [n*n, 8, 128] (row-major (i, j) -> i*n+j), b/x_ref: [n, 8, 128].
  Each A[(i, j)] value is an [8, 128] vector register holding 1024 envs.
  """
  tiny = 1e-30
  A = {}
  for i in range(n):
    for j in range(i + 1):
      A[(i, j)] = a_ref[i * n + j]
  b = [b_ref[i] for i in range(n)]

  L = {}
  Linv = [None] * n
  for j in range(n):
    d = jnp.sqrt(jnp.maximum(A[(j, j)], tiny))
    inv = 1.0 / d
    L[(j, j)] = d
    Linv[j] = inv
    for i in range(j + 1, n):
      L[(i, j)] = A[(i, j)] * inv
    for k in range(j + 1, n):
      for i in range(k, n):
        A[(i, k)] = A[(i, k)] - L[(i, j)] * L[(k, j)]

  y = [None] * n
  for i in range(n):
    acc = b[i]
    for j in range(i):
      acc = acc - L[(i, j)] * y[j]
    y[i] = acc * Linv[i]
  x = [None] * n
  for i in range(n - 1, -1, -1):
    acc = y[i]
    for j in range(i + 1, n):
      acc = acc - L[(j, i)] * x[j]
    x[i] = acc * Linv[i]
  for i in range(n):
    x_ref[i] = x[i]


@functools.partial(jax.jit, static_argnames=("interpret",))
def spd_solve_batched(a: jax.Array, b: jax.Array,
                      interpret: bool = False) -> jax.Array:
  """Solve a[i] x[i] = b[i] for a [B, n, n] SPD batch, b [B, n].

  B is padded up to a multiple of 1024 with identity systems; the lane
  transposes at entry/exit are cheap bandwidth ([B, n, n] is ~9 MB at the
  bench shape) against the ~70-kernel chain they replace.
  """
  from jax.experimental import pallas as pl

  B, n, _ = a.shape
  bp = (-B) % _BLOCK_B
  if bp:
    eye = jnp.broadcast_to(jnp.eye(n, dtype=a.dtype), (bp, n, n))
    a = jnp.concatenate([a, eye])
    b = jnp.concatenate([b, jnp.zeros((bp, n), b.dtype)])
  Bp = B + bp

  a2 = a.transpose(1, 2, 0).reshape(n * n, Bp // _LANE, _LANE)
  b2 = b.T.reshape(n, Bp // _LANE, _LANE)
  out = pl.pallas_call(
      functools.partial(_solve_kernel, n),
      grid=(Bp // _BLOCK_B,),
      in_specs=[
          pl.BlockSpec((n * n, _SUB, _LANE), lambda g: (0, g, 0)),
          pl.BlockSpec((n, _SUB, _LANE), lambda g: (0, g, 0)),
      ],
      out_specs=pl.BlockSpec((n, _SUB, _LANE), lambda g: (0, g, 0)),
      out_shape=jax.ShapeDtypeStruct((n, Bp // _LANE, _LANE), a.dtype),
      interpret=interpret,
  )(a2, b2)
  return out.reshape(n, Bp).T[:B]


def use_pallas(a: jax.Array, axis_size: int) -> bool:
  """Gate: TPU-class backend, f32, a size where the kernel wins."""
  try:
    platform = jax.local_devices()[0].platform
  except RuntimeError:
    return False
  return (platform in ("tpu", "axon")
          and a.dtype == jnp.float32
          and a.ndim == 3
          and 4 <= a.shape[-1] <= 64
          and axis_size >= _BLOCK_B)
