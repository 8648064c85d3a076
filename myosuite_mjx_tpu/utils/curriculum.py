"""Success-driven curriculum schedule.

Capability parity with the reference's curriculum
(/root/reference/myosuite/utils/curriculum_utils.py:1-43): an EMA progress
filter plus a value that ramps from ``start`` to ``end`` at ``rate``
whenever both the instantaneous success and the filtered progress exceed
``threshold``.

Two forms:
  * ``CurriculumState`` + ``update``/``status`` -- pure functions over a
    tiny pytree, usable *inside* a jitted training loop (the reference's
    class is host-side Python and can't live under jit);
  * ``Curriculum`` -- a stateful host-side wrapper matching the
    reference's class API for driver scripts.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CurriculumState(NamedTuple):
  value: jnp.ndarray     # scalar: current curriculum progress in [0, 1+rate]
  progress: jnp.ndarray  # scalar: EMA of success


def init(dtype=jnp.float32) -> CurriculumState:
  return CurriculumState(jnp.zeros((), dtype), jnp.zeros((), dtype))


def update(state: CurriculumState, current_success,
           threshold: float = 90.0, rate: float = 0.01,
           filter_coef: float = 0.95) -> CurriculumState:
  """One curriculum update (curriculum_utils.py:27-38), branchless."""
  progress = state.progress * filter_coef + current_success * (
      1.0 - filter_coef)
  bump = ((state.value <= 1.0)
          & (current_success >= threshold)
          & (progress >= threshold))
  value = state.value + jnp.where(bump, rate, 0.0)
  return CurriculumState(value, progress)


def status(state: CurriculumState, start: float = 0.0,
           end: float = 1.0):
  """Current curriculum setting (curriculum_utils.py:41-43)."""
  return start + state.value * (end - start)


class Curriculum:
  """Host-side stateful wrapper mirroring the reference class API."""

  def __init__(self, threshold=90.0, rate=1.0 / 100.0, start=0.0, end=1.0,
               filter_coef=0.95):
    assert rate > 0, "rate should always be positive"
    self._threshold = threshold
    self._rate = rate
    self._start = start
    self._end = end
    self._filter_coef = filter_coef
    self._state = init(jnp.float64 if jnp.zeros(()).dtype ==
                       jnp.float64 else jnp.float32)

  def update(self, current_success):
    self._state = update(self._state, current_success,
                         threshold=self._threshold, rate=self._rate,
                         filter_coef=self._filter_coef)

  def status(self):
    return float(status(self._state, self._start, self._end))
