"""3CC-r cumulative muscle fatigue, as pure state transition.

Behavior parity with CumulativeFatigue
(/root/reference/myosuite/envs/myo/fatigue.py:6-167): three compartments per
muscle (MA active / MR resting / MF fatigued), transfer rate C(t) from the
muscle activation time constants, recovery boosted by the rest multiplier.
Here the compartments live in the env's aux state (vmap-able), and the
update is branchless.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class FatigueParams:
  F: float = 0.00912           # fatigue coefficient
  R: float = 0.1 * 0.00094     # recovery coefficient
  r: float = 10 * 15           # rest-recovery multiplier


def init_state(na: int, dtype=jnp.float32) -> dict:
  return {
      "MA": jnp.zeros((na,), dtype),
      "MR": jnp.ones((na,), dtype),
      "MF": jnp.zeros((na,), dtype),
  }


def random_state(rng: jax.Array, na: int, dtype=jnp.float32) -> dict:
  k1, k2 = jax.random.split(rng)
  non_fatigued = jax.random.uniform(k1, (na,), dtype)
  active_pct = jax.random.uniform(k2, (na,), dtype)
  return {
      "MA": non_fatigued * active_pct,
      "MR": non_fatigued * (1 - active_pct),
      "MF": 1 - non_fatigued,
  }


def compute_act(state: dict, target_load: jax.Array, tauact: jax.Array,
                taudeact: jax.Array, dt: float,
                p: FatigueParams = FatigueParams()):
  """One fatigue update; returns (effective activation MA, new state)."""
  MA, MR, MF = state["MA"], state["MR"], state["MF"]
  TL = target_load

  LD = (0.5 + 1.5 * MA) / tauact
  LR = (0.5 + 1.5 * MA) / taudeact

  below = MA < TL
  enough_rest = MR > (TL - MA)
  C = jnp.where(
      below,
      jnp.where(enough_rest, LD * (TL - MA), LD * MR),
      LR * (TL - MA))
  rR = jnp.where(MA >= TL, p.r * p.R, p.R)

  C = jnp.clip(
      C,
      jnp.maximum(-MA / dt + p.F * MA, (MR - 1) / dt + rR * MF),
      jnp.minimum((1 - MA) / dt + p.F * MA, MR / dt + rR * MF))

  # simultaneous update: all deltas use the pre-update compartments
  dMA = (C - p.F * MA) * dt
  dMR = (-C + rR * MF) * dt
  dMF = (p.F * MA - rR * MF) * dt
  MA, MR, MF = MA + dMA, MR + dMR, MF + dMF
  return MA, {"MA": MA, "MR": MR, "MF": MF}
