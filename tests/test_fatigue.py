"""Parity: 3CC-r fatigue model vs the reference implementation."""
import numpy as np
import pytest

from myosuite_mjx_tpu.envs import fatigue


def reference_step(MA, MR, MF, TL, tauact, taudeact, dt,
                   F=0.00912, R=0.1 * 0.00094, r=150):
  """Direct NumPy transcription of the reference update semantics
  (/root/reference/myosuite/envs/myo/fatigue.py:61-108) as the oracle."""
  LD = 1 / tauact * (0.5 + 1.5 * MA)
  LR = (0.5 + 1.5 * MA) / taudeact
  C = np.zeros_like(MA)
  i1 = (MA < TL) & (MR > (TL - MA))
  C[i1] = LD[i1] * (TL[i1] - MA[i1])
  i2 = (MA < TL) & (MR <= (TL - MA))
  C[i2] = LD[i2] * MR[i2]
  i3 = MA >= TL
  C[i3] = LR[i3] * (TL[i3] - MA[i3])
  rR = np.where(MA >= TL, r * R, R)
  C = np.clip(C,
              np.maximum(-MA / dt + F * MA, (MR - 1) / dt + rR * MF),
              np.minimum((1 - MA) / dt + F * MA, MR / dt + rR * MF))
  dMA = (C - F * MA) * dt
  dMR = (-C + rR * MF) * dt
  dMF = (F * MA - rR * MF) * dt
  return MA + dMA, MR + dMR, MF + dMF


def test_fatigue_matches_reference_semantics():
  rng = np.random.default_rng(0)
  na = 7
  tauact = np.full(na, 0.01)
  taudeact = np.full(na, 0.04)
  dt = 0.02
  MA, MR, MF = np.zeros(na), np.ones(na), np.zeros(na)
  state = {"MA": MA.copy(), "MR": MR.copy(), "MF": MF.copy()}
  import jax.numpy as jnp
  for t in range(200):
    TL = rng.uniform(0, 1, na)
    MA, MR, MF = reference_step(MA, MR, MF, TL, tauact, taudeact, dt)
    eff, state = fatigue.compute_act(
        state, jnp.asarray(TL), jnp.asarray(tauact), jnp.asarray(taudeact),
        dt)
    np.testing.assert_allclose(np.asarray(state["MA"]), MA, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state["MR"]), MR, atol=1e-9)
    np.testing.assert_allclose(np.asarray(state["MF"]), MF, atol=1e-9)
    np.testing.assert_allclose(np.asarray(eff), MA, atol=1e-9)
