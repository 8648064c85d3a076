"""Constraint solve: limits, friction loss, contacts.

Starts as a pass-through (qacc = qacc_smooth); the Newton solver matching the
reference's settings (mjSOL_NEWTON, iterations=100, ls_iterations=50,
/root/reference/myosuite/mjx/myodm_v0.py:38-41) lands here.
"""
from __future__ import annotations

import jax.numpy as jnp

from myosuite_mjx_tpu.engine.data import Data
from myosuite_mjx_tpu.engine.model import Model


def fwd_constraint(m: Model, d: Data) -> Data:
  """Solve for constraint forces; currently smooth-only placeholder."""
  return d.replace(
      qfrc_constraint=jnp.zeros_like(d.qfrc_smooth),
      qacc=d.qacc_smooth)
