"""Parity: spatial tendon lengths + moment arms vs CPU MuJoCo on myoFinger.

myoFinger's five tendons exercise sphere wraps, cylinder wraps with side
sites, and pulley branches (finger_v0.xml tendon section).
"""
import mujoco
import numpy as np
import pytest

from myosuite_mjx_tpu.engine import model as emodel
from myosuite_mjx_tpu.engine import smooth, tendon

MYOFINGER = "/root/reference/myosuite/simhive/myo_sim/finger/myofinger_v0.xml"


@pytest.fixture(scope="module")
def fx():
  mj = emodel.load_mj_model(MYOFINGER)
  mj.opt.jacobian = mujoco.mjtJacobian.mjJAC_DENSE  # dense ten_J oracle
  m = emodel.from_mj(mj)
  d = mujoco.MjData(mj)
  return mj, m, d


def compute(m, qpos):
  kin = smooth.kinematics(
      m, qpos, np.zeros((m.nmocap, 3)),
      np.tile([1.0, 0, 0, 0], (m.nmocap, 1)))
  _, _, cdof = smooth.com_pos(m, kin)
  ten_len, ten_j = tendon.tendon(m, kin, cdof)
  ten_len = ten_len + tendon.fixed_tendon_length(m, qpos)
  return np.asarray(ten_len), np.asarray(ten_j)


def test_tendon_parity_random_qpos(fx):
  mj, m, d = fx
  rng = np.random.default_rng(0)
  for trial in range(20):
    qpos = np.array([
        rng.uniform(lo, hi) for lo, hi in mj.jnt_range])
    d.qpos[:] = qpos
    mujoco.mj_forward(mj, d)
    ten_len, ten_j = compute(m, qpos)
    np.testing.assert_allclose(
        ten_len, d.ten_length, atol=1e-9,
        err_msg=f"trial {trial} qpos={qpos}")
    # moment-arm oracle: central differences of MuJoCo's ten_length
    # (this MuJoCo build only exposes ten_J in sparse form)
    eps = 1e-7
    want_j = np.zeros((mj.ntendon, mj.nv))
    for k in range(mj.nv):
      d.qpos[:] = qpos; d.qpos[k] += eps
      mujoco.mj_forward(mj, d)
      lp = d.ten_length.copy()
      d.qpos[:] = qpos; d.qpos[k] -= eps
      mujoco.mj_forward(mj, d)
      lm = d.ten_length.copy()
      want_j[:, k] = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(
        ten_j, want_j, atol=1e-5,
        err_msg=f"trial {trial} qpos={qpos}")


def test_tendon_jacobian_matches_fd(fx):
  """ten_J == d ten_length / d qpos by central differences (self-check)."""
  mj, m, d = fx
  rng = np.random.default_rng(1)
  qpos = np.array([rng.uniform(lo, hi) for lo, hi in mj.jnt_range])
  _, ten_j = compute(m, qpos)
  eps = 1e-6
  for k in range(m.nv):
    qp = qpos.copy(); qp[k] += eps
    qm = qpos.copy(); qm[k] -= eps
    lp, _ = compute(m, qp)
    lm, _ = compute(m, qm)
    fd = (lp - lm) / (2 * eps)
    np.testing.assert_allclose(ten_j[:, k], fd, atol=1e-5)
