"""Parity: muscle FLV curves + activation dynamics vs mju_* oracles."""
import mujoco
import numpy as np

from myosuite_mjx_tpu.engine import muscle


def grids():
  rng = np.random.default_rng(0)
  lengths = np.concatenate([
      np.linspace(0.1, 0.35, 21),
      rng.uniform(0.05, 0.4, 32)])
  vels = np.concatenate([
      np.linspace(-0.8, 0.8, 13),
      rng.uniform(-1.0, 1.0, 16)])
  return lengths, vels


# myoFinger's muscle params (lmin=0.5, fvmax=1, fpmax=50) plus MuJoCo
# defaults and a positive-force variant
PRMS = [
    np.array([0.75, 1.05, -1.0, 1e4, 0.5, 1.6, 1.5, 50.0, 1.0]),
    np.array([0.75, 1.05, -1.0, 200.0, 0.5, 1.6, 1.5, 1.3, 1.2]),
    np.array([0.6, 1.2, 350.0, 200.0, 0.4, 1.8, 2.0, 1.3, 1.5]),
]
LR = np.array([0.17958188, 0.24778364])
ACC0 = 2.22498473


def test_muscle_gain_matches_mujoco():
  lengths, vels = grids()
  for prm in PRMS:
    for ln in lengths:
      for v in vels:
        want = mujoco.mju_muscleGain(ln, v, LR, ACC0, prm)
        got = float(muscle.muscle_gain(
            np.float64(ln), np.float64(v), LR, np.float64(ACC0), prm))
        np.testing.assert_allclose(got, want, atol=1e-10,
                                   err_msg=f"len={ln} vel={v} prm={prm}")


def test_muscle_bias_matches_mujoco():
  lengths, _ = grids()
  for prm in PRMS:
    for ln in lengths:
      want = mujoco.mju_muscleBias(ln, LR, ACC0, prm)
      got = float(muscle.muscle_bias(
          np.float64(ln), LR, np.float64(ACC0), prm))
      np.testing.assert_allclose(got, want, atol=1e-10,
                                 err_msg=f"len={ln} prm={prm}")


def test_muscle_dynamics_matches_mujoco():
  rng = np.random.default_rng(1)
  ctrls = np.concatenate([np.linspace(-0.2, 1.2, 15), rng.uniform(0, 1, 16)])
  acts = np.concatenate([np.linspace(-0.1, 1.1, 13), rng.uniform(0, 1, 16)])
  for dynprm in [np.array([0.01, 0.04, 0.0]),
                 np.array([0.01, 0.04, 0.1]),
                 np.array([0.02, 0.08, 0.5])]:
    for c in ctrls:
      for a in acts:
        want = mujoco.mju_muscleDynamics(c, a, dynprm)
        got = float(muscle.muscle_dynamics(
            np.float64(c), np.float64(a), dynprm))
        np.testing.assert_allclose(got, want, atol=1e-10,
                                   err_msg=f"ctrl={c} act={a} prm={dynprm}")


def test_batched_matches_scalar():
  lengths, vels = grids()
  n = min(len(lengths), len(vels))
  prm = np.tile(PRMS[0], (n, 1))
  lr = np.tile(LR, (n, 1))
  acc0 = np.full(n, ACC0)
  batched = np.asarray(muscle.muscle_gain(
      lengths[:n], vels[:n], lr, acc0, prm))
  single = np.array([
      float(muscle.muscle_gain(lengths[i], vels[i], LR, ACC0, PRMS[0]))
      for i in range(n)])
  np.testing.assert_allclose(batched, single, atol=1e-12)
