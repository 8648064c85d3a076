"""Sweep-launcher smoke: env x seed fan-out with per-run artifact dirs
(reference capability: agents/train_myosuite.sh env-list sweep)."""
import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow  # two subprocess trainings; compile-heavy on cold CPU
def test_sweep_two_seeds(tmp_path):
  env = dict(os.environ, JAX_PLATFORMS="cpu")
  out = subprocess.run(
      [sys.executable, "-m", "myosuite_mjx_tpu.train.sweep",
       "--envs", "myoFingerPoseFixed-v0", "--seeds", "0,1",
       "--out", str(tmp_path), "--",
       "--total-steps", "400", "--num-envs", "4", "--log-every", "1"],
      capture_output=True, text=True, env=env, cwd="/root/repo",
      timeout=560)
  assert out.returncode == 0, out.stderr[-2000:]
  summary = json.load(open(tmp_path / "summary.json"))
  assert [r["status"] for r in summary] == ["ok", "ok"]
  for r in summary:
    d = r["dir"]
    assert os.path.exists(os.path.join(d, "metrics.jsonl")), d
    assert any(p.startswith("iter_")
               for p in os.listdir(os.path.join(d, "ckpt"))), d
