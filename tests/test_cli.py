"""Train-CLI smoke (reference pattern: tests/test_sb.py SB3 learn(2))."""
import json
import os
import subprocess
import sys


def test_cli_ppo_smoke(tmp_path):
  env = dict(os.environ, JAX_PLATFORMS="cpu")
  out = subprocess.run(
      [sys.executable, "-m", "myosuite_mjx_tpu.train.cli",
       "--env", "myoFingerPoseFixed-v0", "--algo", "ppo",
       "--total-steps", "400", "--num-envs", "4", "--log-every", "1",
       "--checkpoint-dir", str(tmp_path), "--checkpoint-every", "1"],
      capture_output=True, text=True, env=env, cwd="/root/repo",
      timeout=560)
  assert out.returncode == 0, out.stderr[-2000:]
  lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
  rec = json.loads(lines[-1])
  assert rec["env_steps"] >= 200 and "loss" in rec
  assert any(p.startswith("iter_") for p in os.listdir(tmp_path))
