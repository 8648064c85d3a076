"""Headline benchmark: myoHand env-steps/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star 1M aggregate env-steps/s target from BASELINE.md
(the reference publishes no hardware numbers of its own).

Run: python bench.py [--model finger|hand] [--batch N] [--steps K]
"""
import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel

MODELS = {
    "finger": "/root/reference/myosuite/simhive/myo_sim/finger/"
              "myofinger_v0.xml",
    "hand": "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml",
}

BASELINE_STEPS_PER_S = 1_000_000.0  # BASELINE.md north star (aggregate)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="hand", choices=sorted(MODELS))
  ap.add_argument("--batch", type=int, default=1024)
  ap.add_argument("--steps", type=int, default=100)
  args = ap.parse_args()

  m = emodel.load_model(MODELS[args.model], dtype=np.float32)
  B, K = args.batch, args.steps

  with jax.default_device(jax.local_devices(backend="cpu")[0]):
    d0 = edata.make_data(m, dtype=jnp.float32)

  def rollout(d):
    batch = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d)
    step = jax.vmap(functools.partial(forward.step, m))

    def body(dd, _):
      return step(dd), ()

    with jax.default_matmul_precision("highest"):
      out, _ = jax.lax.scan(body, batch, (), length=K)
    return out

  f = jax.jit(rollout)
  out = f(d0)
  jax.block_until_ready(out.qpos)
  q = np.asarray(out.qpos)
  assert not np.isnan(q).any(), "NaN in benchmark rollout"

  # steady-state: restart from the same d0 (compiled program reuse)
  times = []
  for _ in range(3):
    t0 = time.time()
    out = f(d0)
    jax.block_until_ready(out.qpos)
    times.append(time.time() - t0)
  dt = min(times)
  sps = B * K / dt
  print(json.dumps({
      "metric": f"myo{args.model}_env_steps_per_s",
      "value": round(sps, 1),
      "unit": "env-steps/s/chip",
      "vs_baseline": round(sps / BASELINE_STEPS_PER_S, 4),
  }))


if __name__ == "__main__":
  main()
