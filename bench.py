"""Headline benchmark: myoHand env-steps/s on one chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline = the north-star 1M aggregate env-steps/s target from BASELINE.md
(the reference publishes no hardware numbers of its own).

Methodology: one jitted vmapped physics step, dependency-chained K times
(state feeds state, so all K executions are serialized on-device); wall
clock over the chain / (B*K). A lax.scan wrapper would measure the same
thing but costs >10 min of XLA compile on the 39-muscle hand graph, so
the chain keeps compile ~1-2 min and the driver inside its budget.

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


def breakdown(m, batch0, B, K=10):
  """Per-stage cost table (cumulative-prefix timing; fusion-aware)."""
  from myosuite_mjx_tpu.engine import collision
  from myosuite_mjx_tpu.engine import constraint
  from myosuite_mjx_tpu.engine import solver

  def jit1(fn):
    def wrapped(d):
      with jax.default_matmul_precision("highest"):
        return jax.vmap(fn)(d)
    return jax.jit(wrapped)

  stages = [
      ("position", lambda d: forward.fwd_position(m, d)),
      ("velocity", lambda d: forward.fwd_velocity(m, d)),
      ("actuation", lambda d: forward.fwd_actuation(m, d)),
      ("passive", lambda d: forward.fwd_passive(m, d)),
      ("acceleration", lambda d: forward.fwd_acceleration(m, d)),
      ("constraint", lambda d: solver.fwd_constraint(m, d)),
      ("integrate", lambda d: forward.euler(m, d)),
  ]

  full = jit1(lambda d: forward.step(m, d))
  st = full(batch0)
  for _ in range(5):
    st = full(st)
  np.asarray(st.qpos)  # force execution (block_until_ready lies on axon)

  def time_fn(fn, d, k=K, iters=2):
    f = jit1(fn)
    out = f(d)
    np.asarray(out.xpos)
    ts = []
    for _ in range(iters):
      t0 = time.time()
      out = d
      for _ in range(k):
        out = f(out)
      np.asarray(out.xpos)
      ts.append(time.time() - t0)
    return min(ts) / k

  prev = 0.0
  print(f"{'stage':>14} {'ms/step':>10} {'cum ms':>10}", file=sys.stderr)
  for i in range(len(stages)):
    def prefix(d, i=i):
      for _, fn in stages[:i + 1]:
        d = fn(d)
      return d
    t = time_fn(prefix, st)
    print(f"{stages[i][0]:>14} {(t - prev)*1e3:>10.3f} {t*1e3:>10.3f}",
          file=sys.stderr)
    prev = t

  def to_acc(d):
    for _, fn in stages[:5]:
      d = fn(d)
    return d
  base = time_fn(to_acc, st)
  def col_only(d):
    d = to_acc(d)
    blocks, info = collision.contacts(m, d)
    return d.replace(contact=info) if info is not None else d
  t_col = time_fn(col_only, st) - base
  print(f"{'(collision)':>14} {t_col*1e3:>10.3f}", file=sys.stderr)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="hand", choices=sorted(MODELS))
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--steps", type=int, default=100)
  ap.add_argument("--breakdown", action="store_true",
                  help="print a per-stage cost table to stderr, then exit")
  args = ap.parse_args()

  m = emodel.load_model(MODELS[args.model], dtype=np.float32)
  B, K = args.batch, args.steps

  with jax.default_device(jax.local_devices(backend="cpu")[0]):
    d0 = edata.make_data(m, dtype=jnp.float32)
  batch0 = jax.device_put(
      jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0),
      jax.devices()[0])

  if args.breakdown:
    breakdown(m, batch0, B, K=min(args.steps, 10))
    return

  # f32 matmul precision: the Newton/implicit-damping dense solves NaN at
  # the TPU MXU's default bf16 pass precision
  vstep = jax.vmap(functools.partial(forward.step, m))

  def _step(d):
    with jax.default_matmul_precision("highest"):
      return vstep(d)

  step = jax.jit(_step)

  # compile + settle into contact-rich steady state.
  # NB: synchronize via host materialization (np.asarray), NOT
  # block_until_ready — on the tunneled TPU platform block_until_ready
  # does not force execution of the dispatch queue.
  out = step(batch0)
  for _ in range(5):
    out = step(out)
  assert not np.isnan(np.asarray(out.qpos)).any(), "NaN in warmup rollout"

  # timed: K dependency-chained steps (state feeds state)
  times = []
  for _ in range(3):
    t0 = time.time()
    cur = out
    for _ in range(K):
      cur = step(cur)
    np.asarray(cur.qpos)
    times.append(time.time() - t0)
  assert not np.isnan(np.asarray(cur.qpos)).any(), "NaN in benchmark rollout"
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
