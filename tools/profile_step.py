"""Per-stage cost breakdown of the physics step on the current device.

Times cumulative prefixes of the forward pipeline (each prefix jitted as one
program, so XLA fusion effects are captured); per-stage cost = difference of
consecutive prefixes. Run:  python tools/profile_step.py [--model hand]
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from myosuite_mjx_tpu.engine import collision
from myosuite_mjx_tpu.engine import constraint
from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import forward
from myosuite_mjx_tpu.engine import model as emodel
from myosuite_mjx_tpu.engine import solver

MODELS = {
    "finger": "/root/reference/myosuite/simhive/myo_sim/finger/"
              "myofinger_v0.xml",
    "hand": "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml",
}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--model", default="hand", choices=sorted(MODELS))
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--steps", type=int, default=20)
  args = ap.parse_args()

  m = emodel.load_model(MODELS[args.model], dtype=np.float32)
  B, K = args.batch, args.steps

  with jax.default_device(jax.local_devices(backend="cpu")[0]):
    d0 = edata.make_data(m, dtype=jnp.float32)
  batch0 = jax.device_put(
      jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0),
      jax.devices()[0])

  def pos(d): return forward.fwd_position(m, d)
  def vel(d): return forward.fwd_velocity(m, d)
  def act(d): return forward.fwd_actuation(m, d)
  def pas(d): return forward.fwd_passive(m, d)
  def acc(d): return forward.fwd_acceleration(m, d)
  def con(d): return solver.fwd_constraint(m, d)
  def integ(d): return forward.euler(m, d)

  stages = [("position", pos), ("velocity", vel), ("actuation", act),
            ("passive", pas), ("acceleration", acc), ("constraint", con),
            ("integrate", integ)]

  # also: collision alone (inside constraint stage)
  def col_only(d):
    blocks, info = collision.contacts(m, d)
    return d.replace(contact=info) if info is not None else d

  def jit1(fn):
    def wrapped(d):
      with jax.default_matmul_precision("highest"):
        return jax.vmap(fn)(d)
    return jax.jit(wrapped)

  # settle into contact-rich state with the full step first
  full = jit1(lambda x: forward.step(m, x))
  st = full(batch0)
  for _ in range(5):
    st = full(st)
  np.asarray(st.qpos)  # force execution (block_until_ready lies here)

  def time_fn(fn, d, k=K, iters=3):
    f = jit1(fn)
    # NB: on the tunneled TPU platform block_until_ready does NOT force
    # execution — only a host transfer does. Materialize a leaf that every
    # prefix actually computes (xpos, written by fwd_position).
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

  # cumulative prefixes
  prev = 0.0
  results = []
  for i in range(len(stages)):
    def prefix(d, i=i):
      for _, fn in stages[:i + 1]:
        d = fn(d)
      return d
    t = time_fn(prefix, st)
    results.append((stages[i][0], t - prev, t))
    prev = t

  print(f"model={args.model} B={B} device={jax.devices()[0]}")
  print(f"{'stage':>14} {'ms/step':>10} {'cum ms':>10} {'us/env':>10}")
  for name, dt, cum in results:
    print(f"{name:>14} {dt*1e3:>10.3f} {cum*1e3:>10.3f} {dt/B*1e6:>10.3f}")
  tot = results[-1][2]
  print(f"TOTAL {tot*1e3:.3f} ms/step -> {B/tot:,.0f} env-steps/s")

  # sub-breakdown of the constraint stage
  def to_acc(d):
    for _, fn in stages[:5]:
      d = fn(d)
    return d
  base = time_fn(to_acc, st)
  t_col = time_fn(lambda d: col_only(to_acc(d)), st) - base
  def efc_only(d):
    d = to_acc(d)
    blocks, info = collision.contacts(m, d)
    efc = constraint.make_efc(m, d, blocks)
    return d.replace(qacc=d.qacc_smooth + efc[0].sum() * 0)
  t_efc = time_fn(efc_only, st) - base - t_col
  print(f"\nconstraint sub-breakdown: collision={t_col*1e3:.3f} ms, "
        f"make_efc={t_efc*1e3:.3f} ms, "
        f"newton={(results[5][1]-t_col-t_efc)*1e3:.3f} ms")


if __name__ == "__main__":
  main()
