"""Newton-solver convergence study on contact-rich flagship states.

Drives a B-env myoHandObjHold-style grasp rollout, records per-env
iterations-to-convergence at the model-requested tolerance (opt.tolerance,
MuJoCo-scaled), and prints the distribution. This is the evidence behind
the production iteration cap (docs/solver_convergence.md): under vmap a
while_loop runs to the max over the batch, so the cap is set at the
measured p100 of converged iterations rather than the model's generous 100.

Run: python tools/convergence_study.py [--batch 1024] [--steps 30]
"""
import argparse
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from myosuite_mjx_tpu.engine import collision, constraint, forward, solver
from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import model as emodel

HAND = "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml"


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=1024)
  ap.add_argument("--steps", type=int, default=30)
  ap.add_argument("--model", default=HAND)
  ap.add_argument("--env", default=None,
                  help="take the scene from a registered env id instead "
                       "(e.g. myoHandObjHoldFixed-v0)")
  args = ap.parse_args()

  if args.env:
    from myosuite_mjx_tpu import envs as envs_mod
    m = emodel.load_model(
        envs_mod.make(args.env).model_path, dtype=np.float32)
  else:
    m = emodel.load_model(args.model, dtype=np.float32)
  B = args.batch
  with jax.default_device(jax.local_devices(backend="cpu")[0]):
    d0 = edata.make_data(m, dtype=jnp.float32)
  batch = jax.device_put(
      jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0),
      jax.devices()[0])
  # diverse ctrl per env to reach varied contact states
  keys = jax.random.split(jax.random.PRNGKey(0), B)
  ctrl = jax.vmap(lambda k: jax.random.uniform(k, (m.nu,)))(keys)
  batch = batch.replace(ctrl=ctrl)

  def step_with_iters(d):
    with jax.default_matmul_precision("highest"):
      d = forward.fwd_position(m, d)
      d = forward.fwd_velocity(m, d)
      d = forward.fwd_actuation(m, d)
      d = forward.fwd_passive(m, d)
      d = forward.fwd_acceleration(m, d)
      blocks, info = collision.contacts(m, d)
      efc = constraint.make_efc(m, d, blocks)
      J, aref, D, is_eq, _pos, _meta = efc
      qacc, force, niter = solver._newton_solve(
          m, d, J, aref, D, is_eq,
          int(m.opt.solver_iterations), int(m.opt.ls_iterations))
      d = d.replace(qfrc_constraint=J.T @ force, qacc=qacc,
                    qacc_warmstart=qacc)
      return forward.euler(m, d), niter

  step = jax.jit(jax.vmap(step_with_iters))
  cur = batch
  all_iters = []
  for t in range(args.steps):
    cur, niter = step(cur)
    all_iters.append(np.asarray(niter))
  it = np.stack(all_iters)  # [steps, B]
  print(f"B={B} steps={args.steps} cap={m.opt.solver_iterations}")
  print(f"overall: p50={np.percentile(it,50):.0f} p90={np.percentile(it,90):.0f} "
        f"p99={np.percentile(it,99):.0f} p99.9={np.percentile(it,99.9):.0f} "
        f"max={it.max()}")
  print("per-step max:", it.max(axis=1)[:20].tolist())
  print("per-step p99:", np.percentile(it, 99, axis=1)[:20].round(1).tolist())
  # first steps are cold (no warmstart); steady state after ~5
  ss = it[5:]
  print(f"steady-state (step>=5): p99={np.percentile(ss,99):.0f} "
        f"p99.9={np.percentile(ss,99.9):.0f} max={ss.max()}")


if __name__ == "__main__":
  main()
