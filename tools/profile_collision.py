"""Per-type-group narrowphase cost on the current device.

Times each collision type-group's narrowphase in isolation (B-batched),
plus the full contacts() assembly. Run after engine changes to see where
collision time goes. Usage: python tools/profile_collision.py [--batch N]
"""
import argparse
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from myosuite_mjx_tpu.engine import collision, forward
from myosuite_mjx_tpu.engine import data as edata
from myosuite_mjx_tpu.engine import model as emodel

HAND = "/root/reference/myosuite/simhive/myo_sim/hand/myohand.xml"
TYPENAMES = {0: "plane", 1: "hfield", 2: "sphere", 3: "capsule",
             4: "ellipsoid", 5: "cylinder", 6: "box", 7: "mesh"}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--model", default=HAND)
  args = ap.parse_args()
  B = args.batch

  m = emodel.load_model(args.model, dtype=np.float32)
  with jax.default_device(jax.local_devices(backend="cpu")[0]):
    d0 = edata.make_data(m, dtype=jnp.float32)
  batch = jax.device_put(
      jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), d0),
      jax.devices()[0])

  # settle into a contact-rich state
  step = jax.jit(jax.vmap(functools.partial(forward.step, m)))
  st = batch
  for _ in range(5):
    st = step(st)
  np.asarray(st.qpos)

  spec = collision._collision_spec(m)

  def time_fn(f, arg, k=20):
    g = jax.jit(jax.vmap(f))
    out = g(arg)
    np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(k):
      out = g(arg)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / k

  for (t1, t2), g in spec.groups:
    def narrow_one(d, t1=t1, t2=t2, g=g):
      if t2 == collision.GeomType.MESH:
        fn = collision._mesh_narrow_fn(m, t1, g["dataid"], d.qpos.dtype)
      elif t1 == collision.GeomType.HFIELD:
        fn = collision._hfield_narrow_fn(m, t2, g["dataid"], d.qpos.dtype,
                                         d.overlay)
      else:
        fn = collision._narrow_fn(t1, t2)
      p1 = d.geom_xpos[g["g1"]]
      m1 = d.geom_xmat[g["g1"]]
      p2 = d.geom_xpos[g["g2"]]
      m2 = d.geom_xmat[g["g2"]]
      s1 = jnp.asarray(m.geom_size[g["g1"]], d.qpos.dtype)
      s2 = jnp.asarray(m.geom_size[g["g2"]], d.qpos.dtype)
      pts = jax.vmap(fn)(p1, m1, s1, p2, m2, s2)
      return pts[0][0]
    dt = time_fn(narrow_one, st)
    name = f"{TYPENAMES[t1]}-{TYPENAMES[t2]}"
    print(f"{name:>22} x{len(g['g1']):>4}: {dt*1e3:8.3f} ms")

  def full(d):
    blocks, info = collision.contacts(m, d)
    return blocks["J"]
  dt = time_fn(full, st)
  print(f"{'contacts() total':>22}      : {dt*1e3:8.3f} ms")


if __name__ == "__main__":
  main()
