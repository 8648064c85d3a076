"""Asset fetch tool: make the framework self-contained.

Replaces the reference's ``myosuite_init.py`` console surface
(/root/reference/myosuite_init.py:13-78): fetch the pinned model assets
(simhive / myo_model), point the registry at them, and clean the cache.
Three acquisition modes, tried in order:

1. ``$MYOSUITE_TPU_ASSETS`` already points at a usable tree -> no-op.
2. ``--from-local <dir>`` copies/links an existing MyoSuite checkout's
   asset tree (the offline path used in the build sandbox).
3. git clone of the pinned upstream repos (requires network + git).

Usage:
  python -m myosuite_mjx_tpu.init_assets [--dest DIR] [--from-local DIR]
  python -m myosuite_mjx_tpu.init_assets --clean
"""
from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

DEFAULT_DEST = os.path.join(os.path.expanduser("~"), ".myosuite_tpu")

# pinned upstreams (reference myosuite_init.py fetch set)
SIMHIVE_REPOS = {
    "myo_sim": ("https://github.com/MyoHub/myo_sim.git", "main"),
    "myo_model": ("https://github.com/myolab/myo_model.git", "main"),
}

# the asset subtrees the registry consumes (relative to the asset root)
REQUIRED = ("simhive/myo_sim", "envs/myo/assets")


def asset_root_ok(root: str) -> bool:
  return all(os.path.exists(os.path.join(root, r)) for r in REQUIRED)


def fetch_from_local(src: str, dest: str) -> str:
  """Link a local MyoSuite checkout's asset tree into dest."""
  if not asset_root_ok(src):
    raise SystemExit(
        f"{src} does not look like a MyoSuite tree (missing {REQUIRED})")
  os.makedirs(dest, exist_ok=True)
  for rel in REQUIRED:
    s = os.path.join(src, rel)
    d = os.path.join(dest, rel)
    os.makedirs(os.path.dirname(d), exist_ok=True)
    if not os.path.exists(d):
      os.symlink(s, d)
  # myodm reference-motion clips
  for rel in ("envs/myo/myodm/data",):
    s, d = os.path.join(src, rel), os.path.join(dest, rel)
    if os.path.exists(s) and not os.path.exists(d):
      os.makedirs(os.path.dirname(d), exist_ok=True)
      os.symlink(s, d)
  return dest


def fetch_from_git(dest: str) -> str:
  """Clone the pinned upstream asset repos (network required)."""
  simhive = os.path.join(dest, "simhive")
  os.makedirs(simhive, exist_ok=True)
  for name, (url, ref) in SIMHIVE_REPOS.items():
    clone = os.path.join(simhive, name)
    if os.path.exists(os.path.join(clone, ".git")):
      continue
    try:
      subprocess.run(["git", "clone", "--depth", "1", "-b", ref, url,
                      clone], check=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
      raise SystemExit(
          f"git clone of {url} failed ({e}); use --from-local with an "
          "existing MyoSuite checkout instead") from e
  return dest


def clean(dest: str):
  if os.path.exists(dest):
    shutil.rmtree(dest)
    print(f"removed {dest}")
  else:
    print(f"nothing to clean at {dest}")


def main(argv=None):
  ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
  ap.add_argument("--dest", default=DEFAULT_DEST)
  ap.add_argument("--from-local", default=None,
                  help="existing MyoSuite checkout to link assets from")
  ap.add_argument("--clean", action="store_true")
  args = ap.parse_args(argv)

  if args.clean:
    clean(args.dest)
    return

  env_root = os.environ.get("MYOSUITE_TPU_ASSETS")
  if env_root and asset_root_ok(env_root):
    print(f"assets already available at $MYOSUITE_TPU_ASSETS={env_root}")
    return
  if asset_root_ok(args.dest):
    print(f"assets already fetched at {args.dest}")
  elif args.from_local:
    fetch_from_local(args.from_local, args.dest)
    print(f"assets linked from {args.from_local} at {args.dest}")
  else:
    fetch_from_git(args.dest)
    print(f"assets cloned at {args.dest}")
  print(f"export MYOSUITE_TPU_ASSETS={args.dest}")


if __name__ == "__main__":
  main(sys.argv[1:])
