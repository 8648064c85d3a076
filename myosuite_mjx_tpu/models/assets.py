"""Asset resolution: shadow tree + MyoDM object-scene processing.

The reference fetches its model assets (simhive) from git and instantiates
MyoDM scenes by substituting OBJECT_NAME into a template XML next to the
original (/root/reference/myosuite/envs/myo/myodm/myodm_v0.py:44-55). We
keep the reference asset tree read-only and materialize processed scenes in
a shadow tree under /tmp with symlinks so relative includes resolve.
Override the asset root with $MYOSUITE_TPU_ASSETS.
"""
from __future__ import annotations

import os

from myosuite_mjx_tpu.envs.registry import ASSET_ROOT

SHADOW_ROOT = os.environ.get(
    "MYOSUITE_TPU_SHADOW", "/tmp/myosuite_tpu_assets")


def _ensure_shadow() -> str:
  hand_dir = os.path.join(SHADOW_ROOT, "envs/myo/assets/hand")
  os.makedirs(hand_dir, exist_ok=True)
  link = os.path.join(SHADOW_ROOT, "simhive")
  if not os.path.islink(link) and not os.path.exists(link):
    os.symlink(os.path.join(ASSET_ROOT, "simhive"), link)
  # sibling includes (tabletop scene, textures, ...) resolve via symlinks
  src_dir = os.path.join(ASSET_ROOT, "envs/myo/assets/hand")
  for fname in os.listdir(src_dir):
    dst = os.path.join(hand_dir, fname)
    if not os.path.islink(dst) and not os.path.exists(dst):
      os.symlink(os.path.join(src_dir, fname), dst)
  return hand_dir


def object_scene_xml(object_name: str,
                     template: str = "myohand_object.xml") -> str:
  """Materialize the MyoDM hand+object scene for ``object_name``."""
  hand_dir = _ensure_shadow()
  out_path = os.path.join(
      hand_dir, f"{template[:-4]}_{object_name}.xml")
  if not os.path.exists(out_path):
    src = os.path.join(ASSET_ROOT, "envs/myo/assets/hand", template)
    with open(src) as f:
      xml = f.read().replace("OBJECT_NAME", object_name)
    with open(out_path, "w") as f:
      f.write(xml)
  return out_path


def myodm_clip(motion_file: str) -> str:
  return os.path.join(ASSET_ROOT, "envs/myo/myodm/data", motion_file)
