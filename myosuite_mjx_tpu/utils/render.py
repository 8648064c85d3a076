"""Host-side debug rendering of logged qpos frames.

The CPU MuJoCo twin renders offscreen via EGL (rendering stays host-side
by design, SURVEY.md §2.2 — the TPU path never produces pixels). Falls
back from mp4 to gif when no ffmpeg backend is available in the image.
"""
from __future__ import annotations

import os


def render_qpos_frames(model_path: str, qpos_frames, out_path: str,
                       camera=None, fps: int = 25,
                       frame_size=(320, 240)) -> str:
  """Render a sequence of qpos vectors; returns the path actually written."""
  os.environ.setdefault("MUJOCO_GL", "egl")  # headless GL
  import imageio
  import mujoco

  mj = mujoco.MjModel.from_xml_path(model_path)
  renderer = mujoco.Renderer(mj, height=frame_size[1], width=frame_size[0])
  d = mujoco.MjData(mj)

  try:
    writer = imageio.get_writer(out_path, fps=fps)
  except ValueError:
    # no mp4 backend (ffmpeg absent): fall back to animated gif
    out_path = os.path.splitext(out_path)[0] + ".gif"
    writer = imageio.get_writer(out_path, fps=fps)
  with writer as w:
    for qpos in qpos_frames:
      d.qpos[:] = qpos
      mujoco.mj_forward(mj, d)
      renderer.update_scene(d, camera=camera if camera else -1)
      w.append_data(renderer.render())
  return out_path
