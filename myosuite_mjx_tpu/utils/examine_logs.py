"""examine_logs CLI: record / playback / render logged rollouts.

Capability parity with the reference CLI (/root/reference/myosuite/logger/
examine_logs.py:27-415): record fresh rollouts into a Trace, replay a
logged Trace's actions through the env from its logged initial state, or
host-render logged qpos frames to a video (CPU MuJoCo debug path,
SURVEY.md §2.2).

Usage:
  python -m myosuite_mjx_tpu.utils.examine_logs -e myoFingerPoseFixed-v0 \
      -m record --horizon 50 -o /tmp -n rollout
  python -m myosuite_mjx_tpu.utils.examine_logs -e myoFingerPoseFixed-v0 \
      -m playback -p /tmp/rollout.h5
  python -m myosuite_mjx_tpu.utils.examine_logs -e myoFingerPoseFixed-v0 \
      -m render -p /tmp/rollout.h5 -o /tmp
"""
from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np

from myosuite_mjx_tpu.logger.trace import Trace


def record(env, horizon, num_repeat, seed):
  trace = Trace("Rollouts")
  step = jax.jit(env.step)
  for ep in range(num_repeat):
    key = jax.random.PRNGKey(seed + ep)
    st = env.reset(key)
    g = f"Trial{ep}"
    for _ in range(horizon):
      key, k_act = jax.random.split(key)
      a = jax.random.uniform(k_act, (env.action_dim,), minval=-1.0,
                             maxval=1.0)
      nxt = step(st, a)
      trace.append_datums(
          g, time=np.asarray(st.data.time), actions=np.asarray(a),
          observations=np.asarray(st.obs), rewards=np.asarray(nxt.reward),
          done=np.asarray(nxt.done), qpos=np.asarray(st.data.qpos),
          qvel=np.asarray(st.data.qvel))
      st = nxt
  trace.stack()
  return trace


def playback(env, trace, seed):
  """Replay each trial's logged actions from its logged initial state;
  report per-trial return and final-state drift vs the log."""
  step = jax.jit(env.step)
  results = {}
  for g, data in trace.trace.items():
    qpos0, qvel0 = data["qpos"][0], data["qvel"][0]
    st = env.reset_to(jnp.asarray(qpos0), jnp.asarray(qvel0),
                      jax.random.PRNGKey(seed))
    ret = 0.0
    # logged qpos[t] is the pre-action state: replaying actions[:t] lands
    # on qpos[t], so the last comparable state is after actions[:-1]
    for a in data["actions"][:-1]:
      st = step(st, jnp.asarray(a))
      ret += float(st.reward)
    drift = float(np.linalg.norm(
        np.asarray(st.data.qpos) - data["qpos"][-1]))
    st = step(st, jnp.asarray(data["actions"][-1]))
    ret += float(st.reward)
    results[g] = dict(ret=ret, qpos_drift=drift)
    print(f"{g}: return={ret:.3f} final qpos drift vs log={drift:.2e}")
  return results


def render(env, trace, out_path, camera=None, fps=25,
           frame_size=(320, 240)):
  """Host-side offscreen render of logged qpos through the CPU twin."""
  from myosuite_mjx_tpu.utils.render import render_qpos_frames
  frames = [q for _, data in trace.trace.items() for q in data["qpos"]]
  out = render_qpos_frames(env.model_path, frames, out_path,
                           camera=camera, fps=fps, frame_size=frame_size)
  print(f"wrote {out}")
  return out


def main(argv=None):
  ap = argparse.ArgumentParser()
  ap.add_argument("--env_name", "-e", required=True)
  ap.add_argument("--mode", "-m", default="playback",
                  choices=("record", "playback", "render"))
  ap.add_argument("--rollout_path", "-p", default=None)
  ap.add_argument("--horizon", type=int, default=50)
  ap.add_argument("--seed", "-s", type=int, default=0)
  ap.add_argument("--num_repeat", type=int, default=1)
  ap.add_argument("--output_dir", "-o", default="/tmp")
  ap.add_argument("--output_name", "-n", default="rollout")
  ap.add_argument("--output_format", "-f", default="h5",
                  choices=("h5", "pickle"))
  ap.add_argument("--camera", "-c", default=None)
  args = ap.parse_args(argv)

  from myosuite_mjx_tpu import envs
  env = envs.make(args.env_name)

  if args.mode == "record":
    trace = record(env, args.horizon, args.num_repeat, args.seed)
    os.makedirs(args.output_dir, exist_ok=True)
    ext = "h5" if args.output_format == "h5" else "pkl"
    out = os.path.join(args.output_dir, f"{args.output_name}.{ext}")
    trace.save(out)
    print(f"recorded {args.num_repeat} x {args.horizon} steps -> {out}")
    return out

  assert args.rollout_path, f"--rollout_path required for {args.mode}"
  trace = Trace.load(args.rollout_path)
  if args.mode == "playback":
    return playback(env, trace, args.seed)
  out = os.path.join(args.output_dir, f"{args.output_name}.mp4")
  return render(env, trace, out, camera=args.camera)


if __name__ == "__main__":
  main()
