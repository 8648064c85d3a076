"""Batched env suite: import registers all task IDs."""
from myosuite_mjx_tpu.envs import myobase  # noqa: F401  (registers IDs)
from myosuite_mjx_tpu.envs import myodm  # noqa: F401  (registers IDs)
from myosuite_mjx_tpu.envs import myochallenge  # noqa: F401  (registers IDs)
from myosuite_mjx_tpu.envs.base import BatchedEnv, EnvState, MyoEnv
from myosuite_mjx_tpu.envs.gym_adapter import GymEnv, GymVecEnv, gym_make
from myosuite_mjx_tpu.envs.registry import (
    make, register, register_env_variant, registry_ids)
