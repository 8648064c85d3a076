"""OSL RunTrack env: OSL-in-the-loop stepping, terrain, reset modes.

Reference: /root/reference/myosuite/envs/myo/myochallenge/run_track_v0.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from myosuite_mjx_tpu import envs


@pytest.fixture(scope="module")
def env():
  return envs.make("myoChallengeOslRunFixed-v0")


@pytest.fixture(scope="module")
def jreset(env):
  # jit the leg-scale reset once per module: eager dispatch of the
  # 80-MTU scene is minutes of op-by-op overhead on CPU
  return jax.jit(env.reset)


def test_action_space_excludes_osl(env):
  assert env.action_dim == env.model.na == 54
  assert env.model.nu == 56


def test_reset_modes(env, jreset):
  st = jreset(jax.random.PRNGKey(0))
  # random reset: y at start+1, yaw in [-125deg, -60deg]
  assert float(st.data.qpos[1]) == pytest.approx(env.start_pos + 1)
  assert abs(float(st.data.qpos[0])) <= 0.8 * env.real_width + 1e-6
  from myosuite_mjx_tpu.ops import quat as qmath
  yaw = float(qmath.quat_to_euler_intrinsic(st.data.qpos[3:7])[2])
  assert np.deg2rad(-125) - 1e-5 <= yaw <= np.deg2rad(-60) + 1e-5
  # height adjustment leaves the lowest foot site at ~5 mm
  lows = np.asarray(st.data.site_xpos[np.asarray(env.btm_sites), 2])
  assert abs(lows.min() - 0.005) < 1e-4


def test_osl_machine_advances_under_load(env, jreset):
  st = jreset(jax.random.PRNGKey(0))
  step = jax.jit(env.step)
  a = jnp.zeros(env.action_dim)
  states = [int(st.aux["osl_state"])]
  for _ in range(20):
    st = step(st, a)
    states.append(int(st.aux["osl_state"]))
  assert len(set(states)) > 1, f"OSL state machine never transitioned: {states}"
  assert np.isfinite(np.asarray(st.obs)).all()
  # pelvis does not immediately collapse on flat terrain
  assert float(st.data.xpos[env.pelvis_bid][2]) > 0.6


def test_reward_contract(env, jreset):
  st = jreset(jax.random.PRNGKey(1))
  obs = env.get_obs_dict(st.data, st.aux)
  rwd = env.get_reward_dict(obs, st.data, st.aux)
  for k in ("sparse", "solved", "done", "act_reg", "pain"):
    assert k in rwd
  # sparse reward is the forward (-y) pelvis speed (run_track_v0.py:592-601)
  np.testing.assert_allclose(
      float(rwd["sparse"]), -float(st.data.qvel[1]), atol=1e-6)


def test_random_terrain_overlay():
  env = envs.make("myoChallengeOslRunRandom-v0")
  jr = jax.jit(env.reset)
  types = set()
  for s in range(6):
    st = jr(jax.random.PRNGKey(s))
    types.add(int(st.aux["terrain_type"]))
    hf = np.asarray(st.data.overlay["hfield_data"])
    assert hf.shape == (env.model.hfield_nrow[0] * env.model.hfield_ncol[0],)
    assert np.isfinite(hf).all() and hf.min() >= 0.0
  # random mode draws among STAIRS/HILLY/ROUGH
  assert types <= {1, 2, 3} and len(types) >= 2


def test_gait_data_init():
  env = envs.make("myoChallengeOslRunFixed-v0", cache=False,
                  reset_type="osl_init")
  st = jax.jit(env.reset)(jax.random.PRNGKey(3))
  assert np.isfinite(np.asarray(st.obs)).all()
  assert int(st.aux["osl_state"]) in (0, 1, 2, 3)
  # forward speed comes from the gait sample (nonzero)
  assert abs(float(st.data.qvel[0])) + abs(float(st.data.qvel[1])) > 0.1
