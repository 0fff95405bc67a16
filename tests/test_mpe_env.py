"""MPE environment: reset validity, step dynamics, cost semantics, scan/vmap."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.env import make_env
from dgppo_fov_tpu.env.mpe.base import MPE


@pytest.fixture(scope="module")
def env():
    return make_env("MPETarget", num_agents=3, num_obs=3)


def test_reset_valid(env):
    graph = jax.jit(env.reset)(jax.random.PRNGKey(0))
    agent = np.asarray(graph.type_states(MPE.AGENT))
    goal = np.asarray(graph.type_states(MPE.GOAL))
    obs = np.asarray(graph.type_states(MPE.OBS))

    assert agent.shape == (3, 4)
    assert np.all(agent[:, 2:] == 0)  # zero initial velocity
    # min pairwise distance >= 2*car_radius
    d = np.linalg.norm(agent[:, None, :2] - agent[None, :, :2], axis=-1)
    d += np.eye(3) * 1e6
    assert d.min() > 2 * env.params["car_radius"]
    # everything in area
    for x in (agent, goal, obs):
        assert np.all(x[:, :2] >= 0) and np.all(x[:, :2] <= env.area_size)
    # obstacles clear of agents and goals
    d_ao = np.linalg.norm(agent[:, None, :2] - obs[None, :, :2], axis=-1)
    assert d_ao.min() > env.params["car_radius"] + env.params["obs_radius"]


def test_step_euler_dynamics(env):
    graph = env.reset(jax.random.PRNGKey(1))
    agent0 = np.asarray(graph.type_states(MPE.AGENT))
    action = jnp.ones((3, 2)) * 0.5
    next_graph, reward, cost, done, _ = jax.jit(env.step)(graph, action)
    agent1 = np.asarray(next_graph.type_states(MPE.AGENT))

    # x' = x + v*dt; v' = v + 10*a*dt (then clipped)
    expected_pos = agent0[:, :2] + agent0[:, 2:] * env.dt
    expected_vel = np.clip(agent0[:, 2:] + 10 * 0.5 * env.dt, -1, 1)
    np.testing.assert_allclose(agent1[:, :2], expected_pos, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(agent1[:, 2:], expected_vel, rtol=1e-5, atol=1e-6)
    assert reward.shape == ()
    assert cost.shape == (3, 2)
    assert not bool(done)


def test_cost_margin_semantics(env):
    graph = env.reset(jax.random.PRNGKey(2))
    cost = np.asarray(env.get_cost(graph))
    # Valid reset => all costs negative (safe), with margin => <= -0.5 or
    # clipped at -1.
    assert np.all(cost <= -0.5 + 1e-6)
    assert np.all(cost >= -1.0 - 1e-6)


def test_cost_positive_on_collision(env):
    graph = env.reset(jax.random.PRNGKey(3))
    state = graph.env_states
    # Move agent 1 on top of agent 0.
    agent = state.agent.at[1].set(state.agent[0])
    graph2 = env.get_graph(state._replace(agent=agent))
    cost = np.asarray(env.get_cost(graph2))
    assert cost[0, 0] > 0.5  # collision + margin
    assert cost[1, 0] > 0.5


def test_rollout_scan_and_vmap(env):
    def rollout(key):
        graph = env.reset(key)

        def body(g, _):
            action = jnp.zeros((3, 2))
            ng, r, c, d, _ = env.step(g, action)
            return ng, (r, c)

        _, (rs, cs) = jax.lax.scan(body, graph, None, length=8)
        return rs, cs

    keys = jax.random.split(jax.random.PRNGKey(4), 5)
    rs, cs = jax.jit(jax.vmap(rollout))(keys)
    assert rs.shape == (5, 8)
    assert cs.shape == (5, 8, 3, 2)
    assert np.all(np.isfinite(np.asarray(rs)))


def test_reward_spread():
    env = make_env("MPESpread", num_agents=3, num_obs=3)
    graph = env.reset(jax.random.PRNGKey(0))
    r = env.get_reward(graph, jnp.zeros((3, 2)))
    assert np.isfinite(float(r)) and float(r) <= 0
