"""Lidar environments: raycast correctness, reset validity, dynamics, FoV costs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.env import make_env
from dgppo_fov_tpu.env.lidar.base import LidarEnv
from dgppo_fov_tpu.env.obstacle import Rectangle
from dgppo_fov_tpu.env.utils import get_lidar, inside_obstacles, raytracing


def test_rectangle_raytrace_axis_aligned():
    # Unit square centered at (1, 0); ray from origin along +x must hit at x=0.5.
    rect = Rectangle.create(jnp.array([1.0, 0.0]), 1.0, 1.0, 0.0)
    start = jnp.array([0.0, 0.0])
    end = jnp.array([2.0, 0.0])
    alpha = rect.raytracing(start, end)
    np.testing.assert_allclose(float(alpha), 0.25, atol=1e-5)  # hit at x=0.5 on ray of len 2

    # Miss: ray pointing away.
    alpha_miss = rect.raytracing(start, jnp.array([-2.0, 0.0]))
    assert float(alpha_miss) >= 1e5


def test_rectangle_inside():
    rect = Rectangle.create(jnp.array([0.0, 0.0]), 2.0, 1.0, 0.0)
    assert bool(rect.inside(jnp.array([0.5, 0.0])))
    assert not bool(rect.inside(jnp.array([1.5, 0.0])))
    assert bool(rect.inside(jnp.array([1.05, 0.0]), r=0.1))  # within margin


def test_rectangle_rotated_raytrace():
    # 45-degree rotated square: corner toward origin.
    rect = Rectangle.create(jnp.array([1.0, 0.0]), 1.0, 1.0, float(np.pi / 4))
    start = jnp.array([0.0, 0.0])
    end = jnp.array([2.0, 0.0])
    alpha = rect.raytracing(start, end)
    # Corner at distance 1 - sqrt(2)/2 from origin along x.
    expected = (1.0 - np.sqrt(2) / 2) / 2.0
    np.testing.assert_allclose(float(alpha), expected, atol=1e-5)


def test_get_lidar_hits_sorted_topk():
    import functools as ft

    rects = jax.vmap(Rectangle.create)(
        jnp.array([[0.5, 0.0], [0.0, 0.6]]),
        jnp.array([0.2, 0.2]),
        jnp.array([0.2, 0.2]),
        jnp.array([0.0, 0.0]),
    )
    hits = get_lidar(jnp.zeros(2), rects, num_beams=32, sense_range=1.0, max_returns=4)
    assert hits.shape == (4, 2)
    d = np.linalg.norm(np.asarray(hits), axis=-1)
    # Closest returns correspond to real obstacle faces (within sense range).
    assert d.min() < 0.55


def test_raytracing_inside_returns_start():
    rects = jax.vmap(Rectangle.create)(
        jnp.array([[0.0, 0.0]]), jnp.array([1.0]), jnp.array([1.0]), jnp.array([0.0])
    )
    starts = jnp.array([[0.1, 0.1]])
    ends = jnp.array([[2.0, 0.0]])
    assert bool(inside_obstacles(starts[0], rects))
    hits = raytracing(starts, ends, rects, max_returns=1)
    np.testing.assert_allclose(np.asarray(hits[0]), [0.1, 0.1], atol=1e-6)


@pytest.mark.parametrize("name", ["LidarTarget", "LidarSpread"])
def test_lidar_env_reset_and_step(name):
    env = make_env(name, num_agents=3, max_step=8)
    graph = jax.jit(env.reset)(jax.random.PRNGKey(0))
    agent = np.asarray(graph.type_states(LidarEnv.AGENT))
    assert agent.shape == (3, 4)
    # agents not inside obstacles
    assert not np.any(np.asarray(inside_obstacles(jnp.asarray(agent[:, :2]), graph.env_states.obstacle)))

    ng, reward, cost, done, _ = jax.jit(env.step)(graph, jnp.zeros((3, 2)))
    assert np.isfinite(float(reward))
    assert cost.shape == (3, 2)
    assert np.all(np.asarray(cost) <= 1.0) and np.all(np.asarray(cost) >= -1.0)


def test_omni_fov_costs():
    env = make_env("LidarOmniTarget", num_agents=3, max_step=8)
    graph = jax.jit(env.reset)(jax.random.PRNGKey(1))
    cost = np.asarray(env.get_cost(graph))
    assert cost.shape == (3, 5)
    # Last agent has no FoV target: its 3 FoV costs are the safe value -1
    # (margin pushes -1-0.1, clipped back to -1).
    np.testing.assert_allclose(cost[2, 2:], -1.0, atol=1e-6)

    # Manually verify the FoV angle cost for agent 0 against its state.
    s = np.asarray(graph.type_states(0))
    p_rel = s[1, :2] - s[0, :2]
    cpsi, spsi = s[0, 2], s[0, 3]
    local = np.array([cpsi * p_rel[0] + spsi * p_rel[1], -spsi * p_rel[0] + cpsi * p_rel[1]])
    norm = np.linalg.norm(local)
    h_angle = np.cos(np.deg2rad(60.0)) * (norm + 1e-8) - local[0]
    expected = h_angle - 0.1 if h_angle <= 0 else h_angle + 0.1
    expected = np.clip(expected, -1, 1)
    np.testing.assert_allclose(cost[0, 2], expected, atol=1e-5)


def test_omni_dynamics():
    env = make_env("LidarOmniTarget", num_agents=3, max_step=8)
    graph = env.reset(jax.random.PRNGKey(2))
    s0 = np.asarray(graph.type_states(0))
    action = jnp.concatenate([jnp.ones((3, 2)) * 0.3, jnp.ones((3, 1)) * 0.1], axis=1)
    ng, *_ = env.step(graph, action)
    s1 = np.asarray(ng.type_states(0))
    # vel' = vel + 10*a*dt; omega' = omega + 5*alpha*dt
    np.testing.assert_allclose(s1[:, 4:6], s0[:, 4:6] + 10 * 0.3 * env.dt, rtol=1e-5)
    np.testing.assert_allclose(s1[:, 6], s0[:, 6] + 5 * 0.1 * env.dt, rtol=1e-5)
    np.testing.assert_allclose(s1[:, :2], s0[:, :2] + s0[:, 4:6] * env.dt, atol=1e-6)


def test_bicycle_dynamics():
    env = make_env("LidarBicycleTarget", num_agents=3, max_step=8)
    graph = env.reset(jax.random.PRNGKey(3))
    s0 = np.asarray(graph.type_states(0))
    action = jnp.stack([jnp.ones(3) * 0.2, jnp.ones(3) * 0.5], axis=1)
    ng, *_ = env.step(graph, action)
    s1 = np.asarray(ng.type_states(0))
    theta = np.arctan2(s0[:, 3], s0[:, 2])
    np.testing.assert_allclose(s1[:, 0], s0[:, 0] + s0[:, 4] * np.cos(theta) * env.dt, atol=1e-6)
    np.testing.assert_allclose(s1[:, 4], np.clip(s0[:, 4] + 0.5 * env.dt * 10, -0.5, 0.5), atol=1e-6)


def test_bicycle_num_obs_zero_rollout():
    """Regression: bicycle's reset used to build an EMPTY Rectangle at
    num_obs=0 while step() substitutes None, so the rollout scan's carry
    changed pytree structure and crashed on the first step."""
    import functools as ft

    from dgppo_fov_tpu.trainer.rollout import test_rollout

    env = make_env("LidarBicycleTarget", num_agents=3, num_obs=0, max_step=8)

    def act(graph, rnn_state):
        return jnp.zeros((3, env.action_dim)), rnn_state

    rollout = jax.jit(ft.partial(test_rollout, env, act, jnp.zeros((1, 3, 1, 64))))(jax.random.PRNGKey(0))
    assert rollout.rewards.shape == (8,)
