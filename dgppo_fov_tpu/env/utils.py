"""Shared environment utilities: rejection-sampled placement, raycasting glue.

Behavioral parity reference: /root/reference/dgppo/env/utils.py:49-244.
`get_node_goal_rng` reproduces the reference's PRNG key-split order exactly
(env/utils.py:139-244) so that same-seed resets generate identical initial
states — the hardest parity requirement (SURVEY.md §7 "Hard parts" #1).
"""
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jr
import numpy as np
from jax.lax import while_loop

from ..utils.typing import Array, BoolScalar, Pos, PRNGKey, Radius


def nearest_other_dist(pos: Array) -> Array:
    """Per-row distance to the closest OTHER row of `pos` (n, dims).

    Shared idiom of every family's collision/connectivity terms. The
    self-distance is masked by the reference's +1e6 diagonal (not inf) and
    the op order is preserved exactly — golden reset/cost parity against
    the running reference is bitwise on CPU (reference mpe/base.py:166-168,
    mpe_connect_spread.py:58-66,116-118, lidar_env/base.py:183-186).
    """
    dist = jnp.linalg.norm(pos[:, None] - pos[None, :], axis=-1)
    dist = dist + jnp.eye(pos.shape[0]) * 1e6
    return jnp.min(dist, axis=1)


def RK4_step(x_dot_fn, x, u, dt):
    """Classic RK4 integrator (reference env/utils.py:16-21; defined, unused)."""
    k1 = x_dot_fn(x, u)
    k2 = x_dot_fn(x + 0.5 * dt * k1, u)
    k3 = x_dot_fn(x + 0.5 * dt * k2, u)
    k4 = x_dot_fn(x + dt * k3, u)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def lqr(A: np.ndarray, B: np.ndarray, Q: np.ndarray, R: np.ndarray) -> np.ndarray:
    """Discrete-time LQR gain K for u = -K x.

    Parity: reference env/utils.py:24-46 (defined, unused at runtime).
    Solves the discrete algebraic Riccati equation by fixed-point iteration
    (avoids the scipy dependency; converges for stabilizable systems).
    """
    X = Q.copy()
    for _ in range(10_000):
        X_next = A.T @ X @ A - A.T @ X @ B @ np.linalg.inv(R + B.T @ X @ B) @ B.T @ X @ A + Q
        if np.max(np.abs(X_next - X)) < 1e-10:
            X = X_next
            break
        X = X_next
    else:
        # Returning a silently-wrong gain (measured 99.9% error on marginally
        # stable systems) is worse than failing: the caller's closed loop
        # would be effectively uncontrolled.
        residual = float(np.max(np.abs(A.T @ X @ A - A.T @ X @ B @ np.linalg.inv(R + B.T @ X @ B) @ B.T @ X @ A + Q - X)))
        raise RuntimeError(f"DARE fixed-point iteration did not converge (residual {residual:.2e})")
    return np.linalg.inv(B.T @ X @ B + R) @ (B.T @ X @ A)


def inside_obstacles(points: Pos, obstacles=None, r: Radius = 0.0) -> BoolScalar:
    """True where a point is within distance r of any obstacle.

    Parity: reference env/utils.py:82-112. `obstacles` is a tree-stacked
    Obstacle (see env/obstacle.py) or None.
    """
    if obstacles is None:
        if points.ndim == 1:
            return jnp.zeros((), dtype=bool)
        return jnp.zeros(points.shape[0], dtype=bool)

    # Obstacles expose a vmap-able `.inside(point, r)` over their stacked leaves.
    def inside_one(point):
        return jax.vmap(lambda obs: obs.inside(point, r))(obstacles).max()

    if obstacles.center.shape[0] == 0:
        if points.ndim == 1:
            return jnp.zeros((), dtype=bool)
        return jnp.zeros(points.shape[0], dtype=bool)

    if points.ndim == 1:
        return inside_one(points)
    return jax.vmap(inside_one)(points)


def raytracing(starts: Pos, ends: Pos, obstacles, max_returns: int) -> Pos:
    """Per-beam closest-hit raytracing, returning top-`max_returns` hit points.

    Parity: reference env/utils.py:115-136. alpha is the fractional distance
    along each ray; rays starting inside an obstacle return their start.
    """
    is_in = inside_obstacles(starts, obstacles)

    def ray_any(start, end):
        return jax.vmap(lambda obs: obs.raytracing(start, end))(obstacles).min()

    if obstacles is None or obstacles.center.shape[0] == 0:
        alphas = jnp.ones(starts.shape[0]) * 1e6
    else:
        alphas = jax.vmap(ray_any)(starts, ends)
        alphas = alphas * (1 - is_in)

    # top_k instead of argsort (the reference's env/utils.py:132): same
    # selection and same index-order on ties (both prefer lower beam index),
    # but O(n k) and TPU-native instead of a full sort. Clamp k to the beam
    # count — the reference's argsort[:k] truncates gracefully when k exceeds
    # the number of beams; lax.top_k would raise at trace time.
    _, order = jax.lax.top_k(-alphas, min(max_returns, alphas.shape[0]))
    hits = starts + (ends - starts) * alphas[..., None]
    return hits[order]


def get_lidar(
    start_point: Pos,
    obstacles,
    num_beams: int,
    sense_range: float,
    max_returns: int = 32,
) -> Pos:
    """2D LiDAR: `num_beams` rays spread over the circle; 3D for Cuboid/Sphere.

    Parity: reference env/utils.py:49-79.
    """
    from .obstacle import Cuboid, Rectangle, Sphere

    if isinstance(obstacles, Rectangle):
        thetas = jnp.linspace(-np.pi, np.pi - 2 * np.pi / num_beams, num_beams)
        starts = jnp.broadcast_to(start_point[None, :], (num_beams, start_point.shape[0]))
        ends = jnp.stack(
            [
                starts[..., 0] + jnp.cos(thetas) * sense_range,
                starts[..., 1] + jnp.sin(thetas) * sense_range,
            ],
            axis=-1,
        )
    elif isinstance(obstacles, (Cuboid, Sphere)):
        thetas = jnp.linspace(
            -np.pi / 2 + 2 * np.pi / num_beams, np.pi / 2 - 2 * np.pi / num_beams, num_beams // 2
        )
        phis = jnp.linspace(-np.pi, np.pi - 2 * np.pi / num_beams, num_beams)
        n_rays = thetas.shape[0] * phis.shape[0] + 2
        starts = jnp.broadcast_to(start_point[None, :], (n_rays, 3))
        tt, pp = jnp.meshgrid(thetas, phis, indexing="ij")
        ends = jnp.stack(
            [
                start_point[0] + jnp.cos(tt) * jnp.cos(pp) * sense_range,
                start_point[1] + jnp.cos(tt) * jnp.sin(pp) * sense_range,
                start_point[2] + jnp.sin(tt) * sense_range,
            ],
            axis=-1,
        ).reshape(-1, 3)
        ends = jnp.concatenate(
            [
                ends,
                start_point[None, :] + jnp.array([[0.0, 0.0, sense_range]]),
                start_point[None, :] + jnp.array([[0.0, 0.0, -sense_range]]),
            ],
            axis=0,
        )
    else:
        raise NotImplementedError(type(obstacles))
    return raytracing(starts, ends, obstacles, max_returns)


def get_node_goal_rng(
    key: PRNGKey,
    side_length: float,
    dim: int,
    n: int,
    min_dist: float,
    obstacles=None,
    side_length_y: Optional[float] = None,
    max_travel: Optional[float] = None,
    side_length_z: Optional[float] = None,
) -> Tuple[Array, Array]:
    """Rejection-sample n agent starts + goals with min separation.

    Key-split order matches reference env/utils.py:139-244 exactly:
    per agent: (agent_key, goal_key, this_key) = split(this_key, 3); each
    rejection iteration consumes (use_key, this_key) = split(this_key, 2).
    Restarts from agent 0 if either loop exhausts 1024 iterations.
    """
    max_iter = 1024
    states = jnp.zeros((n, dim))
    goals = jnp.zeros((n, dim))
    side_length_y = side_length if side_length_y is None else side_length_y
    side_length_z = side_length if side_length_z is None else side_length_z

    if dim == 2:
        max_side = jnp.array([side_length, side_length_y])
    elif dim == 3:
        max_side = jnp.array([side_length, side_length_y, side_length_z])
    else:
        raise NotImplementedError(dim)

    def get_node(inp):
        i_iter, this_key, _, all_nodes = inp
        use_key, this_key = jr.split(this_key, 2)
        i_iter += 1
        return i_iter, this_key, jr.uniform(use_key, (dim,), minval=0, maxval=max_side), all_nodes

    def non_valid_node(inp):
        i_iter, _, node, all_nodes = inp
        dist_min = jnp.linalg.norm(all_nodes - node, axis=1).min()
        collide = dist_min <= min_dist
        inside = inside_obstacles(node, obstacles, r=min_dist / 2)
        valid = ~(collide | inside) | (i_iter >= max_iter)
        return ~valid

    def get_goal(inp):
        i_iter, this_key, _, agent, all_goals = inp
        use_key, this_key = jr.split(this_key, 2)
        i_iter += 1
        if max_travel is None:
            cand = jr.uniform(use_key, (dim,), minval=0, maxval=max_side)
        else:
            cand = jr.uniform(use_key, (dim,), minval=-max_travel, maxval=max_travel) + agent
        return i_iter, this_key, cand, agent, all_goals

    def non_valid_goal(inp):
        i_iter, _, goal, agent, all_goals = inp
        dist_min = jnp.linalg.norm(all_goals - goal, axis=1).min()
        collide = dist_min <= min_dist
        inside = inside_obstacles(goal, obstacles, r=min_dist / 2)
        outside = jnp.any(goal < 0) | jnp.any(goal > side_length)
        if max_travel is None:
            too_long = jnp.array(False)
        else:
            too_long = jnp.linalg.norm(goal - agent) > max_travel
        valid = (~collide & ~inside & ~outside & ~too_long) | (i_iter >= max_iter)
        return ~valid

    def reset_body(inp):
        agent_id, this_key, all_states, all_goals = inp
        agent_key, goal_key, this_key = jr.split(this_key, 3)
        agent_candidate = jr.uniform(agent_key, (dim,), minval=0, maxval=max_side)
        n_iter_agent, _, agent_candidate, _ = while_loop(
            non_valid_node, get_node, (0, agent_key, agent_candidate, all_states)
        )
        all_states = all_states.at[agent_id].set(agent_candidate)

        if max_travel is None:
            goal_candidate = jr.uniform(goal_key, (dim,), minval=0, maxval=max_side)
        else:
            goal_candidate = jr.uniform(goal_key, (dim,), minval=0, maxval=max_travel) + agent_candidate

        n_iter_goal, _, goal_candidate, _, _ = while_loop(
            non_valid_goal, get_goal, (0, goal_key, goal_candidate, agent_candidate, all_goals)
        )
        all_goals = all_goals.at[agent_id].set(goal_candidate)
        agent_id += 1

        # Start over if a loop gave up (reference env/utils.py:229-232).
        ok = (1 - (n_iter_agent >= max_iter)) * (1 - (n_iter_goal >= max_iter))
        agent_id = ok * agent_id
        all_states = ok * all_states
        all_goals = ok * all_goals
        return agent_id, this_key, all_states, all_goals

    def not_done(inp):
        agent_id, *_ = inp
        return agent_id < n

    _, _, states, goals = while_loop(not_done, reset_body, (0, key, states, goals))
    return states, goals
