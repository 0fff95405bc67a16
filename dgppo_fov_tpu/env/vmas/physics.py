"""2D contact physics for the VMAS environments — functional, static-dispatch.

Behavioral parity reference: /root/reference/dgppo/env/vmas/physax/
(world.py:30-589, entity.py:49-264, shapes.py:6-113, geometry.py:8-102,
vmas_utils.py:6-36). Semantics preserved:

 - per substep: clamped action force/torque, friction, gravity; pairwise
   soft-contact constraint forces; semi-implicit Euler with drag applied on
   substep 0 only, speed clamps, world-boundary position clipping
   (world.py:77-163);
 - soft contact: penetration = k * logaddexp(0, (dist_min - dist)/k),
   force along the separation direction, zeroed outside contact
   (world.py:440-468);
 - implemented collision types: sphere-sphere (world.py:270-307),
   sphere-line with torque on the line (world.py:309-359), hollow-box-sphere
   with torque on the box (world.py:361-438); the reference's line-line /
   box-line / box-box paths are disabled dead code (world.py:252-255) and are
   not reproduced;
 - closest-point-on-line / closest-point-on-box-perimeter geometry
   (geometry.py:8-102).

TPU-first design: entities are split into a hashable static `EntitySpec`
(shape, mass, flags — compile-time constants) and a small `EntityState`
pytree, so `step` is a pure function (tuple[EntityState] -> tuple[EntityState])
that unrolls entity/pair loops at trace time and fuses into one XLA program.
The reference's friction helper contains a torch idiom (`vel.abs()`,
world.py:548) that would crash when enabled; ours is implemented correctly.
"""
from dataclasses import dataclass, field
from typing import Dict, NamedTuple, Optional, Tuple

import jax.numpy as jnp

from ...utils.typing import Array

LINE_MIN_DIST = 4 / 6e2


# ---- shapes (static, hashable) ----------------------------------------------
@dataclass(frozen=True)
class Sphere:
    radius: float = 0.05

    def moment_of_inertia(self, mass: float) -> float:
        return 0.5 * mass * self.radius**2


@dataclass(frozen=True)
class Box:
    length: float = 0.3
    width: float = 0.1
    hollow: bool = False

    def moment_of_inertia(self, mass: float) -> float:
        return (1 / 12) * mass * (self.length**2 + self.width**2)


@dataclass(frozen=True)
class Line:
    length: float = 0.5

    def moment_of_inertia(self, mass: float) -> float:
        return (1 / 12) * mass * self.length**2


# ---- entities -----------------------------------------------------------------
@dataclass(frozen=True)
class EntitySpec:
    """Static entity metadata; hashable, safe to close over under jit."""

    name: str
    shape: object
    movable: bool = False
    rotatable: bool = False
    collide: bool = True
    mass: float = 1.0
    max_speed: Optional[float] = None
    max_angvel: Optional[float] = None
    v_range: Optional[float] = None
    drag: Optional[float] = None
    linear_friction: Optional[float] = None
    angular_friction: Optional[float] = None
    gravity: Optional[Tuple[float, float]] = None
    # Agent action-force constraints (None for non-agents).
    f_range: Optional[float] = None
    max_f: Optional[float] = None
    t_range: Optional[float] = None
    max_t: Optional[float] = None
    u_multiplier: float = 1.0
    is_agent: bool = False
    # None = collides with everything; otherwise a whitelist of names.
    collides_with: Optional[Tuple[str, ...]] = None

    @property
    def moment_of_inertia(self) -> float:
        return self.shape.moment_of_inertia(self.mass)

    def allows(self, other: "EntitySpec") -> bool:
        if not self.collide:
            return False
        return self.collides_with is None or other.name in self.collides_with


class EntityState(NamedTuple):
    pos: Array  # (2,)
    vel: Array  # (2,)
    rot: Array  # (1,)
    ang_vel: Array  # (1,)
    force: Array  # (2,) action force (agents)
    torque: Array  # (1,) action torque (agents)

    @staticmethod
    def zero() -> "EntityState":
        return EntityState(jnp.zeros(2), jnp.zeros(2), jnp.zeros(1), jnp.zeros(1), jnp.zeros(2), jnp.zeros(1))


# ---- small vector helpers (parity: physax/vmas_utils.py:6-36) -----------------
def clamp_with_norm(x: Array, max_norm: float) -> Array:
    norm = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(norm > max_norm, x / norm * max_norm, x)


def rotate_vector(v: Array, angle: Array) -> Array:
    # Parity: reference physax/vmas_utils.py rotate_vector (defined, unused —
    # no registered env reaches it; kept for API completeness like RK4/lqr).
    if angle.ndim == v.ndim:
        angle = angle.squeeze(-1)
    c, s = jnp.cos(angle), jnp.sin(angle)
    return jnp.stack([v[..., 0] * c - v[..., 1] * s, v[..., 0] * s + v[..., 1] * c], axis=-1)


def cross2(a: Array, b: Array) -> Array:
    return (a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0])[..., None]


def compute_torque(f: Array, r: Array) -> Array:
    return cross2(r, f)


# ---- geometry (parity: physax/geometry.py:8-102) --------------------------------
def closest_point_line(line_pos: Array, line_rot: Array, line_length: float, point: Array) -> Array:
    direction = jnp.concatenate([jnp.cos(line_rot), jnp.sin(line_rot)], axis=-1)
    delta = line_pos - point
    dot_p = (delta * direction).sum(-1, keepdims=True)
    sign = jnp.sign(dot_p)
    dist_center = jnp.minimum(jnp.abs(dot_p), line_length / 2)
    return line_pos - sign * dist_center * direction


def closest_point_box(box_pos: Array, box_rot: Array, box_width: float, box_length: float, point: Array) -> Array:
    """Closest point on the box *perimeter* via its 4 side segments."""
    direction = jnp.concatenate([jnp.cos(box_rot), jnp.sin(box_rot)], axis=-1)
    normal = jnp.concatenate([jnp.cos(box_rot + jnp.pi / 2), jnp.sin(box_rot + jnp.pi / 2)], axis=-1)

    sides = [
        (box_pos + direction * box_length / 2, box_rot + jnp.pi / 2, box_width),
        (box_pos - direction * box_length / 2, box_rot + jnp.pi / 2, box_width),
        (box_pos + normal * box_width / 2, box_rot, box_length),
        (box_pos - normal * box_width / 2, box_rot, box_length),
    ]
    best = jnp.full_like(point, jnp.inf)
    best_d = jnp.array(jnp.inf)
    for side_pos, side_rot, side_len in sides:
        cp = closest_point_line(side_pos, side_rot, side_len, point)
        d = jnp.linalg.norm(point - cp, axis=-1)
        better = d < best_d
        best = jnp.where(better, cp, best)
        best_d = jnp.where(better, d, best_d)
    return best


# ---- world --------------------------------------------------------------------
@dataclass(frozen=True)
class World:
    """Static physics configuration (parity: physax/world.py:30-75)."""

    dt: float = 0.1
    substeps: int = 1
    drag: float = 0.25
    linear_friction: float = 0.0
    angular_friction: float = 0.0
    x_semidim: Optional[float] = None
    y_semidim: Optional[float] = None
    gravity: Tuple[float, float] = (0.0, 0.0)
    collision_force: float = 100.0
    contact_margin: float = 1e-3

    @property
    def sub_dt(self) -> float:
        return self.dt / self.substeps

    # ---- public API ----------------------------------------------------------
    def step(
        self, specs: Tuple[EntitySpec, ...], states: Tuple[EntityState, ...]
    ) -> Tuple[Tuple[EntityState, ...], Dict[str, Dict[str, Array]]]:
        """One dt (substeps micro-steps). Returns (new states, contact info)."""
        # Names key the collision filter and the info dicts: duplicates would
        # silently disable mutual collisions (a.name == b.name reads as self)
        # and overwrite contact entries. Specs are static — free under jit.
        names = [s.name for s in specs]
        assert len(set(names)) == len(names), f"duplicate entity names: {names}"
        info = {"contact_forces": {}, "contact_torques": {}}
        states = list(states)
        for substep in range(self.substeps):
            forces = [jnp.zeros(2) for _ in specs]
            torques = [jnp.zeros(1) for _ in specs]

            for i, (spec, st) in enumerate(zip(specs, states)):
                if spec.is_agent and spec.movable:
                    f = st.force
                    if spec.max_f is not None:
                        f = clamp_with_norm(f, spec.max_f)
                    if spec.f_range is not None:
                        f = jnp.clip(f, -spec.f_range, spec.f_range)
                    forces[i] = forces[i] + f
                    t = st.torque
                    if spec.max_t is not None:
                        t = clamp_with_norm(t, spec.max_t)
                    if spec.t_range is not None:
                        t = jnp.clip(t, -spec.t_range, spec.t_range)
                    torques[i] = torques[i] + t
                self._apply_friction(spec, st, i, forces, torques)
                self._apply_gravity(spec, i, forces)

            contact_f, contact_t = self._contact_forces(specs, states)
            for i in range(len(specs)):
                forces[i] = forces[i] + contact_f[i]
                torques[i] = torques[i] + contact_t[i]

            states = [
                self._integrate(spec, st, substep, f, t)
                for spec, st, f, t in zip(specs, states, forces, torques)
            ]
            info = {
                "contact_forces": {s.name: f for s, f in zip(specs, contact_f)},
                "contact_torques": {s.name: t for s, t in zip(specs, contact_t)},
            }
        return tuple(states), info

    # ---- force accumulation -----------------------------------------------------
    def _apply_friction(self, spec, st, i, forces, torques):
        def friction(vel, coeff, mass):
            speed = jnp.linalg.norm(vel, axis=-1)
            is_static = speed == 0
            denom = jnp.where(is_static, 1e-8, speed)
            f = -(vel / denom) * jnp.minimum(coeff * mass, (jnp.abs(vel) / self.sub_dt) * mass)
            return jnp.where(is_static, 0.0, f)

        lin = spec.linear_friction if spec.linear_friction is not None else (
            self.linear_friction if self.linear_friction > 0 else None
        )
        if lin is not None:
            forces[i] = forces[i] + friction(st.vel, lin, spec.mass)
        ang = spec.angular_friction if spec.angular_friction is not None else (
            self.angular_friction if self.angular_friction > 0 else None
        )
        if ang is not None:
            torques[i] = torques[i] + friction(st.ang_vel, ang, spec.moment_of_inertia)

    def _apply_gravity(self, spec, i, forces):
        if not spec.movable:
            return
        if any(g != 0.0 for g in self.gravity):
            forces[i] = forces[i] + spec.mass * jnp.asarray(self.gravity)
        if spec.gravity is not None:
            forces[i] = forces[i] + spec.mass * jnp.asarray(spec.gravity)

    # ---- contacts ------------------------------------------------------------------
    def _should_collide(self, a: EntitySpec, b: EntitySpec) -> bool:
        if a.name == b.name:
            return False
        if not (a.allows(b) and b.allows(a)):
            return False
        if not (a.movable or a.rotatable or b.movable or b.rotatable):
            return False
        kinds = {type(a.shape), type(b.shape)}
        return kinds in ({Sphere}, {Sphere, Line}, {Sphere, Box})

    def _contact_forces(self, specs, states):
        n = len(specs)
        forces = [jnp.zeros(2) for _ in range(n)]
        torques = [jnp.zeros(1) for _ in range(n)]

        for i in range(n):
            for j in range(i + 1, n):
                a, b = specs[i], specs[j]
                if not self._should_collide(a, b):
                    continue
                sa, sb = states[i], states[j]
                if isinstance(a.shape, Sphere) and isinstance(b.shape, Sphere):
                    f_a, f_b = self._constraint_force(
                        sa.pos, sb.pos, a.shape.radius + b.shape.radius
                    )
                    self._accumulate(a, i, f_a, None, forces, torques)
                    self._accumulate(b, j, f_b, None, forces, torques)
                elif {type(a.shape), type(b.shape)} == {Sphere, Line}:
                    (li, line_spec, line_st), (si, sph_spec, sph_st) = (
                        ((i, a, sa), (j, b, sb)) if isinstance(b.shape, Sphere) else ((j, b, sb), (i, a, sa))
                    )
                    cp = closest_point_line(line_st.pos, line_st.rot, line_spec.shape.length, sph_st.pos)
                    f_sphere, f_line = self._constraint_force(
                        sph_st.pos, cp, sph_spec.shape.radius + LINE_MIN_DIST
                    )
                    torque_line = compute_torque(f_line, cp - line_st.pos)
                    self._accumulate(line_spec, li, f_line, torque_line, forces, torques)
                    self._accumulate(sph_spec, si, f_sphere, None, forces, torques)
                else:  # Box-Sphere
                    (bi, box_spec, box_st), (si, sph_spec, sph_st) = (
                        ((i, a, sa), (j, b, sb)) if isinstance(b.shape, Sphere) else ((j, b, sb), (i, a, sa))
                    )
                    assert box_spec.shape.hollow, "only hollow boxes are supported (as in the reference)"
                    cp = closest_point_box(
                        box_st.pos, box_st.rot, box_spec.shape.width, box_spec.shape.length, sph_st.pos
                    )
                    f_sphere, f_box = self._constraint_force(
                        sph_st.pos, cp, sph_spec.shape.radius + LINE_MIN_DIST
                    )
                    torque_box = compute_torque(f_box, cp - box_st.pos)
                    self._accumulate(box_spec, bi, f_box, torque_box, forces, torques)
                    self._accumulate(sph_spec, si, f_sphere, None, forces, torques)
        return forces, torques

    @staticmethod
    def _accumulate(spec, i, f, t, forces, torques):
        if spec.movable and f is not None:
            forces[i] = forces[i] + f
        if spec.rotatable and t is not None:
            torques[i] = torques[i] + t

    def _constraint_force(self, pos_a, pos_b, dist_min, attractive: bool = False):
        """Soft-contact penalty force (parity: world.py:440-468)."""
        min_dist = 1e-6
        delta = pos_a - pos_b
        dist = jnp.linalg.norm(delta, axis=-1)
        sign = -1.0 if attractive else 1.0
        k = self.contact_margin
        penetration = jnp.logaddexp(0.0, (dist_min - dist) * sign / k) * k
        force = sign * self.collision_force * delta / jnp.where(dist > 0, dist, 1e-8)[..., None] * penetration[..., None]
        force = jnp.where((dist < min_dist)[..., None], 0.0, force)
        if not attractive:
            force = jnp.where((dist > dist_min)[..., None], 0.0, force)
        else:
            force = jnp.where((dist < dist_min)[..., None], 0.0, force)
        return force, -force

    # ---- integration -----------------------------------------------------------------
    def _integrate(self, spec: EntitySpec, st: EntityState, substep: int, force, torque) -> EntityState:
        pos, vel, rot, ang_vel = st.pos, st.vel, st.rot, st.ang_vel
        if spec.movable:
            if substep == 0:
                d = spec.drag if spec.drag is not None else self.drag
                vel = vel * (1 - d)
            vel = vel + (force / spec.mass) * self.sub_dt
            if spec.max_speed is not None:
                vel = clamp_with_norm(vel, spec.max_speed)
            if spec.v_range is not None:
                vel = jnp.clip(vel, -spec.v_range, spec.v_range)
            pos = pos + vel * self.sub_dt
            x, y = pos[..., 0], pos[..., 1]
            if self.x_semidim is not None:
                x = jnp.clip(x, -self.x_semidim, self.x_semidim)
            if self.y_semidim is not None:
                y = jnp.clip(y, -self.y_semidim, self.y_semidim)
            pos = jnp.stack([x, y], axis=-1)
        if spec.rotatable:
            if substep == 0:
                d = spec.drag if spec.drag is not None else self.drag
                ang_vel = ang_vel * (1 - d)
            ang_vel = ang_vel + (torque / spec.moment_of_inertia) * self.sub_dt
            if spec.max_angvel is not None:
                ang_vel = clamp_with_norm(ang_vel, spec.max_angvel)
            rot = rot + ang_vel * self.sub_dt
        return st._replace(pos=pos, vel=vel, rot=rot, ang_vel=ang_vel)
