"""Obstacles: rotated rectangles (2D), quaternion cuboids and spheres (3D).

Behavioral parity reference: /root/reference/dgppo/env/obstacle.py:30-285.
All are NamedTuples of arrays so a set of obstacles can be tree-stacked and
used under vmap/jit. Raytracing returns the fractional distance alpha in
[0, 1] along the ray to the closest hit (1e6 if no hit), with the same
determinant clamping (sign * clip(|det|, 1e-7, 1e7)) the reference uses as a
numerical guard (obstacle.py:98-99, 214-215).
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.spatial.transform import Rotation

from ..utils.typing import Array, BoolScalar, Pos, Radius

RECTANGLE = jnp.zeros(1)
CUBOID = jnp.ones(1)
SPHERE = jnp.ones(1) * 2


def _clamp_det(det: Array) -> Array:
    return jnp.sign(det) * jnp.clip(jnp.abs(det), 1e-7, 1e7)


class Rectangle(NamedTuple):
    """2D rotated rectangle; `points` are the 4 corners (4, 2)."""

    type: Array
    center: Array
    width: Array
    height: Array
    theta: Array
    points: Array

    @staticmethod
    def create(center: Pos, width, height, theta) -> "Rectangle":
        half = jnp.array(
            [[width / 2, height / 2], [-width / 2, height / 2],
             [-width / 2, -height / 2], [width / 2, -height / 2]]
        )  # (4, 2)
        c, s = jnp.cos(theta), jnp.sin(theta)
        rot = jnp.array([[c, -s], [s, c]])
        points = half @ rot.T + center[None, :]
        return Rectangle(RECTANGLE, center, width, height, theta, points)

    @property
    def n(self) -> int:
        return self.center.shape[0]

    def inside(self, point: Pos, r: Radius = 0.0) -> BoolScalar:
        """Point within distance r of the rectangle (rounded-corner metric)."""
        rel = point - self.center
        c, s = jnp.cos(self.theta), jnp.sin(self.theta)
        rel_xx = jnp.abs(rel[0] * c + rel[1] * s) - self.width / 2
        rel_yy = jnp.abs(rel[0] * s - rel[1] * c) - self.height / 2
        is_in_down = (rel_xx < r) & (rel_yy < 0)
        is_in_up = (rel_xx < 0) & (rel_yy < r)
        is_corner = (rel_xx > 0) & (rel_yy > 0) & (jnp.sqrt(rel_xx**2 + rel_yy**2) < r)
        return is_in_down | is_in_up | is_corner

    def raytracing(self, start: Pos, end: Pos) -> Array:
        """Min alpha over the 4 edges via per-edge 2x2 solves."""
        p3 = self.points  # (4, 2) edge start
        p4 = self.points[jnp.array([-1, 0, 1, 2])]  # (4, 2) edge end
        d_ray = start - end  # (2,)
        d_edge = p4 - p3  # (4, 2)
        rhs = start[None, :] - p3  # (4, 2)

        det = d_ray[0] * d_edge[:, 1] - d_ray[1] * d_edge[:, 0]
        det = _clamp_det(det)
        alphas = (d_edge[:, 1] * rhs[:, 0] - d_edge[:, 0] * rhs[:, 1]) / det
        betas = (-d_ray[1] * rhs[:, 0] + d_ray[0] * rhs[:, 1]) / det
        valid = (alphas >= 0) & (alphas <= 1) & (betas >= 0) & (betas <= 1)
        return jnp.min(jnp.where(valid, alphas, 1e6))


class Cuboid(NamedTuple):
    """3D quaternion-rotated cuboid; `points` are the 8 corners (8, 3)."""

    type: Array
    center: Array
    length: Array
    width: Array
    height: Array
    rot_matrix: Array  # (3, 3) — stored as a matrix (pytree-friendly)
    points: Array

    @staticmethod
    def create(center: Pos, length, width, height, quaternion) -> "Cuboid":
        signs = jnp.array(
            [[-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
             [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]],
            dtype=jnp.float32,
        )
        bbox = signs * jnp.array([length / 2, width / 2, height / 2])
        rotation = Rotation.from_quat(quaternion)
        points = rotation.apply(bbox) + center
        return Cuboid(CUBOID, center, length, width, height, rotation.as_matrix(), points)

    @property
    def n(self) -> int:
        return self.center.shape[0]

    def inside(self, point: Pos, r: Radius = 0.0) -> BoolScalar:
        # Reference-faithful, including its quirks (obstacle.py:139-173):
        # the frame transform uses jnp.linalg.inv(rot) (not the orthogonal
        # transpose), and the edge-proximity check below compares the
        # CUBOID-frame point against WORLD-frame edge geometry — a reference
        # frame-mixing bug reproduced on purpose so any future 3D env stays
        # decision-for-decision identical under golden tests.
        p = jnp.dot(jnp.linalg.inv(self.rot_matrix), point - self.center)
        hl, hw, hh = self.length / 2, self.width / 2, self.height / 2
        in_h = (-hl < p[0]) & (p[0] < hl) & (-hw < p[1]) & (p[1] < hw) & (-hh - r < p[2]) & (p[2] < hh + r)
        in_l = (-hl - r < p[0]) & (p[0] < hl + r) & (-hw < p[1]) & (p[1] < hw) & (-hh < p[2]) & (p[2] < hh)
        in_w = (-hl < p[0]) & (p[0] < hl) & (-hw - r < p[1]) & (p[1] < hw + r) & (-hh < p[2]) & (p[2] < hh)
        is_in = in_h | in_l | in_w

        edge_order = jnp.array(
            [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
             [0, 4], [1, 5], [2, 6], [3, 7]]
        )
        edges = self.points[edge_order]  # (12, 2, 3)

        def near_edge(edge):
            seg = edge[1] - edge[0]
            frac = jnp.clip(jnp.dot(seg, p - edge[0]) / (jnp.linalg.norm(seg) ** 2), 0, 1)
            closest = edge[0] + frac * seg
            return jnp.linalg.norm(closest - p) <= r

        return is_in | jnp.any(jax.vmap(near_edge)(edges))

    def raytracing(self, start: Pos, end: Pos) -> Array:
        """Min alpha over the 6 faces, each parameterized by corner + 2 edges.

        Solves the 3x3 system [d_ray | e1 | e2] [alpha beta gamma]^T = rhs via
        the adjugate (reference obstacle.py:211-233), vectorized over faces.
        """
        # Face corner / edge-endpoint index triples (reference obstacle.py:183-193).
        i3 = jnp.array([0, 0, 0, 6, 6, 6])
        i4 = jnp.array([1, 1, 3, 5, 5, 7])
        i5 = jnp.array([3, 4, 4, 7, 2, 2])
        p3, p4, p5 = self.points[i3], self.points[i4], self.points[i5]  # (6, 3)

        # Explicit adjugate solve with the reference's exact expression order
        # (obstacle.py:211-233) so alphas are BITWISE identical — a cross-
        # product reformulation measured up to 1.2e-7 drift, enough to flip
        # knife-edge validity checks and top-k tie orders vs the oracle.
        x1, y1, z1 = start[0], start[1], start[2]
        x2, y2, z2 = end[0], end[1], end[2]
        x3, y3, z3 = p3[:, 0], p3[:, 1], p3[:, 2]
        x4, y4, z4 = p4[:, 0], p4[:, 1], p4[:, 2]
        x5, y5, z5 = p5[:, 0], p5[:, 1], p5[:, 2]

        det = (x1 - x2) * (y4 - y3) * (z5 - z3) + (x4 - x3) * (y5 - y3) * (z1 - z2) + (y1 - y2) * (z4 - z3) * (
            x5 - x3) - (y1 - y2) * (x4 - x3) * (z5 - z3) - (z4 - z3) * (y5 - y3) * (x1 - x2) - (x5 - x3) * (
            y4 - y3) * (z1 - z2)
        det = _clamp_det(det)
        adj_00 = (y4 - y3) * (z5 - z3) - (y5 - y3) * (z4 - z3)
        adj_01 = -((x4 - x3) * (z5 - z3) - (z4 - z3) * (x5 - x3))
        adj_02 = (x4 - x3) * (y5 - y3) - (y4 - y3) * (x5 - x3)
        adj_10 = -((y1 - y2) * (z5 - z3) - (z1 - z2) * (y5 - y3))
        adj_11 = (x1 - x2) * (z5 - z3) - (z1 - z2) * (x5 - x3)
        adj_12 = -((x1 - x2) * (y5 - y3) - (y1 - y2) * (x5 - x3))
        adj_20 = (y1 - y2) * (z4 - z3) - (y4 - y3) * (z1 - z2)
        adj_21 = -((x1 - x2) * (z4 - z3) - (z1 - z2) * (x4 - x3))
        adj_22 = (x1 - x2) * (y4 - y3) - (y1 - y2) * (x4 - x3)
        alphas = 1 / det * (adj_00 * (x1 - x3) + adj_01 * (y1 - y3) + adj_02 * (z1 - z3))
        betas = 1 / det * (adj_10 * (x1 - x3) + adj_11 * (y1 - y3) + adj_12 * (z1 - z3))
        gammas = 1 / det * (adj_20 * (x1 - x3) + adj_21 * (y1 - y3) + adj_22 * (z1 - z3))
        valid = (
            (alphas >= 0) & (alphas <= 1) & (betas >= 0) & (betas <= 1) & (gammas >= 0) & (gammas <= 1)
        )
        return jnp.min(jnp.where(valid, alphas, 1e6))


class Sphere(NamedTuple):
    type: Array
    center: Array
    radius: Array

    @staticmethod
    def create(center: Pos, radius) -> "Sphere":
        return Sphere(SPHERE, center, radius)

    @property
    def n(self) -> int:
        return self.center.shape[0]

    def inside(self, point: Pos, r: Radius = 0.0) -> BoolScalar:
        return jnp.linalg.norm(point - self.center) <= self.radius + r

    def raytracing(self, start: Pos, end: Pos) -> Array:
        """Quadratic ray-sphere solve, expression-order faithful to the
        reference (obstacle.py:252-285) for bitwise alphas — `sum(d*d)`-style
        contractions measured up to 1.5e-6 drift vs the reference's explicit
        per-coordinate arithmetic."""
        x1, y1, z1 = start[0], start[1], start[2]
        x2, y2, z2 = end[0], end[1], end[2]
        xc, yc, zc = self.center[0], self.center[1], self.center[2]
        r = self.radius

        lidar_rmax = jnp.linalg.norm(end - start)
        A = lidar_rmax**2
        B = 2 * ((x2 - x1) * (x1 - xc) + (y2 - y1) * (y1 - yc) + (z2 - z1) * (z1 - zc))
        C = (x1 - xc) ** 2 + (y1 - yc) ** 2 + (z1 - zc) ** 2 - r**2

        delta = B**2 - 4 * A * C
        valid = delta >= 0
        sq = jnp.sqrt(delta * valid)
        a1 = jnp.where(valid, (-B - sq) / (2 * A), 1.0)
        a2 = jnp.where(valid, (-B + sq) / (2 * A), 1.0)
        a1 = jnp.where(a1 >= 0, a1, 1.0)
        a2 = jnp.where(a2 >= 0, a2, 1.0)
        alpha = jnp.clip(jnp.minimum(a1, a2), 0, 1)
        return jnp.where(valid, alpha, 1e6)
