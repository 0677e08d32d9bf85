"""Batched 3D/2D geometry primitives (JAX, float32).

These are the vectorized equivalents of the reference's per-entity Eigen math
(reference: view.cc:317-371 rays/unprojection, segment3D.h:68-73 point-to-line
distance, line3D.cc:1571-1583 undirected segment angle).  Everything operates
on arbitrarily-batched leading dimensions so the same code serves single-view
tests and [V,S,...] pipeline tensors.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-12


def normalize(v: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    return v / jnp.maximum(jnp.linalg.norm(v, axis=axis, keepdims=True), EPS)


def rays_from_pixels(RtKinv: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Normalized viewing rays for pixels.

    RtKinv: (..., 3, 3), xy: (..., 2) -> (..., 3)
    (reference: view.cc:317-327)
    """
    ph = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    ray = jnp.einsum("...ij,...j->...i", RtKinv, ph,
                     precision=jax.lax.Precision.HIGHEST)
    return normalize(ray)


def segment_rays(RtKinv: jnp.ndarray, segments: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays through both endpoints of 2D segments (..., 4) -> two (..., 3)."""
    r1 = rays_from_pixels(RtKinv, segments[..., 0:2])
    r2 = rays_from_pixels(RtKinv, segments[..., 2:4])
    return r1, r2


def unproject(C: jnp.ndarray, ray: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """3D point at given depth along a normalized ray (view.cc:356-371)."""
    return C + ray * depth[..., None]


def seg3d_dir(P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    return normalize(P2 - P1)


def seg3d_length(P1: jnp.ndarray, P2: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.norm(P2 - P1, axis=-1)


def angle_deg_undirected(d1: jnp.ndarray, d2: jnp.ndarray) -> jnp.ndarray:
    """Undirected angle between unit directions, in degrees
    (reference: line3D.cc:1571-1583)."""
    dot = jnp.clip(jnp.sum(d1 * d2, axis=-1), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(dot))
    return jnp.where(ang > 90.0, 180.0 - ang, ang)


def point_to_line_dist(P: jnp.ndarray, L1: jnp.ndarray, Ldir: jnp.ndarray) -> jnp.ndarray:
    """Distance of point(s) P to the infinite line through L1 with unit dir Ldir
    (reference: segment3D.h:68-73)."""
    w = P - L1
    proj = jnp.sum(w * Ldir, axis=-1, keepdims=True) * Ldir
    return jnp.linalg.norm(w - proj, axis=-1)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def line_through(p: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Homogeneous 2D line through two homogeneous points."""
    return jnp.cross(p, q)


def project_points(K: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray,
                   X: jnp.ndarray) -> jnp.ndarray:
    """Project world points (...,3) into pixels (...,2) (view.cc:374-392)."""
    q = jnp.einsum("...ij,...j->...i", R, X,
                   precision=jax.lax.Precision.HIGHEST) + t
    q = q / jnp.where(jnp.abs(q[..., 2:3]) > EPS, q[..., 2:3], EPS)
    uv = jnp.einsum("...ij,...j->...i", K, q,
                    precision=jax.lax.Precision.HIGHEST)
    return uv[..., :2] / jnp.where(jnp.abs(uv[..., 2:3]) > EPS, uv[..., 2:3], EPS)


def closest_point_params_line_to_ray(
    P: jnp.ndarray, u: jnp.ndarray, Q: jnp.ndarray, v: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Parameter s along line (P, u) of the closest point to the ray (Q, v),
    and validity mask.  Mirrors project2DsegmentOnto3Dline
    (reference: line3D.cc:2221-2266).

    Returns (s, valid) with closest point = P + s*u.
    """
    w = P - Q
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    denom = a * c - b * b
    valid = jnp.abs(denom) > EPS
    s = (b * e - c * d) / jnp.where(valid, denom, 1.0)
    return s, valid
