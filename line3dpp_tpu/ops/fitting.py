"""Cluster -> 3D line fitting.

Each cluster of 2D segments (with 3D hypotheses) becomes one infinite 3D line:
center of gravity of all hypothesis endpoints + dominant eigenvector of the
scatter matrix (reference: get3DlineFromCluster line3D.cc:2155-2218, which
uses an Eigen SVD per cluster).

TPU-first design: all clusters are fit at once — endpoint sums and scatter
matrices accumulate with ``segment_sum`` over a flat member-point array, then
one batched ``jnp.linalg.eigh`` over [C, 3, 3] extracts every dominant
direction simultaneously.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class ClusterLines(NamedTuple):
    P1: jnp.ndarray      # (C, 3)  line point  COG - dir
    P2: jnp.ndarray      # (C, 3)  line point  COG + dir
    valid: jnp.ndarray   # (C,)


def fit_lines_np(points, cluster_id, num_clusters: int) -> ClusterLines:
    """Host (numpy) variant of :func:`fit_lines` for small member sets.

    The cluster count changes every run; on remote-compile TPU backends a
    fresh jit per shape costs far more than the O(members) host compute, so
    the pipeline uses this path (the jax variant serves sharded callers)."""
    import numpy as np

    pts = np.asarray(points, np.float64)
    cid = np.asarray(cluster_id, np.int64)
    counts = np.bincount(cid, minlength=num_clusters).astype(np.float64)
    sums = np.zeros((num_clusters, 3))
    np.add.at(sums, cid, pts)
    cog = sums / np.maximum(counts, 1.0)[:, None]

    outer = pts[:, :, None] * pts[:, None, :]
    sum_outer = np.zeros((num_clusters, 9))
    np.add.at(sum_outer, cid, outer.reshape(-1, 9))
    scat = sum_outer.reshape(-1, 3, 3) - counts[:, None, None] * (
        cog[:, :, None] * cog[:, None, :])

    _, vecs = np.linalg.eigh(scat)
    direction = vecs[:, :, 2]
    nrm = np.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / np.maximum(nrm, 1e-12)
    return ClusterLines(P1=cog - direction, P2=cog + direction,
                        valid=counts >= 2.0)


def project_members_onto_lines_np(line_P1, line_dir, cam_C, ray1, ray2):
    """Host (numpy) variant of :func:`project_members_onto_lines`."""
    import numpy as np

    line_P1 = np.asarray(line_P1, np.float64)
    line_dir = np.asarray(line_dir, np.float64)
    cam_C = np.asarray(cam_C, np.float64)

    def params(v):
        v = np.asarray(v, np.float64)
        w = line_P1 - cam_C
        a = np.sum(line_dir * line_dir, -1)
        b = np.sum(line_dir * v, -1)
        c = np.sum(v * v, -1)
        d = np.sum(line_dir * w, -1)
        e = np.sum(v * w, -1)
        denom = a * c - b * b
        ok = np.abs(denom) > 1e-12
        s = (b * e - c * d) / np.where(ok, denom, 1.0)
        return s, ok

    s1, ok1 = params(ray1)
    s2, ok2 = params(ray2)
    return s1, s2, ok1 & ok2


def fit_lines(
    points: jnp.ndarray,       # (N, 3) hypothesis endpoints (2 per member)
    cluster_id: jnp.ndarray,   # (N,) int32 cluster index per point
    num_clusters: int,
) -> ClusterLines:
    cid = cluster_id.astype(jnp.int32)
    ones = jnp.ones_like(points[:, 0])
    counts = jax.ops.segment_sum(ones, cid, num_clusters)            # (C,)
    sums = jax.ops.segment_sum(points, cid, num_clusters)            # (C, 3)
    cog = sums / jnp.maximum(counts, 1.0)[:, None]

    # scatter = sum (x - mu)(x - mu)^T = sum x x^T - n mu mu^T
    outer = points[:, :, None] * points[:, None, :]                  # (N, 3, 3)
    sum_outer = jax.ops.segment_sum(outer.reshape(-1, 9), cid, num_clusters)
    scat = sum_outer.reshape(-1, 3, 3) - counts[:, None, None] * (
        cog[:, :, None] * cog[:, None, :]
    )

    # dominant eigenvector of each symmetric 3x3 scatter matrix
    _, vecs = jnp.linalg.eigh(scat)          # ascending eigenvalues
    direction = vecs[:, :, 2]                # (C, 3)
    nrm = jnp.linalg.norm(direction, axis=-1, keepdims=True)
    direction = direction / jnp.maximum(nrm, 1e-12)

    valid = counts >= 2.0
    return ClusterLines(P1=cog - direction, P2=cog + direction, valid=valid)


def project_members_onto_lines(
    line_P1: jnp.ndarray,    # (N, 3) per-member cluster-line point
    line_dir: jnp.ndarray,   # (N, 3) per-member cluster-line unit direction
    cam_C: jnp.ndarray,      # (N, 3) member camera center
    ray1: jnp.ndarray,       # (N, 3) member segment endpoint-1 ray
    ray2: jnp.ndarray,       # (N, 3) member segment endpoint-2 ray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Line parameters (s1, s2) of each member 2D segment projected onto its
    cluster's 3D line + validity (reference: project2DsegmentOnto3Dline
    line3D.cc:2221-2266).

    Closest point on line (P, u) to the ray (C, v):  s = (b e - c d)/(a c - b²).
    """
    def params(v):
        w = line_P1 - cam_C
        a = jnp.sum(line_dir * line_dir, -1)
        b = jnp.sum(line_dir * v, -1)
        c = jnp.sum(v * v, -1)
        d = jnp.sum(line_dir * w, -1)
        e = jnp.sum(v * w, -1)
        denom = a * c - b * b
        ok = jnp.abs(denom) > 1e-12
        s = (b * e - c * d) / jnp.where(ok, denom, 1.0)
        return s, ok

    s1, ok1 = params(ray1)
    s2, ok2 = params(ray2)
    return s1, s2, ok1 & ok2
