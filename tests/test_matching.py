"""Matching kernel unit tests against a pure-numpy reference implementation.

The numpy implementation mirrors the reference's matchingCPU math
(line3D.cc:900-1015, mutualOverlap 1086-1165, triangulationDepths 1168-1193)
and plays the role the reference's CPU paths play for its CUDA kernels
(SURVEY.md §4).
"""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.camera import Camera, fundamental_matrix
from line3dpp_tpu.ops import matching
from tests.test_camera import random_camera


# ---------------------------------------------------------------------------
# numpy reference (independent of the JAX kernel)
# ---------------------------------------------------------------------------

def np_mutual_overlap(points):
    """reference: line3D.cc:1086-1165"""
    p1, p2, q1, q2 = [np.asarray(p, dtype=np.float64) for p in points]

    def on_seg(x, a, b):
        return (a[:2] - x[:2]) @ (b[:2] - x[:2]) < 1e-12

    if not (on_seg(p1, q1, q2) or on_seg(p2, q1, q2)
            or on_seg(q1, p1, p2) or on_seg(q2, p1, p2)):
        return 0.0
    pts = [p1, p2, q1, q2]
    dmax, oi, oj = 0.0, 0, 3
    for i in range(3):
        for j in range(i + 1, 4):
            d = np.linalg.norm(pts[i] - pts[j])
            if d > dmax:
                dmax, oi, oj = d, i, j
    if dmax < 1.0:
        return 0.0
    inner = [k for k in range(4) if k not in (oi, oj)]
    return np.linalg.norm(pts[inner[0]] - pts[inner[1]]) / dmax


def np_match_pair(cam1, cam2, segs1, segs2, overlap_t, knn):
    F = fundamental_matrix(cam1, cam2)
    matches = {}
    for r, (x1, y1, x2, y2) in enumerate(segs1):
        p1 = np.array([x1, y1, 1.0])
        p2 = np.array([x2, y2, 1.0])
        e1, e2 = F @ p1, F @ p2
        cand = []
        for c, (u1, v1, u2, v2) in enumerate(segs2):
            q1 = np.array([u1, v1, 1.0])
            q2 = np.array([u2, v2, 1.0])
            l2 = np.cross(q1, q2)
            x1p = np.cross(l2, e1)
            x2p = np.cross(l2, e2)
            if abs(x1p[2]) < 1e-12 or abs(x2p[2]) < 1e-12:
                continue
            x1p = x1p / x1p[2]
            x2p = x2p / x2p[2]
            score = np_mutual_overlap([x1p, x2p, q1, q2])
            if score <= overlap_t:
                continue
            ds = np_triangulation_depths(cam1, p1, p2, cam2, q1, q2)
            dt = np_triangulation_depths(cam2, q1, q2, cam1, p1, p2)
            if all(d > 1e-12 for d in (*ds, *dt)):
                cand.append((score, c, *ds, *dt))
        cand.sort(key=lambda x: -x[0])
        matches[r] = cand[:knn] if knn > 0 else cand
    return matches


def np_triangulation_depths(cam_src, p1, p2, cam_tgt, q1, q2):
    """reference: line3D.cc:1168-1193"""
    C1, C2 = cam_src.C, cam_tgt.C
    rp1, rp2 = cam_src.ray(p1[:2]), cam_src.ray(p2[:2])
    rq1, rq2 = cam_tgt.ray(q1[:2]), cam_tgt.ray(q2[:2])
    n = np.cross(rq1, rq2)
    n /= np.linalg.norm(n)
    if abs(rp1 @ n) < 1e-12 or abs(rp2 @ n) < 1e-12:
        return (-1.0, -1.0)
    d1 = (C2 @ n - n @ C1) / (n @ rp1)
    d2 = (C2 @ n - n @ C1) / (n @ rp2)
    return (d1, d2)


# ---------------------------------------------------------------------------

def make_scene(rng, n_lines=40):
    """Two cameras looking at random 3D segments; project to 2D segments."""
    cam1 = Camera(
        np.array([[1000.0, 0, 960], [0, 1000.0, 540], [0, 0, 1]]),
        np.eye(3), np.zeros(3), 1920, 1080,
    )
    from line3dpp_tpu.camera import rotation_from_rpy
    R2 = rotation_from_rpy(0.02, -0.25, 0.01)
    C2 = np.array([1.5, 0.1, 0.0])
    cam2 = Camera(cam1.K, R2, -R2 @ C2, 1920, 1080)

    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.5, 1.5, size=(n_lines, 1))

    segs1 = np.hstack([cam1.project(P), cam1.project(Q)])
    segs2 = np.hstack([cam2.project(P), cam2.project(Q)])
    return cam1, cam2, segs1, segs2


def run_jax_match(cam1, cam2, segs1, segs2, overlap_t=0.25, knn=10, S=64):
    F = fundamental_matrix(cam1, cam2).astype(np.float32)
    s1 = np.zeros((S, 4), np.float32)
    s2 = np.zeros((S, 4), np.float32)
    m1 = np.zeros(S, bool)
    m2 = np.zeros(S, bool)
    s1[: len(segs1)] = segs1
    m1[: len(segs1)] = True
    s2[: len(segs2)] = segs2
    m2[: len(segs2)] = True
    res = matching.match_pair(
        jnp.asarray(s1), jnp.asarray(m1), jnp.asarray(s2), jnp.asarray(m2),
        jnp.asarray(F),
        jnp.asarray(cam1.RtKinv.astype(np.float32)),
        jnp.asarray(cam2.RtKinv.astype(np.float32)),
        jnp.asarray(cam1.C.astype(np.float32)),
        jnp.asarray(cam2.C.astype(np.float32)),
        overlap_t, knn,
    )
    return res


def test_matching_agrees_with_numpy_reference(rng):
    cam1, cam2, segs1, segs2 = make_scene(rng)
    ref = np_match_pair(cam1, cam2, segs1, segs2, 0.25, 10)
    res = run_jax_match(cam1, cam2, segs1, segs2)

    tgt = np.asarray(res.tgt_seg)
    ov = np.asarray(res.overlap)
    valid = np.asarray(res.valid)
    depths = np.stack([np.asarray(res.d_p1), np.asarray(res.d_p2),
                       np.asarray(res.d_q1), np.asarray(res.d_q2)], axis=-1)

    for r in range(len(segs1)):
        got = {int(tgt[r, i]): (ov[r, i], depths[r, i])
               for i in range(tgt.shape[1]) if valid[r, i]}
        want = {c: (s, (d1, d2, d3, d4)) for (s, c, d1, d2, d3, d4) in ref[r]}
        assert set(got) == set(want), f"row {r}: {set(got)} vs {set(want)}"
        for c, (s, dd) in want.items():
            assert abs(got[c][0] - s) < 1e-3
            np.testing.assert_allclose(got[c][1], dd, rtol=2e-3)


def test_matching_finds_true_correspondences(rng):
    cam1, cam2, segs1, segs2 = make_scene(rng)
    res = run_jax_match(cam1, cam2, segs1, segs2)
    tgt = np.asarray(res.tgt_seg)
    valid = np.asarray(res.valid)
    # the true correspondence (r -> r) must be among the kNN for most rows
    hit = sum(
        1 for r in range(len(segs1))
        if any(valid[r, i] and tgt[r, i] == r for i in range(tgt.shape[1]))
    )
    assert hit > 0.9 * len(segs1)


def test_matching_true_depths_accurate(rng):
    cam1, cam2, segs1, segs2 = make_scene(rng, n_lines=20)
    # recompute the true endpoint depths for row->row matches
    res = run_jax_match(cam1, cam2, segs1, segs2, S=32)
    tgt = np.asarray(res.tgt_seg)
    valid = np.asarray(res.valid)
    depths = np.stack([np.asarray(res.d_p1), np.asarray(res.d_p2),
                       np.asarray(res.d_q1), np.asarray(res.d_q2)], axis=-1)
    for r in range(20):
        for i in range(tgt.shape[1]):
            if valid[r, i] and tgt[r, i] == r:
                d1, d2 = np_triangulation_depths(
                    cam1,
                    np.append(segs1[r, :2], 1), np.append(segs1[r, 2:], 1),
                    cam2,
                    np.append(segs2[r, :2], 1), np.append(segs2[r, 2:], 1),
                )
                np.testing.assert_allclose(depths[r, i, 0], d1, rtol=1e-3)
                np.testing.assert_allclose(depths[r, i, 1], d2, rtol=1e-3)
