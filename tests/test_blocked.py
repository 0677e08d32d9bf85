"""Blocked large-scene matching must reproduce the fused-step pipeline."""

import numpy as np

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy


def _scene(rng, V=9, n_lines=14):
    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))
    cams = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.04 * i + 0.15,
                              rng.normal() * 0.02)
        C = np.array([0.4 * i - 1.6, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))
    return cams, P, Q


def _run(cfg, cams, P, Q, rng):
    pipe = l3d.Line3D(cfg)
    for i, cam in enumerate(cams):
        segs = np.hstack([cam.project(P), cam.project(Q)])
        junk = rng.uniform([0, 0, 0, 0], [1920, 1080, 1920, 1080], size=(4, 4))
        pipe.add_view(i, cam, np.vstack([segs, junk]))
    pipe.match_images()
    return pipe.reconstruct_3d_lines()


def test_blocked_equals_fused(rng):
    cams, P, Q = _scene(rng)
    base = dict(num_neighbors=4, max_line_segments=64, optimize=False)
    rng1 = np.random.default_rng(7)
    rng2 = np.random.default_rng(7)
    lines_fused = _run(l3d.Config(**base), cams, P, Q, rng1)
    lines_blocked = _run(l3d.Config(**base, view_block=4), cams, P, Q, rng2)

    assert len(lines_fused) > 0
    assert len(lines_blocked) == len(lines_fused)
    a = np.sort(np.concatenate([l.segments3d for l in lines_fused]), axis=0)
    b = np.sort(np.concatenate([l.segments3d for l in lines_blocked]), axis=0)
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)
