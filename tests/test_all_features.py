"""All optional features composed: blocked matching + collinearity edges +
RDD diffusion + LM bundling in one run must still reconstruct the scene."""

import numpy as np

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy
from line3dpp_tpu.utils.golden import segment_set_metrics


def test_all_features_compose(rng):
    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(10, 3))
    d = rng.normal(size=(10, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d

    pipe = l3d.Line3D(l3d.Config(
        num_neighbors=4, max_line_segments=64, optimize=True,
        view_block=3, collinearity_t=2.0, perform_rdd=True))
    for i in range(9):
        R = rotation_from_rpy(0, -0.04 * i + 0.15, 0)
        C = np.array([0.4 * i - 1.6, 0, 0])
        cam = l3d.Camera(K, R, -R @ C, 1920, 1080)
        pipe.add_view(i, cam, np.hstack([cam.project(P), cam.project(Q)]))

    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) >= 8
    m = segment_set_metrics(
        np.concatenate([l.segments3d for l in lines]), np.hstack([P, Q]),
        tol=0.05)
    assert m["recall"] > 0.9 and m["precision"] > 0.9, m
