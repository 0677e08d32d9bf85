"""Collinearity analysis tests (reference: view.cc:212-264)."""

import numpy as np
import jax.numpy as jnp

import line3dpp_tpu as l3d
from line3dpp_tpu.ops import collinearity


def test_collinear_pairs_basic():
    segs = np.array([
        [10.0, 50.0, 100.0, 50.0],    # 0: on y=50
        [150.0, 50.0, 250.0, 50.0],   # 1: collinear with 0, disjoint
        [40.0, 50.0, 160.0, 50.0],    # 2: collinear but OVERLAPS 0 and 1
        [10.0, 80.0, 100.0, 80.0],    # 3: parallel but 30px away
        [50.0, 10.0, 50.0, 120.0],    # 4: perpendicular
    ], np.float32)
    mask = np.ones(5, bool)
    out = np.asarray(collinearity.collinear_pairs_one(
        jnp.asarray(segs), jnp.asarray(mask), 2.0))

    assert out[0, 1] and out[1, 0]          # disjoint collinear pair
    assert not out[0, 2] and not out[1, 2]  # overlap disqualifies
    assert not out[0, 3]                    # 30px offset > 2px tolerance
    assert not out[0, 4]                    # perpendicular
    assert not out.diagonal().any()


def test_pipeline_with_collinearity_runs(rng):
    from line3dpp_tpu.camera import rotation_from_rpy

    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    # one long 3D line observed as two broken halves in every view
    P = np.array([[-1.5, 0.0, 8.0]])
    Q = np.array([[1.5, 0.0, 8.0]])
    mid1 = P + (Q - P) * 0.45
    mid2 = P + (Q - P) * 0.55
    extra_P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(6, 3))
    extra_d = rng.normal(size=(6, 3))
    extra_d /= np.linalg.norm(extra_d, axis=1, keepdims=True)
    extra_Q = extra_P + extra_d

    cams = []
    for i in range(5):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.05 * i + 0.12,
                              rng.normal() * 0.02)
        C = np.array([0.5 * i - 1.2, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))

    pipe = l3d.Line3D(l3d.Config(num_neighbors=4, max_line_segments=50,
                                 optimize=False, collinearity_t=2.0))
    for i, cam in enumerate(cams):
        halves = np.vstack([
            np.hstack([cam.project(P), cam.project(mid1)]),
            np.hstack([cam.project(mid2), cam.project(Q)]),
            np.hstack([cam.project(extra_P), cam.project(extra_Q)]),
        ])
        pipe.add_view(i, cam, halves)

    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) > 0

    # the two broken halves must end up in one cluster: some reconstructed
    # line should carry residuals from both segment 0 and 1 of a view
    merged = any(
        {0, 1} <= {int(r[1]) for r in l.residuals if True}
        for l in lines
    )
    assert merged, "collinear halves were not clustered together"
