"""Degenerate-geometry robustness: the pipeline must degrade gracefully
(the reference prints warnings and early-returns in these regimes)."""

import numpy as np

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy

K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])


def _lines(rng, n=8):
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n, 3))
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return P, P + d


def test_zero_baseline_yields_nothing(rng):
    P, Q = _lines(rng)
    pipe = l3d.Line3D(l3d.Config(num_neighbors=3, max_line_segments=50,
                                 optimize=False))
    for i in range(4):
        R = rotation_from_rpy(0, 0.02 * i, 0)
        cam = l3d.Camera(K, R, np.zeros(3), 1920, 1080)  # all centers at 0
        pipe.add_view(i, cam, np.hstack([cam.project(P), cam.project(Q)]))
    pipe.match_images()
    assert pipe.reconstruct_3d_lines() == []


def test_duplicate_segments_no_crash(rng):
    P, Q = _lines(rng)
    pipe = l3d.Line3D(l3d.Config(num_neighbors=3, max_line_segments=50,
                                 optimize=False))
    for i in range(4):
        R = rotation_from_rpy(0, -0.05 * i + 0.1, 0)
        C = np.array([0.5 * i - 0.8, 0, 0])
        cam = l3d.Camera(K, R, -R @ C, 1920, 1080)
        segs = np.hstack([cam.project(P), cam.project(Q)])
        pipe.add_view(i, cam, np.vstack([segs, segs]))
    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) >= 6
    for l in lines:
        assert np.isfinite(l.segments3d).all()


def test_min_image_width_rejected(capsys):
    """Images narrower than min_image_width are skipped with a warning
    (reference: line3D.cc:119-126)."""
    pipe = l3d.Line3D(l3d.Config())
    cam = l3d.Camera(K, np.eye(3), np.zeros(3), 400, 300)
    img = np.zeros((300, 400), np.uint8)
    pipe.add_image(0, cam, img)
    assert 0 not in pipe._views
    assert "too small" in capsys.readouterr().out
