"""Pipeline smoke/parity tests for the less-traveled reference config modes:
metric sigma_p (< 0), explicit neighbor lists, and RDD-enabled clustering."""

import numpy as np

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy
from line3dpp_tpu.utils.golden import segment_set_metrics


def _scene(rng, V=6, n_lines=10):
    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))
    cams = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.05 * i + 0.12,
                              rng.normal() * 0.02)
        C = np.array([0.5 * i - 1.2, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080,
                               median_depth=8.0))
    return cams, P, Q


def _drive(cfg, cams, P, Q, fixed_neighbors=False):
    pipe = l3d.Line3D(cfg)
    for i, cam in enumerate(cams):
        pipe.add_view(i, cam, np.hstack([cam.project(P), cam.project(Q)]))
    if fixed_neighbors:
        V = len(cams)
        for i in range(V):
            pipe.set_visual_neighbors(
                i, [j for j in range(V) if j != i][: cfg.num_neighbors])
    pipe.match_images()
    return pipe.reconstruct_3d_lines()


def _check(lines, P, Q, n_min):
    assert len(lines) >= n_min
    pred = np.concatenate([l.segments3d for l in lines])
    m = segment_set_metrics(pred, np.hstack([P, Q]), tol=0.05)
    assert m["recall"] > 0.9, m


def test_metric_sigma_mode(rng):
    cams, P, Q = _scene(rng)
    # sigma_p < 0: metric regularization using per-camera median depths
    # (reference: view.h:108-127, main flag -p negative)
    cfg = l3d.Config(num_neighbors=4, max_line_segments=64, optimize=False,
                     sigma_p=-0.05)
    _check(_drive(cfg, cams, P, Q), P, Q, 8)


def test_fixed_neighbors_mode(rng):
    cams, P, Q = _scene(rng)
    cfg = l3d.Config(num_neighbors=3, max_line_segments=64, optimize=False)
    _check(_drive(cfg, cams, P, Q, fixed_neighbors=True), P, Q, 8)


def test_rdd_enabled_pipeline(rng):
    cams, P, Q = _scene(rng)
    cfg = l3d.Config(num_neighbors=4, max_line_segments=64, optimize=False,
                     perform_rdd=True)
    _check(_drive(cfg, cams, P, Q), P, Q, 8)


def test_knn_all_matches_mode(rng):
    # kNN=-1 keeps ALL valid matches — every target segment gets a slot,
    # exactly as the reference (README.md:246, line3D.cc:973-988)
    cams, P, Q = _scene(rng)
    cfg = l3d.Config(num_neighbors=4, max_line_segments=64, optimize=False,
                     knn=-1)
    assert cfg.knn_effective == cfg.num_segments
    _check(_drive(cfg, cams, P, Q), P, Q, 8)


def test_knn_all_matches_keeps_every_valid_match(rng):
    """With knn<=0 (k = S slots) the matcher must contain every
    numpy-reference valid match, not a truncated top-k
    (reference: line3D.cc:973-988 pushes every candidate when kNN<=0)."""
    from tests.test_matching import make_scene, np_match_pair, run_jax_match

    cam1, cam2, segs1, segs2 = make_scene(rng)
    S = 64
    ref = np_match_pair(cam1, cam2, segs1, segs2, 0.25, -1)
    res = run_jax_match(cam1, cam2, segs1, segs2, knn=S, S=S)

    tgt = np.asarray(res.tgt_seg)
    valid = np.asarray(res.valid)
    got = {(r, int(tgt[r, j])) for r in range(S) for j in range(S)
           if valid[r, j]}
    want = {(r, c) for r, cand in ref.items() for (_, c, *rest) in cand}
    assert want, "reference matcher found no matches — bad fixture"
    assert want == got
