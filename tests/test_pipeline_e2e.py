"""Synthetic end-to-end pipeline test through the public API
(the fast counterpart of tools/drive_synthetic.py and the golden e2e)."""

import numpy as np

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy
from line3dpp_tpu.utils.golden import segment_set_metrics


def test_synthetic_reconstruction(rng, tmp_path):
    n_lines = 12
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))

    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    cams = []
    for i in range(6):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.06 * i + 0.15,
                              rng.normal() * 0.02)
        C = np.array([0.6 * i - 1.5, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))

    pipe = l3d.Line3D(l3d.Config(num_neighbors=5, max_line_segments=100,
                                 optimize=False))
    for i, cam in enumerate(cams):
        segs = np.hstack([cam.project(P), cam.project(Q)])
        junk = rng.uniform([0, 0, 0, 0], [1920, 1080, 1920, 1080], size=(5, 4))
        pipe.add_view(i, cam, np.vstack([segs, junk]))

    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) >= n_lines * 0.8

    gt = np.hstack([P, Q])
    pred = np.concatenate([l.segments3d for l in lines])
    m = segment_set_metrics(pred, gt, tol=0.05)
    assert m["recall"] > 0.95 and m["precision"] > 0.95, m

    # writers round-trip
    pipe.save_txt(str(tmp_path / "o.txt"))
    pipe.save_bin(str(tmp_path / "o.bin"))
    from line3dpp_tpu.utils.writers import load_bin
    from line3dpp_tpu.utils.golden import parse_lines3d_txt

    assert len(parse_lines3d_txt(str(tmp_path / "o.txt"))) == len(lines)
    back = load_bin(str(tmp_path / "o.bin"))
    assert len(back) == len(lines)
    np.testing.assert_allclose(back[0].segments3d, lines[0].segments3d)


def test_add_images_matches_add_image(rng, tmp_path):
    """Batched ingestion (pipelined detect + mixed cache hits) must register
    exactly the same views as per-image add_image calls."""
    imgs = []
    for i in range(3):
        img = rng.uniform(0, 8, size=(900, 1200)).astype(np.float32)
        # a few strong synthetic edges so detection finds something
        img[200 + 40 * i : 203 + 40 * i, 100:1100] = 200.0
        img[500:504, 200 + 50 * i : 900 + 50 * i] = 180.0
        imgs.append(img)
    K = np.array([[1000.0, 0, 600], [0, 1000.0, 450], [0, 0, 1]])
    cams = [l3d.Camera(K, np.eye(3), np.array([0.3 * i, 0, 0]), 1200, 900)
            for i in range(3)]

    cache = str(tmp_path / "cache")
    cfg = l3d.Config(max_line_segments=100)
    ref = l3d.Line3D(cfg)
    for i in range(3):
        ref.add_image(i, cams[i], imgs[i], cache_dir=cache)
    assert len(ref._views) == 3

    # warm-cache batched path: every view served from cache
    got = l3d.Line3D(cfg)
    got.add_images([(i, cams[i], imgs[i]) for i in range(3)],
                   cache_dir=cache)
    for i in range(3):
        np.testing.assert_array_equal(got._views[i].segments,
                                      ref._views[i].segments)

    # mixed: drop one cache entry so the batch re-detects only that view
    import os
    victim = [f for f in os.listdir(cache) if "_1_" in f][0]
    os.remove(os.path.join(cache, victim))
    mixed = l3d.Line3D(cfg)
    mixed.add_images([(i, cams[i], imgs[i]) for i in range(3)],
                     cache_dir=cache)
    for i in range(3):
        np.testing.assert_array_equal(mixed._views[i].segments,
                                      ref._views[i].segments)


def test_tiny_segment_filter(rng):
    """The 3D tiny-segment filter (line3D.cc:2302-2339): swept intervals
    whose REFERENCE-VIEW projection is shorter than
    min_line_length_factor * image diagonal are dropped at assembly.
    The 2D min-length filter is bypassed by raising the factor only
    AFTER the views are ingested, so the cut is attributable to the 3D
    filter alone."""
    import dataclasses

    n_lines = 12
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))

    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    cams = []
    for i in range(6):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.06 * i + 0.15,
                              rng.normal() * 0.02)
        C = np.array([0.6 * i - 1.5, rng.normal() * 0.05,
                      rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))

    pipe = l3d.Line3D(l3d.Config(num_neighbors=5, max_line_segments=100,
                                 optimize=False))
    for i, cam in enumerate(cams):
        segs = np.hstack([cam.project(P), cam.project(Q)])
        pipe.add_view(i, cam, segs)
    pipe.match_images()
    base = len(pipe.reconstruct_3d_lines())
    assert base >= n_lines * 0.8

    # every reconstructed line projects to a few hundred px; a factor of
    # 0.5 (half the image diagonal ~ 1100 px) must drop them ALL in the
    # 3D filter — the 2D segments were admitted under the default factor
    pipe.config = dataclasses.replace(pipe.config,
                                      min_line_length_factor=0.5)
    assert len(pipe.reconstruct_3d_lines()) == 0
