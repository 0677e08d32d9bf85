"""Unit tests for Line3D._split_bimodal_clusters (pipeline.py).

Two close parallel 3D lines whose hypotheses landed in one cluster must be
split back apart along the perpendicular offset axis; unimodal clusters and
clusters where a side would fail the visibility filter must stay whole.
"""

import types

import numpy as np
import pytest

import line3dpp_tpu as l3d


def _make_cluster(gap, n_cams_hi=4):
    """One cluster of 16 members: 8 on the x-axis line at z=0 (cams 0-3)
    and 8 on a parallel line at z=gap (cams 0..n_cams_hi-1)."""
    V, S = 4, 16
    estP1 = np.zeros((V, S, 3))
    estP2 = np.zeros((V, S, 3))
    mv, ms, side = [], [], []
    for i in range(16):
        hi = i >= 8
        v = (i % n_cams_hi) if hi else (i % 4)
        z = gap if hi else 0.0
        t = (i % 8) * 0.5
        estP1[v, i] = [t, 0.0, z]
        estP2[v, i] = [t + 0.4, 0.0, z]
        mv.append(v)
        ms.append(i)
        side.append(hi)
    mc = np.zeros(16, np.int32)
    mv = np.array(mv, np.int32)
    ms = np.array(ms, np.int32)

    pm = 0.5 * (estP1[mv, ms] + estP2[mv, ms])
    lineP1 = pm.mean(axis=0, keepdims=True)
    line_dir = np.array([[1.0, 0.0, 0.0]])

    cam_C = np.zeros((V, 3))
    cam_C[:, 2] = -10.0                      # depth ~ 10 + z
    st = {"cb": types.SimpleNamespace(k_reg=np.full(V, 0.01), C=cam_C),
          "median_depth": np.full(V, 100.0)}
    return mc, mv, ms, lineP1, line_dir, estP1, estP2, st, np.array(side)


@pytest.fixture(scope="module")
def pipe():
    return l3d.Line3D(l3d.Config())


def test_splits_parallel_lines(pipe):
    # gap 0.5 over sigma ~0.105  =>  ~4.8 sigma separation: must split
    mc, mv, ms, P1, d, e1, e2, st, side = _make_cluster(gap=0.5)
    mc2, C2, P1o, P2o, diro = pipe._split_bimodal_clusters(
        mc, mv, ms, 1, P1, d, e1, e2, st, visibility=3, gap_t=1.5)
    assert C2 == 2
    # each output cluster is exactly one side
    for c in range(2):
        sides = side[mc2 == c]
        assert len(sides) == 8 and len(np.unique(sides)) == 1
    # refit lines sit at z=0 and z=0.5 (order-agnostic)
    zs = sorted(P1o[:, 2])
    np.testing.assert_allclose(zs, [0.0, 0.5], atol=1e-6)
    # directions stay along x
    assert np.all(np.abs(diro[:, 0]) > 0.999)


def test_unimodal_stays_whole(pipe):
    # gap 0.02 => ~0.2 sigma: below gap_t, no split
    mc, mv, ms, P1, d, e1, e2, st, _ = _make_cluster(gap=0.02)
    mc2, C2, *_ = pipe._split_bimodal_clusters(
        mc, mv, ms, 1, P1, d, e1, e2, st, visibility=3, gap_t=1.5)
    assert C2 == 1 and np.all(mc2 == 0)


def test_visibility_guard_blocks_split(pipe):
    # bimodal, but the high side only has 2 distinct cameras (< visibility=3):
    # the reference's visibility filter would drop it, so keep the cluster
    mc, mv, ms, P1, d, e1, e2, st, _ = _make_cluster(gap=0.5, n_cams_hi=2)
    mc2, C2, *_ = pipe._split_bimodal_clusters(
        mc, mv, ms, 1, P1, d, e1, e2, st, visibility=3, gap_t=1.5)
    assert C2 == 1 and np.all(mc2 == 0)


def test_disabled_by_config():
    # split_bimodal_t <= 0 must bypass the splitter entirely in the config
    cfg = l3d.Config(split_bimodal_t=0.0)
    assert cfg.split_bimodal_t == 0.0
