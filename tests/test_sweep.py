"""Vectorized sweep must match the per-cluster reference implementation."""

import numpy as np

from line3dpp_tpu.ops import sweep


def _reference_sweep_all(mc, s1, s2, ok, cams, C, vis):
    out = [[] for _ in range(C)]
    order = np.argsort(mc, kind="stable")
    b = np.searchsorted(mc[order], np.arange(C + 1))
    for c in range(C):
        sel = order[b[c]: b[c + 1]]
        sel = sel[ok[sel]]
        if len(sel) == 0:
            continue
        out[c] = sweep.sweep_cluster(s1[sel], s2[sel], cams[sel], vis)
    return out


def test_vectorized_matches_reference(rng):
    C = 40
    n = 600
    mc = rng.integers(0, C, n).astype(np.int64)
    s1 = rng.normal(1.0, 0.8, n)
    s2 = s1 + rng.uniform(0.05, 0.8, n) * rng.choice([-1, 1], n)
    ok = rng.uniform(size=n) > 0.1
    cams = rng.integers(0, 8, n)

    got = sweep.sweep_all(mc, s1, s2, ok, cams, C, visibility=3)
    want = _reference_sweep_all(mc, s1, s2, ok, cams, C, 3)

    for c in range(C):
        assert len(got[c]) == len(want[c]), f"cluster {c}"
        for (ga, gb), (wa, wb) in zip(got[c], want[c]):
            assert abs(ga - wa) < 1e-9 and abs(gb - wb) < 1e-9, f"cluster {c}"


def test_empty_and_small():
    out = sweep.sweep_all(np.zeros(0, np.int64), np.zeros(0), np.zeros(0),
                          np.zeros(0, bool), np.zeros(0, np.int64), 3, 3)
    assert out == [[], [], []]
    # cluster with only 2 members -> no intervals
    mc = np.zeros(2, np.int64)
    out = sweep.sweep_all(mc, np.array([0.0, 0.1]), np.array([1.0, 1.1]),
                          np.ones(2, bool), np.array([0, 1]), 1, 3)
    assert out == [[]]
