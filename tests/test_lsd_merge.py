"""Collinear fragment merging tests (post-detection cleanup)."""

import numpy as np

from line3dpp_tpu.ops.lsd import merge_collinear


def test_merges_fragments_of_one_line():
    segs = np.array([
        [10.0, 50.0, 100.0, 50.0],
        [104.0, 50.2, 200.0, 50.4],    # small gap, tiny offset
        [203.0, 50.5, 400.0, 51.0],
    ])
    out = merge_collinear(segs)
    assert len(out) == 1
    L = np.hypot(out[0, 2] - out[0, 0], out[0, 3] - out[0, 1])
    assert L > 385


def test_keeps_distinct_lines():
    segs = np.array([
        [10.0, 50.0, 100.0, 50.0],
        [10.0, 80.0, 100.0, 80.0],     # parallel, 30px away
        [10.0, 50.0, 15.0, 150.0],     # different angle
        [300.0, 50.0, 400.0, 50.0],    # collinear with 0 but 200px gap
    ])
    out = merge_collinear(segs)
    assert len(out) == 4


def test_empty_and_single():
    assert len(merge_collinear(np.zeros((0, 4)))) == 0
    one = np.array([[0.0, 0.0, 10.0, 0.0]])
    np.testing.assert_allclose(merge_collinear(one), one)
