"""Unit tests for the golden line-level (count-based) matching metric."""

import numpy as np

from line3dpp_tpu.utils.golden import line_match_metrics


def _line(p, q, n=1):
    p, q = np.asarray(p, float), np.asarray(q, float)
    ts = np.linspace(0, 1, n + 1)
    return np.stack([np.concatenate([p + (q - p) * a, p + (q - p) * b])
                     for a, b in zip(ts[:-1], ts[1:])])


def test_perfect_match():
    gold = [_line([0, 0, 0], [1, 0, 0]), _line([0, 1, 0], [0, 1, 1], 2)]
    m = line_match_metrics(gold, gold, tol=0.01)
    assert m == {"count_recall": 1.0, "count_precision": 1.0, "count_f1": 1.0}


def test_merged_prediction_matches_only_one():
    # three collinear golden lines vs ONE long merged prediction: the
    # prediction can claim only one of them
    gold = [_line([i, 0, 0], [i + 0.9, 0, 0]) for i in range(3)]
    pred = [_line([0, 0, 0], [2.9, 0, 0])]
    m = line_match_metrics(pred, gold, tol=0.05)
    assert np.isclose(m["count_recall"], 1 / 3)
    assert m["count_precision"] == 1.0


def test_below_coverage_threshold_not_matched():
    gold = [_line([0, 0, 0], [1, 0, 0])]
    pred = [_line([0, 0, 0], [0.5, 0, 0])]   # covers only half
    m = line_match_metrics(pred, gold, tol=0.05, coverage_t=0.8)
    assert m["count_recall"] == 0.0


def test_empty_sets():
    m = line_match_metrics([], [_line([0, 0, 0], [1, 0, 0])], tol=0.1)
    assert m["count_f1"] == 0.0


def test_maximum_matching_beats_greedy():
    # dense-bundle case: pred X covers goldens A and B, pred Y covers only A.
    # Greedy-by-coverage assigns X->A (highest cov) and strands B; the
    # maximum matching augments to A->Y, B->X so both goldens match.
    gold = [_line([0, 0, 0], [10, 0, 0]),        # A
            _line([0, 1.98, 0], [10, 1.98, 0])]  # B
    pred = [_line([0, 0.99, 0], [10, 0.99, 0]),      # X: within 1.0 of both
            _line([0.5, -0.99, 0], [10, -0.99, 0])]  # Y: covers A at ~0.875
    m = line_match_metrics(pred, gold, tol=1.0)
    assert m["count_recall"] == 1.0 and m["count_precision"] == 1.0


def test_augmenting_path_chain():
    # chain of length 3: p0 covers g0; p1 covers g0,g1; p2 covers g1,g2.
    # A bad seed (p1->g0, p2->g1) must still augment to the perfect matching.
    gold = [_line([0, 0, 0], [10, 0, 0]),
            _line([0, 4, 0], [10, 4, 0]),
            _line([0, 8, 0], [10, 8, 0])]
    pred = [_line([0, -1, 0], [10, -1, 0]),   # g0 only
            _line([0, 1.5, 0], [10, 1.5, 0]),  # g0 (d=1.5) + g1 (d=2.5... no)
            _line([0, 5.5, 0], [10, 5.5, 0])]
    # with tol=3: p0->g0(1), p1->g0(1.5),g1(2.5), p2->g1(1.5),g2(2.5)
    m = line_match_metrics(pred, gold, tol=3.0)
    assert m["count_recall"] == 1.0 and m["count_precision"] == 1.0
