"""Second-scene regression guard (VERDICT r3 #5).

Slow test (run with ``-m slow``): renders the synthetic facade of
`tools/validate_scene2.py` — the independent scene that exposed the
testdata-calibrated bimodal splitter (SECOND_SCENE.md) — runs the FULL
pipeline per config, and asserts count-F1 floors.  Any knob that regresses
scene2 (the rounds-2/3 failure mode: a threshold tuned on testdata that
hurts independent geometry) now fails CI instead of surfacing a round later.

Floors sit ~0.02 under the values measured on 2026-08-18/19 (CPU, 10 views):
default (split=0, ordered) 0.866; (0, full) 0.881; splitter-on configs
0.834/0.854.  Segment recall/precision were ~0.985/1.000 everywhere.
"""

import os
import sys

import numpy as np
import pytest

from line3dpp_tpu.utils.golden import (line_match_metrics, scene_scale,
                                       segment_set_metrics)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# (split_bimodal_t, symmetrization) -> count_f1 floor
FLOORS = {
    (0.0, "ordered"): 0.845,   # the default config — the headline guard
    (1.1, "ordered"): 0.810,
    (0.0, "full"): 0.860,
    (1.1, "full"): 0.830,
}


@pytest.mark.slow
def test_scene2_floors():
    import validate_scene2 as s2

    quads, gt = s2.build_scene()
    cams = s2.make_cameras(V=10)
    images = [s2.render(c, quads, seed=100 + i) for i, c in enumerate(cams)]
    tol = 0.01 * scene_scale(gt)
    gold_lines = [gt[i:i + 1] for i in range(len(gt))]

    results = {}
    for (split_t, sym), floor in FLOORS.items():
        lines = s2.run_config(images, cams, split_t, sym)
        pred_segs = (np.concatenate([l.segments3d for l in lines])
                     if lines else np.zeros((0, 6)))
        sm = segment_set_metrics(pred_segs, gt, tol=tol)
        lm = line_match_metrics([l.segments3d for l in lines], gold_lines,
                                tol=tol)
        results[(split_t, sym)] = (sm, lm, len(lines))
        assert lm["count_f1"] >= floor, (
            f"scene2 regression at split={split_t} sym={sym}: "
            f"count_f1 {lm['count_f1']:.3f} < floor {floor} "
            f"({len(lines)} lines; {sm})")
        assert sm["recall"] >= 0.96, (split_t, sym, sm)
        assert sm["precision"] >= 0.98, (split_t, sym, sm)
