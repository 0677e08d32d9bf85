"""Failure-mode forensics for every golden line the maximum 1-1 matching
leaves unmatched.

For each unmatched golden line, find its best-covering prediction under a
RELAXED lateral tolerance (3x tol) and classify the residual failure:

  axial-short   — laterally within tol, but the prediction covers < 80% of
                  the golden's axial extent (sweep/extent problem: our line
                  stops short or starts late)
  lateral-off   — a parallel prediction exists at 1-3x tol lateral distance
                  for most of the golden's length (estimate-position
                  problem: the 3D line is displaced sideways)
  claimed-away  — a prediction covers >= 80% within tol but the matching
                  assigned it to another golden (bundle deficit: k goldens,
                  < k preds in the ball)
  absent        — nothing within 3x tol for >= 50% of the length

This separates the two remaining count-F1 hypotheses: sweep/extent underrun
(fix in final segment extraction) vs lateral estimate smear (fix in
scoring/estimates).

Usage: PYTHONPATH=... python tools/diag_unmatched_forensics.py [pred.txt]
"""
from __future__ import annotations

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from line3dpp_tpu.utils.golden import (
    _sample_points, line_match_assignment, parse_lines3d_txt, scene_scale,
    stack_golden_segments)

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = ("/root/reference/testdata/Line3D++_ref/"
          "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
          "__kNN_10__vis_3.txt")
PRED = os.path.join(
    REPO, "testdata", "out",
    "Line3D-TPU__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__vis_3.txt")


def point_seg_dists(pts, segs):
    """(P,3) x (N,6) -> (P,N) point-to-segment distances."""
    a = segs[:, :3]
    d = segs[:, 3:] - a
    len2 = np.maximum((d * d).sum(-1), 1e-12)
    w = pts[:, None, :] - a[None]
    t = np.clip((w * d[None]).sum(-1) / len2[None], 0.0, 1.0)
    cl = a[None] + t[..., None] * d[None]
    return np.linalg.norm(pts[:, None] - cl, axis=-1)


def main():
    pred_path = sys.argv[1] if len(sys.argv) > 1 else PRED
    gold_full = parse_lines3d_txt(GOLDEN)
    pred_full = parse_lines3d_txt(pred_path)
    gold = [l.segments3d for l in gold_full]
    pred = [l.segments3d for l in pred_full]
    tol = 0.01 * scene_scale(stack_golden_segments(gold_full))

    match = line_match_assignment(pred, gold, tol=tol)
    matched_g = {g for g, p in match.items()}
    print(f"{len(gold)} golden, {len(pred)} pred, matched {len(matched_g)}, "
          f"tol {tol:.4f}")

    klass = Counter()
    axial_covs = []
    lateral_meds = []
    for gi, g in enumerate(gold):
        if gi in matched_g:
            continue
        pts = _sample_points(g, 16)
        best_cov, best_pi, best_med = 0.0, -1, np.inf
        cov_tol_best = 0.0
        for pi, p in enumerate(pred):
            dist = point_seg_dists(pts, p).min(1)
            cov3 = (dist < 3 * tol).mean()
            if cov3 > best_cov or (cov3 == best_cov and np.median(dist) < best_med):
                best_cov, best_pi, best_med = cov3, pi, np.median(dist)
                cov_tol_best = (dist < tol).mean()
        if best_cov < 0.5:
            klass["absent"] += 1
            continue
        if cov_tol_best >= 0.8:
            klass["claimed-away"] += 1
            continue
        # within 3x tol for most of the length: axial or lateral?
        dist = point_seg_dists(pts, pred[best_pi]).min(1)
        if cov_tol_best >= 0.3:
            klass["axial-short"] += 1
            axial_covs.append(cov_tol_best)
        else:
            klass["lateral-off"] += 1
            lateral_meds.append(best_med / tol)

    print("unmatched golden classification:", dict(klass))
    if axial_covs:
        print(f"axial-short: median within-tol coverage "
              f"{np.median(axial_covs):.2f}")
    if lateral_meds:
        print(f"lateral-off: median lateral distance "
              f"{np.median(lateral_meds):.2f} x tol")


if __name__ == "__main__":
    main()
