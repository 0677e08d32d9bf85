"""Top-level breakdown of the count-F1 gap from the saved txt outputs.

Classifies every unmatched golden line (NEXT.md item 1):
  merged   — some prediction covers >= coverage_t of it, but that prediction
             was claimed by another golden line (granularity: one pred
             swallows 2+ goldens)
  partial  — best single-pred coverage in [0.3, coverage_t)
  missing  — best coverage < 0.3 (we never reconstruct it)
and every non-claiming prediction:
  duplicate — covered by golden lines already claimed by other preds
  spurious  — < 0.3 of its length within tol of ANY golden line

For 'merged', prints the fan-in distribution (golden lines per swallowing
pred) and the geometry class of each merged pair: collinear-gap (same axis,
disjoint) vs parallel-offset (side-by-side) vs other.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_count_gap.py [pred.txt]
"""
from __future__ import annotations

import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from line3dpp_tpu.utils.golden import (
    _point_to_segments_dist, _sample_points, parse_lines3d_txt, scene_scale,
    stack_golden_segments)

REPO = os.path.join(os.path.dirname(__file__), "..")
GOLDEN = ("/root/reference/testdata/Line3D++_ref/"
          "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
          "__kNN_10__vis_3.txt")
PRED = os.path.join(
    REPO, "testdata", "out",
    "Line3D-TPU__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__OPTIMIZED__vis_3.txt")


def pair_geometry(ga, gb, tol):
    """Classify the relation of two golden lines: collinear / parallel / other.
    Returns (klass, perp_offset, axial_gap)."""
    def rep(g):
        s = g[np.argmax(np.linalg.norm(g[:, 3:] - g[:, :3], axis=1))]
        p, q = s[:3], s[3:]
        d = q - p
        return p, q, d / max(np.linalg.norm(d), 1e-12)

    pa, qa, da = rep(ga)
    pb, qb, db = rep(gb)
    cosang = abs(float(da @ db))
    mid_b = 0.5 * (pb + qb)
    w = mid_b - pa
    perp = float(np.linalg.norm(w - (w @ da) * da))
    ta = sorted([0.0, float((qa - pa) @ da)])
    tb = sorted([float((pb - pa) @ da), float((qb - pa) @ da)])
    gap = max(tb[0] - ta[1], ta[0] - tb[1])        # axial separation (<0 = overlap)
    if cosang > 0.98 and perp < 3 * tol:
        return ("collinear" if gap > 0 else "parallel-close", perp, gap)
    if cosang > 0.98:
        return ("parallel-offset", perp, gap)
    return ("other-angle", perp, gap)


def main():
    pred_path = sys.argv[1] if len(sys.argv) > 1 else PRED
    gold = [l.segments3d for l in parse_lines3d_txt(GOLDEN)]
    pred = [l.segments3d for l in parse_lines3d_txt(pred_path)]
    tol = 0.01 * scene_scale(stack_golden_segments(parse_lines3d_txt(GOLDEN)))
    coverage_t = 0.8
    n_g, n_p = len(gold), len(pred)
    print(f"golden {n_g} lines, predicted {n_p} lines, tol {tol:.4f}")

    # coverage[i, j]: fraction of golden i within tol of pred j (as metrics)
    P, Wt, Gi = [], [], []
    for i, g in enumerate(gold):
        pts = _sample_points(g, 8)
        w = np.repeat(np.linalg.norm(g[:, 3:] - g[:, :3], axis=1), 8) / 8
        P.append(pts); Wt.append(w); Gi.append(np.full(len(pts), i))
    P, Wt, Gi = map(np.concatenate, (P, Wt, Gi))
    tot = np.zeros(n_g)
    np.add.at(tot, Gi, Wt)
    cov = np.zeros((n_g, n_p))
    for j, pl in enumerate(pred):
        d = _point_to_segments_dist(P, pl)
        np.add.at(cov[:, j], Gi, Wt * (d < tol))
    cov /= np.maximum(tot[:, None], 1e-12)

    matched_g = np.full(n_g, -1)
    used_p = np.zeros(n_p, bool)
    for flat in np.argsort(-cov, axis=None):
        i, j = divmod(int(flat), n_p)
        if cov[i, j] < coverage_t:
            break
        if matched_g[i] < 0 and not used_p[j]:
            matched_g[i] = j
            used_p[j] = True
    # augment to the maximum matching (mirrors utils.golden, so the
    # buckets here agree with the reported count metric)
    adj = [np.where(cov[i] >= coverage_t)[0] for i in range(n_g)]
    sys.setrecursionlimit(100000)
    pred_owner = {int(matched_g[i]): i for i in range(n_g) if matched_g[i] >= 0}

    def aug_fast(start, seen):
        for j in adj[start]:
            j = int(j)
            if j in seen:
                continue
            seen.add(j)
            owner = pred_owner.get(j, -1)
            if owner < 0 or aug_fast(owner, seen):
                pred_owner[j] = start
                matched_g[start] = j
                used_p[j] = True
                return True
        return False

    for i in range(n_g):
        if matched_g[i] < 0 and len(adj[i]):
            aug_fast(i, set())

    # ---- unmatched golden breakdown ----
    klass = Counter()
    merged_by = {}            # pred j -> [golden i...] it covers >= t
    geo = Counter()
    for i in range(n_g):
        if matched_g[i] >= 0:
            klass["matched"] += 1
            continue
        best = float(cov[i].max())
        if best >= coverage_t:
            klass["merged"] += 1
            j = int(np.argmax(cov[i]))
            merged_by.setdefault(j, []).append(i)
        elif best >= 0.3:
            klass["partial"] += 1
        else:
            klass["missing"] += 1
    print("golden:", dict(klass))

    # fan-in of swallowing preds + geometry of merged pairs
    fanin = Counter()
    for j, gis in merged_by.items():
        winners = [i for i in range(n_g) if matched_g[i] == j]
        group = winners + gis
        fanin[len(group)] += 1
        base = winners[0] if winners else gis[0]
        for i in gis:
            if i == base:
                continue
            k, perp, gap = pair_geometry(gold[base], gold[i], tol)
            geo[k] += 1
    print("swallowing-pred fan-in (goldens per pred):", dict(fanin))
    print("merged-pair geometry:", dict(geo))

    # ---- non-claiming predictions ----
    pk = Counter()
    for j in range(n_p):
        if used_p[j]:
            continue
        pts = _sample_points(pred[j], 8)
        w = np.repeat(np.linalg.norm(pred[j][:, 3:] - pred[j][:, :3],
                                     axis=1), 8) / 8
        d = _point_to_segments_dist(
            pts, np.concatenate(gold, axis=0))
        frac = float((w * (d < tol)).sum() / max(w.sum(), 1e-12))
        if frac >= 0.5:
            pk["duplicate"] += 1
        elif frac >= 0.1:
            pk["partial-overlap"] += 1
        else:
            pk["spurious"] += 1
    print("non-claiming preds:", dict(pk))

    # ---- length distribution of missing goldens ----
    lens = np.array([np.linalg.norm(g[:, 3:] - g[:, :3], axis=1).sum()
                     for g in gold])
    miss = np.array([matched_g[i] < 0 and cov[i].max() < 0.3
                     for i in range(n_g)])
    if miss.any():
        print(f"missing-golden lengths: median {np.median(lens[miss]):.3f} "
              f"vs all-golden median {np.median(lens):.3f} (tol {tol:.3f})")


if __name__ == "__main__":
    main()
