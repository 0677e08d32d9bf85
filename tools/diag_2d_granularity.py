"""Detection-level granularity vs merged golden pairs.

For every golden-line pair that our output merges into one prediction
(tools/diag_count_gap.py logic), and every view where BOTH golden lines
have 2D residuals, classify our detected segments (from the segment cache):

  distinct — the two golden residuals are covered by DIFFERENT detected
             segments (detection is fine; the merge happens in the graph)
  same-seg — one detected segment covers BOTH residuals (our LSD merged
             the parallel 2D structure; unrecoverable downstream)
  one-missing — one residual has no covering detected segment (top-3000 /
             NFA recall gap)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_2d_granularity.py
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from line3dpp_tpu.utils.golden import (
    _point_to_segments_dist, _sample_points, parse_lines3d_txt, scene_scale,
    stack_golden_segments)
from line3dpp_tpu.utils import segments_cache
from tools.diag_count_gap import GOLDEN, PRED, pair_geometry

REPO = os.path.join(os.path.dirname(__file__), "..")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")
CACHE = os.path.join(REPO, "testdata", "L3D_cache")


def seg_cover(res, dets, tol2d=2.5):
    """Best-covering detected segment id for a residual 2D segment (or -1).
    Coverage = fraction of 9 samples within tol2d px of the det segment."""
    ts = np.linspace(0, 1, 9)[:, None]
    p = res[:2] * (1 - ts) + res[2:] * ts               # (9, 2)
    a = dets[:, :2]
    d = dets[:, 2:] - a
    len2 = np.maximum((d * d).sum(-1), 1e-12)
    w = p[:, None, :] - a[None]
    t = np.clip((w * d[None]).sum(-1) / len2[None], 0, 1)
    cl = a[None] + t[..., None] * d[None]
    dist = np.linalg.norm(p[:, None] - cl, axis=-1)     # (9, n)
    cov = (dist < tol2d).mean(0)
    j = int(np.argmax(cov))
    return (j, float(cov[j])) if cov[j] >= 0.6 else (-1, float(cov[j]))


def main():
    gold_full = parse_lines3d_txt(GOLDEN)
    gold = [l.segments3d for l in gold_full]
    pred = [l.segments3d for l in parse_lines3d_txt(PRED)]
    tol = 0.01 * scene_scale(stack_golden_segments(gold_full))

    # redo the greedy matching to find merged pairs (as diag_count_gap)
    P, Wt, Gi = [], [], []
    for i, g in enumerate(gold):
        pts = _sample_points(g, 8)
        w = np.repeat(np.linalg.norm(g[:, 3:] - g[:, :3], axis=1), 8) / 8
        P.append(pts); Wt.append(w); Gi.append(np.full(len(pts), i))
    P, Wt, Gi = map(np.concatenate, (P, Wt, Gi))
    tot = np.zeros(len(gold))
    np.add.at(tot, Gi, Wt)
    cov = np.zeros((len(gold), len(pred)))
    for j, pl in enumerate(pred):
        d = _point_to_segments_dist(P, pl)
        np.add.at(cov[:, j], Gi, Wt * (d < tol))
    cov /= np.maximum(tot[:, None], 1e-12)
    matched_g = np.full(len(gold), -1)
    used_p = np.zeros(len(pred), bool)
    for flat in np.argsort(-cov, axis=None):
        i, j = divmod(int(flat), len(pred))
        if cov[i, j] < 0.8:
            break
        if matched_g[i] < 0 and not used_p[j]:
            matched_g[i] = j
            used_p[j] = True

    merged_pairs = []
    for i in range(len(gold)):
        if matched_g[i] >= 0 or cov[i].max() < 0.8:
            continue
        j = int(np.argmax(cov[i]))
        winner = [k for k in range(len(gold)) if matched_g[k] == j]
        if winner:
            merged_pairs.append((winner[0], i))
    print(f"merged golden pairs: {len(merged_pairs)}")

    # load detected segments per camera
    cams = json.load(open(CAMS))
    dets = {}
    for cam_id, c in cams.items():
        segs = segments_cache.load(CACHE, int(cam_id),
                                   (c["height"], c["width"]), 3000)
        assert segs is not None, f"no cache for cam {cam_id}"
        dets[int(cam_id)] = segs[:, :4]

    cls = Counter()
    geo_cls = Counter()
    per_pair = Counter()
    for (ga, gb) in merged_pairs:
        klass, _, _ = pair_geometry(gold[ga], gold[gb], tol)
        ra = {int(r[0]): r[2:6] for r in gold_full[ga].residuals}
        rb = {int(r[0]): r[2:6] for r in gold_full[gb].residuals}
        shared = sorted(set(ra) & set(rb))
        votes = Counter()
        for cam in shared:
            if cam not in dets:
                continue
            ja, ca = seg_cover(ra[cam], dets[cam])
            jb, cb = seg_cover(rb[cam], dets[cam])
            if ja < 0 or jb < 0:
                votes["one-missing"] += 1
            elif ja == jb:
                votes["same-seg"] += 1
            else:
                votes["distinct"] += 1
        cls.update(votes)
        if votes:
            top = votes.most_common(1)[0][0]
            per_pair[top] += 1
            geo_cls[(klass, top)] += 1
        else:
            per_pair["no-shared-views"] += 1
    print("per-view classification:", dict(cls))
    print("per-pair majority:", dict(per_pair))
    print("by geometry:", {f"{k[0]}/{k[1]}": v for k, v in geo_cls.items()})


if __name__ == "__main__":
    main()
