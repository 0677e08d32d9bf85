"""Is the cross-side match tail separable by per-segment relative score?

For confident-2D-side members of merged parallel clusters, classify each KEPT
match by the 2D side of its TARGET segment (same residual-line test as the
source side), and histogram score(match)/best_score(segment) for same-side vs
cross-side matches.  If the two distributions separate, a per-segment
relative cut (score >= alpha * segment_best) removes the bridge edges that a
per-view 10%-of-max cut (reference filterMatches, line3D.cc:1586-1669)
cannot, because the view max is dominated by unrelated strong segments.

Also simulates the cut: for alpha in {0.2,0.3,0.4,0.5}, reports the fraction
of cross-side and same-side kept matches that would be removed.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_tail_ratio.py
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter, defaultdict

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, build_graph, map_nodes_to_golden)
from tools.diag_bridge_geometry import line_rep
from tools.diag_mode_margin import side_2d


def main():
    from PIL import Image

    cams_j = json.load(open(CAMS))
    cfg = l3d.Config()
    pipe = l3d.Line3D(cfg)
    for cam_id in sorted(cams_j, key=int):
        c = cams_j[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    print("matched", flush=True)

    st, nodes, li, lj, ww, labels = build_graph(pipe)
    cam_ids = sorted(pipe._views)
    gold = parse_lines3d_txt(GOLDEN)
    node_gold, node_cov = map_nodes_to_golden(st, nodes, cam_ids, gold)
    S = st["mask"].shape[1]
    segs = np.asarray(st["segs"])
    score3d = np.asarray(st["score3d"])
    t_seg = np.asarray(st["t_seg"])
    kept = np.asarray(st["fm"].kept)
    est_valid = np.asarray(st["fm"].est_valid)
    neighbor_ids = np.asarray(st["neighbor_ids"])
    N = neighbor_ids.shape[1]
    M = t_seg.shape[2]
    k = M // N
    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)

    res_by = defaultdict(list)
    for gi, g in enumerate(gold):
        for r in g.residuals:
            res_by[(int(r[0]), gi)].append(r[2:6])

    uniq, inv = np.unique(labels, return_inverse=True)
    members = defaultdict(list)
    for n_i in range(len(nodes)):
        members[inv[n_i]].append(n_i)

    same_r, cross_r = [], []
    for cidx, mem in members.items():
        gs = Counter(int(node_gold[m]) for m in mem if node_gold[m] >= 0)
        solid = [g for g, k2 in gs.items() if k2 >= 2]
        if len(solid) != 2:
            continue
        ga, gb = solid
        Pa, da, La = line_rep(gold[ga])
        Pb, db, Lb = line_rep(gold[gb])
        if abs(da @ db) < 0.985:
            continue
        for m in mem:
            v, s = nv[m], ns[m]
            if not est_valid[v, s]:
                continue
            cam = cam_ids[v]
            dA, dB = side_2d(segs[v, s],
                             res_by.get((cam, ga), []),
                             res_by.get((cam, gb), []))
            if dA is None or dB is None or abs(dA - dB) < 1.0 \
                    or min(dA, dB) > 2.5:
                continue
            src_a = dA < dB
            km = np.where(kept[v, s])[0]
            if not len(km):
                continue
            best = float(score3d[v, s][km].max())
            if best <= 0:
                continue
            for mm in km:
                t = int(neighbor_ids[v, mm // k])
                ts_ = int(t_seg[v, s, mm])
                tcam = cam_ids[t]
                tA, tB = side_2d(segs[t, ts_],
                                 res_by.get((tcam, ga), []),
                                 res_by.get((tcam, gb), []))
                if tA is None or tB is None or abs(tA - tB) < 1.0 \
                        or min(tA, tB) > 2.5:
                    continue
                tgt_a = tA < tB
                ratio = float(score3d[v, s, mm]) / best
                (same_r if tgt_a == src_a else cross_r).append(ratio)

    same_r = np.array(same_r)
    cross_r = np.array(cross_r)
    bins = [0, .1, .2, .3, .4, .5, .6, .7, .8, .9, 1.001]
    print(f"same-side kept matches: {len(same_r)}, ratio median "
          f"{np.median(same_r):.2f}")
    print("  hist:", np.histogram(same_r, bins=bins)[0])
    print(f"cross-side kept matches: {len(cross_r)}, ratio median "
          f"{np.median(cross_r):.2f}")
    print("  hist:", np.histogram(cross_r, bins=bins)[0])
    for alpha in (0.2, 0.3, 0.4, 0.5, 0.6):
        print(f"  alpha={alpha}: kills {np.mean(cross_r < alpha)*100:.0f}% of"
              f" cross, {np.mean(same_r < alpha)*100:.0f}% of same")


if __name__ == "__main__":
    main()
