"""Edge-surgery attribution of merged bundles (follow-up to
diag_oracle_estimates: perfect estimates did NOT split the merged parallel
bundles — count_f1 0.8805 at alpha=1 vs 0.8858 baseline).

Classify every affinity edge by its endpoints' golden-line assignment and
re-run the UNCHANGED downstream (union-find c=3, fit, sweep) on filtered
edge sets, via the st["edges_flat"] injection point the blocked path uses:

  A  all edges (baseline reproduction)
  B  drop mapped-mapped edges with DIFFERENT golden lines (cross-line)
  C  B + drop mapped-unmapped edges (fog nodes only connect to fog)
  D  only same-line mapped-mapped edges (pure oracle graph — downstream
     ceiling given our detections)

Also prints the class histogram of bridge edges inside merged clusters.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_oracle_graph.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.ops import affinity as affinity_ops
from line3dpp_tpu.utils.golden import (line_match_metrics, parse_lines3d_txt,
                                       scene_scale, stack_golden_segments)
from tools.diag_cluster_split import (CAMS, CACHE, GOLDEN, IMG_DIR,
                                      map_nodes_to_golden)


def main():
    from PIL import Image
    from collections import Counter

    cams_j = json.load(open(CAMS))
    pipe = l3d.Line3D(l3d.Config())
    for cam_id in sorted(cams_j, key=int):
        c = cams_j[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    print("matched", flush=True)

    st = pipe._last_state
    aff = st["aff"]
    V, S = st["mask"].shape
    M = aff.weight.shape[2]
    cam_ids = sorted(pipe._views)
    gold_lines = parse_lines3d_txt(GOLDEN)
    gold = stack_golden_segments(gold_lines)
    tol = 0.01 * scene_scale(gold)

    # flat directed edges from the dense affinity (same as reconstruct)
    n_edges = affinity_ops.count_edges(aff.edge_valid)
    cap = affinity_ops.compaction_capacity(n_edges)
    idx, okm, ww, tv_e, ts_e = affinity_ops.compact_edges(aff, cap)
    idx, ww, tv_e, ts_e = idx[okm], ww[okm], tv_e[okm], ts_e[okm]
    src_v = (idx // (S * M)).astype(np.int64)
    src_s = (idx // M) % S
    gid_a = src_v * S + src_s
    gid_b = tv_e.astype(np.int64) * S + ts_e

    # golden assignment per node
    est_valid = np.asarray(st["fm"].est_valid)
    nodes = np.where(est_valid.reshape(-1))[0]
    node_gold, _ = map_nodes_to_golden(st, nodes, cam_ids, gold_lines)
    gmap = np.full(V * S, -1, np.int64)
    gmap[nodes] = node_gold
    ga, gb = gmap[gid_a], gmap[gid_b]

    both = (ga >= 0) & (gb >= 0)
    cls = np.where(both & (ga == gb), 0,            # same-line
          np.where(both, 1,                          # cross-line
          np.where((ga >= 0) | (gb >= 0), 2, 3)))    # half-fog / fog-fog
    names = ["same-line", "cross-line", "half-fog", "fog-fog"]
    print("edge classes:", {names[k]: int((cls == k).sum()) for k in range(4)})

    def run(keep, label):
        st["edges_flat"] = (gid_a[keep], gid_b[keep], ww[keep])
        lines = pipe.reconstruct_3d_lines()
        lm = line_match_metrics([l.segments3d for l in lines],
                                [g.segments3d for g in gold_lines], tol=tol)
        print(f"{label:<38} lines={len(lines):<5} "
              f"count_f1={lm['count_f1']:.4f} "
              f"(r={lm['count_recall']:.3f} p={lm['count_precision']:.3f})",
              flush=True)
        return lines, lm

    all_keep = np.ones(len(ww), bool)
    run(all_keep, "A all edges")
    run(cls != 1, "B drop cross-line")
    run((cls != 1) & (cls != 2), "C drop cross-line + half-fog")
    run(cls == 0, "D same-line only (graph ceiling)")

    del st["edges_flat"]


if __name__ == "__main__":
    main()
