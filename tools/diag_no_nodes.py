"""Why do some golden lines have NO graph nodes at all?

For every golden line whose mapped 2D segments never appear in the affinity
graph (the 'no-nodes' bucket of tools/diag_lost_clusters.py), classify each
mapped (view, seg) detection:

  est-valid+edges — has a best estimate AND affinity edges (should be a
                    node; indicates a mapping artifact)
  est-valid/no-edge — best estimate exists but every pairwise similarity
                    is < min_affinity 0.5
  low-score       — matches exist but best score3D <= 0.75 (no estimate;
                    reference filterMatches line3D.cc:1635 drops these too)
  no-matches      — the epipolar matcher kept nothing for this segment
  undetected      — no detected segment covers the golden residual

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_no_nodes.py
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_2d_granularity import seg_cover
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, build_graph, map_nodes_to_golden)


def main():
    from PIL import Image

    cams = json.load(open(CAMS))
    pipe = l3d.Line3D(l3d.Config())
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    st, nodes, li, lj, ww, labels = build_graph(pipe)
    cam_ids = sorted(pipe._views)
    gold_full = parse_lines3d_txt(GOLDEN)
    node_gold, _ = map_nodes_to_golden(st, nodes, cam_ids, gold_full)
    with_nodes = set(int(g) for g in node_gold if g >= 0)
    no_node_goldens = [i for i in range(len(gold_full))
                       if i not in with_nodes]
    print(f"goldens with no graph nodes: {len(no_node_goldens)} "
          f"/ {len(gold_full)}")

    segs = np.asarray(st["segs"])
    mask = np.asarray(st["mask"])
    fm = st["fm"]
    est_valid = np.asarray(fm.est_valid)
    kept = np.asarray(fm.kept) if hasattr(fm, "kept") and fm.kept is not None \
        else None
    score3d = np.asarray(st["score3d"]) if "score3d" in st else None
    aff = st.get("aff")
    edge_any = np.asarray(aff.edge_valid).any(-1) if aff is not None else None
    # also count being a TARGET of someone's edge
    tgt_hit = np.zeros(mask.shape, bool)
    if aff is not None:
        ev = np.asarray(aff.edge_valid)
        tv = np.asarray(aff.tgt_view)
        tseg = np.asarray(aff.tgt_seg)
        v_i, s_i, m_i = np.nonzero(ev)
        tgt_hit[tv[v_i, s_i, m_i], tseg[v_i, s_i, m_i]] = True

    cam_to_vidx = {int(c): i for i, c in enumerate(cam_ids)}
    per_seg = Counter()
    per_gold = Counter()
    res_len = []
    for gi in no_node_goldens:
        votes = Counter()
        for r in gold_full[gi].residuals:
            cam = int(r[0])
            v = cam_to_vidx.get(cam)
            if v is None:
                continue
            dets = segs[v][mask[v]]
            j, cvr = seg_cover(np.asarray(r[2:6], float), dets)
            res_len.append(float(np.hypot(r[4] - r[2], r[5] - r[3])))
            if j < 0:
                votes["undetected"] += 1
                continue
            if est_valid[v, j]:
                if (edge_any is not None and edge_any[v, j]) or tgt_hit[v, j]:
                    votes["est-valid+edges"] += 1
                else:
                    votes["est-valid/no-edge"] += 1
            else:
                sc = float(score3d[v, j].max()) if score3d is not None else -1
                if kept is not None and not kept[v, j].any():
                    # score3d > 0 proxies "a raw epipolar match existed but
                    # died at the support/score filters"; == 0 means either
                    # no raw match or zero support from every other camera
                    votes["filtered-out" if sc > 0 else "no-support"] += 1
                else:
                    votes[f"low-score"] += 1
        per_seg.update(votes)
        if votes:
            per_gold[votes.most_common(1)[0][0]] += 1
        else:
            per_gold["no-residuals-mapped"] += 1
    print("per-residual classification:", dict(per_seg))
    print("per-golden majority:", dict(per_gold))
    if res_len:
        print(f"residual 2D length px p25/50/75: "
              f"{np.percentile(res_len, [25, 50, 75]).round(0)}")


if __name__ == "__main__":
    main()
