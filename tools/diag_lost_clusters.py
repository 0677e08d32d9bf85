"""Where do the unclaimed (merged-away) golden lines' members go?

For each golden pair (A claimed by pred j, B unmatched but covered by j),
map B's residuals to OUR graph nodes and classify B's fate:

  same-cluster  — B's members sit in A's cluster (the bimodal splitter's
                  territory)
  own-cluster   — B's members form their own cluster, but it died later
                  (visibility filter / sweep / tiny filter)
  scattered     — B's members are spread over many clusters
  no-nodes      — B's 2D segments never became graph nodes (no surviving
                  matches / below min affinity)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_lost_clusters.py
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
from line3dpp_tpu.utils.golden import (
    _point_to_segments_dist, _sample_points, parse_lines3d_txt, scene_scale,
    stack_golden_segments)
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, build_graph, map_nodes_to_golden)


def main():
    from PIL import Image

    cams = json.load(open(CAMS))
    cfg = l3d.Config()
    pipe = l3d.Line3D(cfg)
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
    node_gold, node_cov = map_nodes_to_golden(st, nodes, cam_ids, gold_full)
    print(f"graph: {len(nodes)} nodes", flush=True)

    # run the actual reconstruction for the pred set (no optimize: faster,
    # same clustering)
    pipe._cluster_records = []
    lines = pipe.reconstruct_3d_lines()
    pred = [l.segments3d for l in lines]
    gold = [l.segments3d for l in gold_full]
    tol = 0.01 * scene_scale(stack_golden_segments(gold_full))

    # greedy 1:1 matching (as utils.golden.line_match_metrics)
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

    merged_B = [i for i in range(len(gold))
                if matched_g[i] < 0 and cov[i].max() >= 0.8]
    print(f"merged-away goldens: {len(merged_B)}")

    # which golden claims each pred (the A of each pair)
    pred_to_gold = {int(matched_g[i]): i for i in range(len(gold))
                    if matched_g[i] >= 0}

    # nodes per golden id
    nodes_of_gold = {}
    for k, gi in enumerate(node_gold):
        if gi >= 0:
            nodes_of_gold.setdefault(int(gi), []).append(k)

    # index cluster records by node for fate lookup
    node_to_rec = {}
    for rec in pipe._cluster_records:
        for nd in rec["nodes"]:
            node_to_rec[int(nd)] = rec

    fate = Counter()
    emit_detail = Counter()
    for b in merged_B:
        nb = nodes_of_gold.get(b, [])
        if len(nb) == 0:
            fate["no-nodes"] += 1
            continue
        labs = Counter(int(labels[k]) for k in nb)
        top_lab, top_n = labs.most_common(1)[0]
        # A = golden that claimed the pred covering B
        j = int(np.argmax(cov[b]))
        a = pred_to_gold.get(j, -1)
        na = nodes_of_gold.get(a, [])
        labs_a = Counter(int(labels[k]) for k in na)
        a_lab = labs_a.most_common(1)[0][0] if labs_a else -2
        if top_n / len(nb) < 0.5:
            fate["scattered"] += 1
            continue
        if top_lab == a_lab:
            fate["same-cluster-as-A"] += 1
            continue
        # B dominates its own cluster: what happened to it?
        recs = Counter()
        for k in nb:
            r = node_to_rec.get(int(nodes[k]))
            if r is not None:
                recs[id(r)] = (recs.get(id(r), 0) + 1)
        if not recs:
            fate["own-cluster:pre-filtered"] += 1
            continue
        rid = recs.most_common(1)[0][0]
        rec = next(r for r in pipe._cluster_records if id(r) == rid)
        out = rec["outcome"]
        fate[f"own-cluster:{out}"] += 1
        if out == "emitted":
            jj = rec["line_idx"]
            c_cov = cov[b, jj]
            if used_p[jj]:
                g_claim = pred_to_gold.get(jj, -1)
                emit_detail[f"pred-claimed-other(cov_b={c_cov:.2f})"
                            if c_cov < 0.8 else "pred-claimed-other-highcov"] += 1
            else:
                emit_detail["pred-unclaimed-lowcov" if c_cov < 0.8
                            else "pred-unclaimed-highcov??"] += 1
    print("fate of merged-away goldens:", dict(fate))
    print("emitted-cluster detail:", dict(emit_detail))


if __name__ == "__main__":
    main()
