"""Classify the endpoints of every in-cluster bridge edge of merged parallel
clusters by their confident 2D side (A / B / no-residual / ambiguous), and
print detailed case studies for confident-A <-> confident-B edges: estimate
geometry, edge weight, per-endpoint best scores and the relative score of the
match that created the edge.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_bridge_classes.py
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
from tools.diag_mode_margin import side_2d, perp_to_line3d


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
    tr = np.asarray(st["translation"])
    segs = np.asarray(st["segs"])
    score3d = np.asarray(st["score3d"])
    kept = np.asarray(st["fm"].kept)
    est_valid = np.asarray(st["fm"].est_valid)
    estP1 = np.asarray(st["fm"].est_P1) + tr
    estP2 = np.asarray(st["fm"].est_P2) + tr
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

    # per-node side class within its merged cluster
    node_class = {}
    cluster_gold = {}
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
        cluster_gold[cidx] = (ga, gb, Pa, da, Pb, db)
        for m in mem:
            v, s = nv[m], ns[m]
            cam = cam_ids[v]
            dA, dB = side_2d(segs[v, s],
                             res_by.get((cam, ga), []),
                             res_by.get((cam, gb), []))
            if dA is None or dB is None:
                node_class[m] = "nores"
            elif abs(dA - dB) < 1.0 or min(dA, dB) > 2.5:
                node_class[m] = "ambig"
            else:
                node_class[m] = "A" if dA < dB else "B"

    # in-cluster edges of merged clusters: endpoint class pairs
    pair_count = Counter()
    ab_cases = []
    for e in range(len(li)):
        u, v_ = li[e], lj[e]
        cu, cv_ = inv[u], inv[v_]
        if cu != cv_ or cu not in cluster_gold:
            continue
        a = node_class.get(u, "?")
        b = node_class.get(v_, "?")
        key = "-".join(sorted([a, b]))
        pair_count[key] += 1
        if key == "A-B":
            ab_cases.append((e, u, v_, cu))

    print("in-cluster edge endpoint classes (merged clusters):")
    for kk, cc in pair_count.most_common():
        print(f"  {kk:14s}: {cc}")

    print(f"\nconfident A-B edges: {len(ab_cases)}; case studies:")
    for e, u, v_, cidx in ab_cases[:12]:
        ga, gb, Pa, da, Pb, db = cluster_gold[cidx]
        rows = []
        for m in (u, v_):
            vv, ss = nv[m], ns[m]
            emid = 0.5 * (estP1[vv, ss] + estP2[vv, ss])
            eA = perp_to_line3d(emid, Pa, da)
            eB = perp_to_line3d(emid, Pb, db)
            km = kept[vv, ss]
            best = float(score3d[vv, ss][km].max()) if km.any() else 0.0
            rows.append((node_class[m], vv, ss, eA, eB, best))
        sepv = perp_to_line3d(Pa, Pb, db)
        print(f"  w={ww[e]:.3f} sep3d={sepv:.4f} | " + " | ".join(
            f"{r[0]} v{r[1]} s{r[2]} dA={r[3]:.4f} dB={r[4]:.4f} "
            f"best={r[5]:.1f}" for r in rows))


if __name__ == "__main__":
    main()
