"""Geometry of cluster-merging bridge edges: for each cluster that claims two
golden 3D lines, measure (a) the separation of the two golden lines (world +
pixels at the observing view), and (b) where our member estimates sit
relative to the two golden lines (on-line vs in-between).

Distinguishes two failure modes for the count-F1 gap (NEXT.md item 1):
  - estimates clean + golden separation < ~2.5 px  -> the similarity kernel
    (sigmaP) cannot separate them; the reference graph must lack the match
    edge itself (kNN competition / different 2D segments).
  - estimates smeared between the lines -> our matching/scoring picks mixed
    hypotheses; fix upstream.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_bridge_geometry.py
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
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, build_graph, map_nodes_to_golden)


def line_rep(g):
    """(P0, dir, L) for a golden line's longest 3D segment."""
    best, bl = None, -1.0
    for s in g.segments3d:
        p, q = np.array(s[:3]), np.array(s[3:6])
        L = np.linalg.norm(q - p)
        if L > bl:
            bl, best = L, (p, q)
    p, q = best
    d = (q - p) / max(bl, 1e-12)
    return p, d, bl


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

    st, nodes, li, lj, ww, labels = build_graph(pipe)
    cam_ids = sorted(pipe._views)
    gold = parse_lines3d_txt(GOLDEN)
    node_gold, node_cov = map_nodes_to_golden(st, nodes, cam_ids, gold)
    S = st["mask"].shape[1]
    tr = st["translation"]

    estP1 = np.asarray(pipe._last_state["fm"].est_P1) + tr
    estP2 = np.asarray(pipe._last_state["fm"].est_P2) + tr
    k_reg = np.asarray(st["cb"].k_reg)
    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)

    from collections import Counter, defaultdict
    uniq, inv = np.unique(labels, return_inverse=True)
    members = defaultdict(list)
    for n_i in range(len(nodes)):
        members[inv[n_i]].append(n_i)

    sep_px_list, est_pos_list = [], []
    n_cases = 0
    for cidx, mem in members.items():
        gs = Counter(int(node_gold[m]) for m in mem if node_gold[m] >= 0)
        solid = [g for g, k2 in gs.items() if k2 >= 2]
        if len(solid) != 2:
            continue
        ga, gb = solid
        Pa, da, La = line_rep(gold[ga])
        Pb, db, Lb = line_rep(gold[gb])
        if abs(da @ db) < 0.985:
            continue          # not parallel: different failure class
        # separation at overlap midpoint of line A
        t_mid = 0.5 * La
        X = Pa + t_mid * da
        w = X - Pb
        sep = np.linalg.norm(w - (w @ db) * db)
        # pixel scale at the first member's view: sigma = k*depth -> px =
        # world / (k*depth) * sigma_p
        m0 = mem[0]
        v0 = nv[m0]
        depth = np.linalg.norm(X - np.asarray(st["cb"].C[v0]) - tr)
        px_per_world = 2.5 / max(k_reg[v0] * depth, 1e-12)
        sep_px = sep * px_per_world
        sep_px_list.append(sep_px)
        # member estimate positions: perpendicular offset fraction between
        # the two lines (0 = on A, 1 = on B, 0.5 = midway), per endpoint
        for m in mem:
            if node_gold[m] not in (ga, gb):
                continue
            on_a = node_gold[m] == ga
            for E in (estP1[nv[m], ns[m]], estP2[nv[m], ns[m]]):
                wa = E - Pa
                d_a = np.linalg.norm(wa - (wa @ da) * da)
                wb = E - Pb
                d_b = np.linalg.norm(wb - (wb @ db) * db)
                tot = d_a + d_b
                if tot < 1e-12:
                    continue
                frac = (d_a / tot) if on_a else (d_b / tot)
                est_pos_list.append(frac)   # 0 = on own line, 1 = on other
        n_cases += 1

    sep_px = np.array(sep_px_list)
    pos = np.array(est_pos_list)
    print(f"2-golden parallel merged clusters: {n_cases}")
    print(f"golden separation px: median {np.median(sep_px):.2f}, "
          f"p25 {np.percentile(sep_px,25):.2f}, p75 {np.percentile(sep_px,75):.2f}")
    print("separation histogram (px):",
          np.histogram(sep_px, bins=[0,1,2,3,4,6,10,100])[0].tolist())
    print(f"member-estimate offset fraction toward OTHER line "
          f"(0=own,0.5=midway): median {np.median(pos):.3f}, "
          f"p90 {np.percentile(pos,90):.3f}")
    print("offset histogram:", np.histogram(pos, bins=[0,.1,.2,.3,.4,.5,1.01])[0].tolist())


if __name__ == "__main__":
    main()
