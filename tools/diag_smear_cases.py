"""Case study: WHY are best-hypothesis estimates smeared between close
parallel golden lines?  For every member of a 2-golden merged cluster whose
estimate endpoint sits >40% toward the other line, classify its best match:

  cross-side : the best match's TARGET segment maps to the OTHER golden line
               (matching confusion; check whether a same-side candidate was
               kept with lower score)
  same-side  : target maps to its own line -> triangulation noise, not
               match confusion.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_smear_cases.py
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
from tools.diag_bridge_geometry import line_rep


def main():
    from PIL import Image
    from collections import Counter, defaultdict

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

    fm = st["fm"]
    estP1 = np.asarray(fm.est_P1) + tr
    estP2 = np.asarray(fm.est_P2) + tr
    kept = np.asarray(fm.kept)
    score3d = np.asarray(st["score3d"])
    t_seg = np.asarray(st["t_seg"])
    nbr = st["neighbor_ids"]
    M = t_seg.shape[2]
    N = nbr.shape[1]
    k = M // N

    # global node -> golden map for ALL (view,seg), not just graph nodes
    g_of = {}
    for n_i in range(len(nodes)):
        if node_gold[n_i] >= 0 and node_cov[n_i] >= 0.6:
            g_of[(int(nodes[n_i] // S), int(nodes[n_i] % S))] = int(node_gold[n_i])

    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)
    uniq, inv = np.unique(labels, return_inverse=True)
    members = defaultdict(list)
    for n_i in range(len(nodes)):
        members[inv[n_i]].append(n_i)

    n_smeared = 0
    cls = Counter()
    same_side_avail = 0
    for cidx, mem in members.items():
        gs = Counter(int(node_gold[m]) for m in mem if node_gold[m] >= 0)
        solid = [g2 for g2, k2 in gs.items() if k2 >= 2]
        if len(solid) != 2:
            continue
        ga, gb = solid
        Pa, da, La = line_rep(gold[ga])
        Pb, db, Lb = line_rep(gold[gb])
        if abs(da @ db) < 0.985:
            continue
        for m in mem:
            g2 = int(node_gold[m])
            if g2 not in (ga, gb):
                continue
            own = (Pa, da) if g2 == ga else (Pb, db)
            oth = (Pb, db) if g2 == ga else (Pa, da)
            v, s = nv[m], ns[m]
            fr = []
            for E in (estP1[v, s], estP2[v, s]):
                wo = E - own[0]
                d_o = np.linalg.norm(wo - (wo @ own[1]) * own[1])
                wt = E - oth[0]
                d_t = np.linalg.norm(wt - (wt @ oth[1]) * oth[1])
                if d_o + d_t > 1e-12:
                    fr.append(d_o / (d_o + d_t))
            if not fr or max(fr) <= 0.4:
                continue
            n_smeared += 1
            # best kept match slot
            sc = np.where(kept[v, s], score3d[v, s], 0.0)
            if sc.max() <= 0:
                cls["no-kept"] += 1
                continue
            bs = int(sc.argmax())
            tv = int(nbr[v, bs // k])
            ts = int(t_seg[v, s, bs])
            tg = g_of.get((tv, ts), -2)
            own_gid = g2
            other_gid = gb if g2 == ga else ga
            if tg == own_gid:
                cls["same-side-best"] += 1
            elif tg == other_gid:
                cls["cross-side-best"] += 1
                # was a same-side candidate kept at all?
                found = False
                for mm in np.where(kept[v, s])[0]:
                    tv2 = int(nbr[v, mm // k])
                    ts2 = int(t_seg[v, s, mm])
                    if g_of.get((tv2, ts2), -2) == own_gid:
                        found = True
                        break
                same_side_avail += found
            else:
                cls["unmapped-best"] += 1

    print(f"smeared members (est >40% toward other line): {n_smeared}")
    print("best-match classification:", dict(cls))
    print(f"cross-side-best cases with a same-side candidate kept: "
          f"{same_side_avail}")


if __name__ == "__main__":
    main()
