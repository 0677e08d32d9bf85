"""WHY does the best-hypothesis argmax pick the wrong depth mode?

For members of 2-golden merged clusters whose TRUE 2D side is confidently
known (sub-pixel signed distance to the reference residual lines in the
member's own camera), recompute every kept match's triangulated hypothesis,
classify it as A-mode / B-mode / other by 3D distance to the two golden
lines, and measure the score margin between the chosen (wrong) mode and the
best correct-mode hypothesis.

Decides between:
  - large margins  -> our scores are systematically wrong for these segments
                      (confirmation structure differs from the reference)
  - tiny margins   -> argmax is a coin flip; the reference wins it by having
                      slightly different candidates (detection-level) and no
                      per-case fix at the scoring layer will transfer.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_mode_margin.py
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


def perp_to_line3d(P, P0, d):
    w = P - P0
    return float(np.linalg.norm(w - (w @ d) * d))


def side_2d(seg, res_a, res_b):
    """Sub-pixel side assignment of OUR 2D segment vs the reference residual
    lines of golden A and B in the same camera.  Returns (dA, dB) as the
    unsigned perpendicular midpoint distances to the nearest axially
    overlapping residual of each golden line, or None when a side has no
    usable residual."""
    mid = 0.5 * (seg[:2] + seg[2:])

    def best(rows):
        out = None
        for r in rows:
            a = np.array(r[:2])
            b = np.array(r[2:])
            d = b - a
            L = np.linalg.norm(d)
            if L < 1e-6:
                continue
            d = d / L
            t = (mid - a) @ d
            if t < -10.0 or t > L + 10.0:     # no axial overlap
                continue
            perp = abs(float(np.cross(d, mid - a)))
            if out is None or perp < out:
                out = perp
        return out

    return best(res_a), best(res_b)


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
    r1 = np.asarray(st["r1"])
    r2 = np.asarray(st["r2"])
    C = np.asarray(st["cb"].C)
    score3d = np.asarray(st["score3d"])
    t_seg = np.asarray(st["t_seg"])
    kept = np.asarray(st["fm"].kept)
    est_valid = np.asarray(st["fm"].est_valid)
    estP1 = np.asarray(st["fm"].est_P1) + tr
    estP2 = np.asarray(st["fm"].est_P2) + tr
    neighbor_ids = np.asarray(st["neighbor_ids"])
    N = neighbor_ids.shape[1]
    M = t_seg.shape[2]
    k = M // N

    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)

    # residuals per (cam, golden)
    res_by = defaultdict(list)
    for gi, g in enumerate(gold):
        for r in g.residuals:
            res_by[(int(r[0]), gi)].append(r[2:6])

    uniq, inv = np.unique(labels, return_inverse=True)
    members = defaultdict(list)
    for n_i in range(len(nodes)):
        members[inv[n_i]].append(n_i)

    # precompute target plane normals for all segments: n = r1 x r2
    n_all = np.cross(r1, r2)
    n_all /= np.maximum(np.linalg.norm(n_all, axis=-1, keepdims=True), 1e-12)

    margins_wrong = []      # chosen-wrong: best_wrong - best_true
    margins_right = []      # chosen-right: best_true - best_wrong
    conf_cams = []          # (true_mode_cams, wrong_mode_cams) for wrong picks
    side_conf = Counter()
    n_clusters = 0
    mode_counts_wrong = []

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
        n_clusters += 1
        for m in mem:
            v, s = nv[m], ns[m]
            if not est_valid[v, s]:
                continue
            cam = cam_ids[v]
            ra = res_by.get((cam, ga), [])
            rb = res_by.get((cam, gb), [])
            dA, dB = side_2d(segs[v, s], ra, rb)
            if dA is None or dB is None:
                side_conf["no-residual"] += 1
                continue
            if abs(dA - dB) < 1.0 or min(dA, dB) > 2.5:
                side_conf["ambiguous"] += 1
                continue
            true_is_a = dA < dB
            side_conf["confident"] += 1

            # estimate side in 3D
            emid = 0.5 * (estP1[v, s] + estP2[v, s])
            eA = perp_to_line3d(emid, Pa, da)
            eB = perp_to_line3d(emid, Pb, db)
            est_is_a = eA < eB
            chose_wrong = est_is_a != true_is_a

            # per-match hypotheses (kept only): triangulate + classify mode
            km = np.where(kept[v, s])[0]
            if not len(km):
                continue
            tviews = neighbor_ids[v, km // k]
            tsegs = t_seg[v, s, km]
            nrm = n_all[tviews, tsegs]                       # (K,3)
            denom1 = nrm @ r1[v, s]
            denom2 = nrm @ r2[v, s]
            num = np.einsum("kj,kj->k", nrm, C[tviews] - C[v][None])
            with np.errstate(divide="ignore", invalid="ignore"):
                d1 = num / denom1
                d2 = num / denom2
            P1h = C[v][None] + r1[v, s][None] * d1[:, None] + tr
            P2h = C[v][None] + r2[v, s][None] * d2[:, None] + tr
            mid_h = 0.5 * (P1h + P2h)
            wa = mid_h - Pa
            hA = np.linalg.norm(wa - (wa @ da)[:, None] * da[None], axis=1)
            wb = mid_h - Pb
            hB = np.linalg.norm(wb - (wb @ db)[:, None] * db[None], axis=1)
            sep = perp_to_line3d(Pb + ((Pa - Pb) @ db) * db + Pb * 0, Pb, db)
            # mode: close to one line and clearly closer than to the other
            lim = max(0.75 * np.linalg.norm(
                (Pa - Pb) - ((Pa - Pb) @ db) * db), 1e-6)
            is_a_mode = (hA < lim) & (hA < hB)
            is_b_mode = (hB < lim) & (hB < hA)
            sc = score3d[v, s, km]
            true_m = is_a_mode if true_is_a else is_b_mode
            wrong_m = is_b_mode if true_is_a else is_a_mode
            bt = sc[true_m].max() if true_m.any() else 0.0
            bw = sc[wrong_m].max() if wrong_m.any() else 0.0
            if chose_wrong:
                margins_wrong.append(bw - bt)
                conf_cams.append((
                    len(set(tviews[true_m])), len(set(tviews[wrong_m]))))
                mode_counts_wrong.append(
                    (int(true_m.sum()), int(wrong_m.sum())))
            else:
                margins_right.append(bt - bw)

    print(f"parallel 2-golden clusters: {n_clusters}")
    print(f"2D side assignment: {dict(side_conf)}")
    mw = np.array(margins_wrong)
    mr = np.array(margins_right)
    print(f"WRONG-side picks: {len(mw)}; margin (wrong-true): "
          f"median {np.median(mw):.3f} p25 {np.percentile(mw,25):.3f} "
          f"p75 {np.percentile(mw,75):.3f}" if len(mw) else "none")
    if len(mw):
        print("  margin histogram:",
              np.histogram(mw, bins=[-5, -1, -.3, -.1, 0, .1, .3, 1, 5])[0])
        cc = np.array(conf_cams)
        print(f"  confirming cams true-mode median {np.median(cc[:,0]):.1f} "
              f"wrong-mode {np.median(cc[:,1]):.1f}")
        mc = np.array(mode_counts_wrong)
        print(f"  kept matches true-mode median {np.median(mc[:,0]):.1f} "
              f"wrong-mode {np.median(mc[:,1]):.1f}; "
              f"true-mode==0: {(mc[:,0]==0).mean()*100:.0f}%")
    print(f"RIGHT-side picks: {len(mr)}; margin (true-wrong): "
          f"median {np.median(mr):.3f}" if len(mr) else "none")


if __name__ == "__main__":
    main()
