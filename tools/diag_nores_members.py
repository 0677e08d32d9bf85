"""Who are the merged-cluster members the reference did NOT keep?

diag_mode_margin shows that confidently-sided members almost always pick the
right depth mode (1266/1311); the bridge population is the ~1300 members with
no axially-overlapping reference residual of either golden line in their own
camera.  Classify them:

  overhang-(A|B) : perpendicular within 2.5 px of a residual line of A/B but
                   axially OUTSIDE the reference's support interval -> our
                   segment covers image area the reference's sweep cut away
  other-line     : covered (>=0.5) by residuals of a third golden line ->
                   cluster contamination (ref used it elsewhere)
  ref-unused     : no residual of ANY golden line covers it -> the reference
                   dropped it (or never detected it)

Then: remove all no-residual members from the graph, recluster, and count how
many of the merged clusters split into their A/B cores — the upper bound on
count-F1 gain from reproducing the reference's keep/drop decisions.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_nores_members.py
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
from line3dpp_tpu.ops import clustering as clustering_ops
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, build_graph, map_nodes_to_golden)
from tools.diag_bridge_geometry import line_rep
from tools.diag_mode_margin import side_2d


def cover_frac(seg, rows, tol=2.5):
    """Fraction of OUR segment's samples within tol px of any residual
    segment (finite) in rows."""
    if not rows:
        return 0.0
    ts = np.linspace(0, 1, 9)
    pts = seg[None, :2] * (1 - ts[:, None]) + seg[None, 2:] * ts[:, None]
    best = np.zeros(9, bool)
    for r in rows:
        a = np.asarray(r[:2], float)
        d = np.asarray(r[2:], float) - a
        L2 = max(float(d @ d), 1e-12)
        t = np.clip((pts - a) @ d / L2, 0, 1)
        cl = a + t[:, None] * d
        best |= np.linalg.norm(pts - cl, axis=1) < tol
    return best.mean()


def perp_band(seg, rows, tol=2.5):
    """True if OUR segment midpoint is within tol px of the INFINITE line of
    any residual in rows (no axial requirement)."""
    mid = 0.5 * (seg[:2] + seg[2:])
    for r in rows:
        a = np.asarray(r[:2], float)
        d = np.asarray(r[2:], float) - a
        L = np.linalg.norm(d)
        if L < 1e-6:
            continue
        d = d / L
        w = mid - a
        if abs(float(w[0] * d[1] - w[1] * d[0])) < tol:
            return True
    return False


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
    kept = np.asarray(st["fm"].kept)
    est_valid = np.asarray(st["fm"].est_valid)
    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)

    res_by = defaultdict(list)          # (cam, golden) -> residual coords
    res_cam = defaultdict(list)         # cam -> all residual coords
    for gi, g in enumerate(gold):
        for r in g.residuals:
            res_by[(int(r[0]), gi)].append(r[2:6])
            res_cam[int(r[0])].append(r[2:6])

    uniq, inv = np.unique(labels, return_inverse=True)
    members = defaultdict(list)
    for n_i in range(len(nodes)):
        members[inv[n_i]].append(n_i)

    klass = Counter()
    nores_nodes = []
    stats = defaultdict(list)
    merged_cluster_ids = []
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
        merged_cluster_ids.append(cidx)
        for m in mem:
            v, s = nv[m], ns[m]
            if not est_valid[v, s]:
                continue
            cam = cam_ids[v]
            ra = res_by.get((cam, ga), [])
            rb = res_by.get((cam, gb), [])
            dA, dB = side_2d(segs[v, s], ra, rb)
            if dA is not None and dB is not None:
                continue                      # confidently sided elsewhere
            seg = segs[v, s]
            if perp_band(seg, ra) or perp_band(seg, rb):
                klass["overhang"] += 1
                tag = "overhang"
            else:
                others = [r for gi2 in range(len(gold))
                          for r in res_by.get((cam, gi2), [])
                          if gi2 not in (ga, gb)]
                if cover_frac(seg, others) >= 0.5:
                    klass["other-line"] += 1
                    tag = "other-line"
                else:
                    klass["ref-unused"] += 1
                    tag = "ref-unused"
            nores_nodes.append(m)
            # properties
            L2d = np.linalg.norm(seg[2:] - seg[:2])
            stats[tag + "-len"].append(L2d)
            km = kept[v, s]
            stats[tag + "-score"].append(
                float(score3d[v, s][km].max()) if km.any() else 0.0)

    print(f"merged parallel clusters: {len(merged_cluster_ids)}")
    print("no-residual member classes:", dict(klass))
    for tag in ("overhang", "other-line", "ref-unused"):
        if stats[tag + "-len"]:
            print(f"  {tag}: len2d median {np.median(stats[tag+'-len']):.0f}px"
                  f", best-score median {np.median(stats[tag+'-score']):.2f}")

    # comparison: confident members' properties
    # simulate: drop all no-residual members, recluster, count splits
    drop = np.zeros(len(nodes), bool)
    drop[nores_nodes] = True
    keep_e = ~(drop[li] | drop[lj])
    ei = np.concatenate([li[keep_e], lj[keep_e]])
    ej = np.concatenate([lj[keep_e], li[keep_e]])
    ew = np.concatenate([ww[keep_e], ww[keep_e]]).astype(np.float32)
    lab2 = clustering_ops.cluster_edges(ei, ej, ew, len(nodes),
                                        pipe.config.felzenszwalb_c)
    # how many of the merged clusters now have their A and B cores separated?
    n_split = 0
    for cidx in merged_cluster_ids:
        mem = members[cidx]
        gs = Counter(int(node_gold[m]) for m in mem if node_gold[m] >= 0)
        solid = [g for g, k2 in gs.items() if k2 >= 2][:2]
        ga, gb = solid
        la = {lab2[m] for m in mem if node_gold[m] == ga and not drop[m]}
        lb = {lab2[m] for m in mem if node_gold[m] == gb and not drop[m]}
        if la and lb and not (la & lb):
            n_split += 1
    print(f"after dropping no-residual members: {n_split}/"
          f"{len(merged_cluster_ids)} merged clusters have separated A/B cores")


if __name__ == "__main__":
    main()
