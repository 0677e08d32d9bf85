"""Score bimodal-split candidates against the golden node mapping.

Runs the full reconstruction with split diagnostics enabled
(Line3D._split_records), maps every member (view, seg) to its golden 3D
line via the golden residuals, then labels each candidate split:

  good — the two sides' majority golden ids differ (the split separates
         two reference lines)
  bad  — both sides map to the SAME golden id (we would cut a real line)
  ????  — a side is unmapped-dominant (can't tell)

and prints the delta / Ashman-D / size distributions per label, so the
accept gates in pipeline._split_bimodal_clusters can be tuned on evidence
instead of sweeps (NEXT.md item 1).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_split_quality.py [gap_t]
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

import dataclasses

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import (
    CAMS, CACHE, GOLDEN, IMG_DIR, map_nodes_to_golden)


def side_label(node_gold_map, vs, ss, S):
    ids = [node_gold_map.get(v * S + s, -1) for v, s in zip(vs, ss)]
    cnt = Counter(i for i in ids if i >= 0)
    if not cnt or sum(cnt.values()) < 0.5 * len(ids):
        return -1
    return cnt.most_common(1)[0][0]


def main():
    from PIL import Image

    gap_t = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    cams = json.load(open(CAMS))
    cfg = dataclasses.replace(l3d.Config(optimize=False),
                              split_bimodal_t=gap_t)
    pipe = l3d.Line3D(cfg)
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    pipe._split_records = []
    pipe.reconstruct_3d_lines()
    print(f"candidates recorded: {len(pipe._split_records)} "
          f"(gap_t={gap_t})", flush=True)

    st = pipe._last_state
    S = st["mask"].shape[1]
    gold_lines = parse_lines3d_txt(GOLDEN)
    # map all member nodes of all candidates
    all_nodes = set()
    for r in pipe._split_records:
        for side in ("lo", "hi"):
            vs, ss = r[side]
            all_nodes.update(int(v) * S + int(s) for v, s in zip(vs, ss))
    nodes = np.array(sorted(all_nodes), np.int64)
    cam_ids = sorted(pipe._views)
    node_gold, _ = map_nodes_to_golden(st, nodes, cam_ids, gold_lines)
    gmap = dict(zip(nodes.tolist(), node_gold.tolist()))

    rows = []
    for r in pipe._split_records:
        glo = side_label(gmap, *r["lo"], S)
        ghi = side_label(gmap, *r["hi"], S)
        if glo < 0 or ghi < 0:
            lab = "unknown"
        elif glo != ghi:
            lab = "good"
        else:
            lab = "bad"
        rows.append((lab, r))

    # 2D evidence per candidate: views contributing segments to BOTH sides,
    # and the lateral (perpendicular) pixel offset between the sides' 2D
    # segments in those shared views (two parallel close golden lines are
    # observed as two laterally-offset 2D segments; one golden line is not)
    segs2d = np.asarray(st["segs"])

    def feats2d(r):
        vlo, slo = r["lo"]
        vhi, shi = r["hi"]
        shared = sorted(set(vlo.tolist()) & set(vhi.tolist()))
        offs = []
        for v in shared:
            a = segs2d[v, slo[vlo == v]]          # (nl, 4)
            b = segs2d[v, shi[vhi == v]]          # (nh, 4)
            for sa in a:
                d2 = sa[2:] - sa[:2]
                L = max(np.linalg.norm(d2), 1e-9)
                nvec = np.array([-d2[1], d2[0]]) / L
                for sb in b:
                    mb = 0.5 * (sb[:2] + sb[2:])
                    offs.append(abs(float((mb - sa[:2]) @ nvec)))
        return len(shared), (float(np.median(offs)) if offs else -1.0)

    for lab in ("good", "bad", "unknown"):
        sel = [r for l, r in rows if l == lab]
        ap = [r for r in sel if r["applied"]]
        if not sel:
            continue
        dl = np.array([r["delta"] for r in sel])
        Ds = np.array([r["D"] for r in sel])
        ns = np.array([r["n"] for r in sel])
        f2 = [feats2d(r) for r in sel]
        nsh = np.array([f[0] for f in f2])
        off = np.array([f[1] for f in f2])
        has = off >= 0
        print(f"{lab:8s}: {len(sel):4d} candidates ({len(ap)} applied) | "
              f"delta p25/50/75 {np.percentile(dl, [25, 50, 75]).round(2)} | "
              f"D p25/50/75 {np.percentile(Ds, [25, 50, 75]).round(2)} | "
              f"n median {int(np.median(ns))}")
        print(f"          shared-views p25/50/75 "
              f"{np.percentile(nsh, [25, 50, 75]).round(1)} | with-offset "
              f"{has.sum()}/{len(sel)} | 2D offset px p25/50/75 "
              f"{np.percentile(off[has], [25, 50, 75]).round(2) if has.any() else '-'}")
    # applied-only confusion
    ap_lab = Counter(l for l, r in rows if r["applied"])
    print("applied splits by label:", dict(ap_lab))
    # candidate pool above/below possible gates
    for lab in ("good", "bad"):
        sel = [r for l, r in rows if l == lab]
        for dt in (0.75, 1.0, 1.25, 1.5, 2.0):
            k = sum(r["delta"] >= dt for r in sel)
            print(f"  {lab}: delta>={dt}: {k}", end="")
        print()


if __name__ == "__main__":
    main()
