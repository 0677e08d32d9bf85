"""Are our 2D segments centered between the reference's close parallel
segments?  For every (our-segment -> golden-line) node mapping from
/tmp/diag_graph.npz, compute the perpendicular 2D offset of our segment
midpoint to (a) the mapped golden line's residuals in that view and (b) the
nearest OTHER golden residual within 8 px.  Detector smearing shows as
own-offsets ~half the pair gap.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_2d_offset.py
(needs /tmp/diag_graph.npz from tools/diag_cluster_split.py + segment cache)
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import CAMS, CACHE, GOLDEN, IMG_DIR


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

    gold = parse_lines3d_txt(GOLDEN)
    d = np.load("/tmp/diag_graph.npz")
    nodes, node_gold, node_cov = d["nodes"], d["node_gold"], d["node_cov"]
    S = cfg.num_segments
    cam_ids = sorted(pipe._views)
    segs_by_view = {i: pipe._views[c].segments[:S]
                    for i, c in enumerate(cam_ids)}

    res_by_cam: dict[int, list] = {}
    for gi, g in enumerate(gold):
        for r in g.residuals:
            res_by_cam.setdefault(int(r[0]), []).append(
                (gi, float(r[2]), float(r[3]), float(r[4]), float(r[5])))

    own_off, other_off, gaps = [], [], []
    for n_i in range(len(nodes)):
        g = int(node_gold[n_i])
        if g < 0 or node_cov[n_i] < 0.6:
            continue
        v_idx = int(nodes[n_i] // S)
        s_idx = int(nodes[n_i] % S)
        segs = segs_by_view.get(v_idx)
        if segs is None or s_idx >= len(segs):
            continue
        seg = segs[s_idx]
        mid = np.array([(seg[0] + seg[2]) / 2, (seg[1] + seg[3]) / 2])
        d_own, d_other = None, None
        for gi, x1, y1, x2, y2 in res_by_cam.get(cam_ids[v_idx], []):
            a = np.array([x1, y1]); b = np.array([x2, y2])
            dd = b - a; L = np.linalg.norm(dd)
            if L < 1e-9:
                continue
            dn = dd / L
            t = np.clip((mid - a) @ dn, 0, L)
            dist = np.linalg.norm(mid - (a + t * dn))
            if gi == g:
                d_own = dist if d_own is None else min(d_own, dist)
            else:
                d_other = dist if d_other is None else min(d_other, dist)
        if d_own is not None:
            own_off.append(d_own)
            if d_other is not None and d_other < 8.0:
                other_off.append(d_other)
                gaps.append(d_own + d_other)

    own = np.array(own_off); oth = np.array(other_off); gp = np.array(gaps)
    print(f"nodes mapped: {len(own)}; with close other-line (<8px): {len(oth)}")
    print(f"offset to OWN golden residual px: median {np.median(own):.2f}, "
          f"p90 {np.percentile(own, 90):.2f}")
    if len(oth):
        own_c = gp - oth
        print(f"close-pair gap px: median {np.median(gp):.2f}")
        print(f"own-offset px in close pairs: median {np.median(own_c):.2f}; "
              f"own/gap fraction: median "
              f"{np.median(own_c / np.maximum(gp, 1e-9)):.3f} (0.5 = midway)")
        print("own/gap histogram:", np.histogram(
            own_c / np.maximum(gp, 1e-9),
            bins=[0, .15, .3, .45, .6, 1.01])[0].tolist())


if __name__ == "__main__":
    main()
