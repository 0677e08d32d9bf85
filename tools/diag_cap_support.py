"""Does the 3000-segment cap (or the min-length cut) cost golden-residual
support? (follow-up to diag_golden_support: 250 goldens lack any >=3-view
support, 437 lack exclusive support — is the missing support
detected-but-cut, or never detected at all?)

Detect selected views fresh (full candidate list from ops.lsd.detect) and
report residual coverage (60%/4px, as diag_golden_support) at three filter
stages: raw candidates -> min-length cut -> top-3000 by length
(pipeline.add_view, reference line3D.cc:320-360).

Usage: PYTHONPATH=... python tools/diag_cap_support.py [n_views]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.ops import lsd as lsd_ops
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_cluster_split import CAMS, GOLDEN, IMG_DIR
from tools.diag_golden_support import residual_coverage


def main():
    from PIL import Image

    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    cfg = l3d.Config()

    cams_j = json.load(open(CAMS))
    gold_lines = parse_lines3d_txt(GOLDEN)
    res_by_cam: dict[int, list] = {}
    for gi, g in enumerate(gold_lines):
        for r in g.residuals:
            res_by_cam.setdefault(int(r[0]), []).append(r[2:6])

    tot = np.zeros(3, np.int64)
    tot_res = 0
    for cam_id_s in sorted(cams_j, key=int)[:n_views]:
        cam_id = int(cam_id_s)
        c = cams_j[cam_id_s]
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        res = np.array(res_by_cam.get(cam_id, []), float)
        if not len(res):
            continue
        t0 = time.time()
        raw = np.asarray(lsd_ops.detect(img, max_width=cfg.max_image_width),
                         float)
        dt = time.time() - t0
        diag = float(np.hypot(c["width"], c["height"]))
        lengths = np.hypot(raw[:, 2] - raw[:, 0], raw[:, 3] - raw[:, 1])
        min_len = diag * cfg.min_line_length_factor
        cut = raw[lengths >= min_len]
        cl = lengths[lengths >= min_len]
        if len(cut) > cfg.max_line_segments:
            keep = np.argsort(-cl, kind="stable")[: cfg.max_line_segments]
            keep.sort()
            top = cut[keep]
        else:
            top = cut
        row = []
        for segs in (raw, cut, top):
            cov = residual_coverage(res, segs)
            row.append(int(((cov >= 0.6).any(1)).sum()))
        tot += row
        tot_res += len(res)
        print(f"cam {cam_id}: raw={len(raw)} cut={len(cut)} top={len(top)} | "
              f"covered {row[0]}/{row[1]}/{row[2]} of {len(res)} residuals "
              f"({dt:.1f}s)", flush=True)
    print(f"\nTOTAL covered raw/min-len/top3000: "
          f"{tot[0]}/{tot[1]}/{tot[2]} of {tot_res}")


if __name__ == "__main__":
    main()
