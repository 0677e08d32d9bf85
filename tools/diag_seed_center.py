"""A/B the seed-anchored density refine (ops/lsd.py `seed_center`) on
golden-residual support, per view.

For each of the first N testdata views, detect fresh with seed_center
off/on, apply the pipeline's min-length + top-3000 filters, and report:

  any   — residuals with >= 60% of samples within 4 px of SOME segment
  excl  — residuals covered under EXCLUSIVE ownership (greedy 1-1: each
          detected segment may serve only one residual) — the binding
          ceiling from diag_golden_support (exclusive 0.8244 < achieved
          count_recall 0.847 means close-parallel goldens share segments)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_seed_center.py [n_views] [knob]

``knob`` is the detect() keyword to A/B (default ``seed_center``; also
``side_split``, ``seed_gate``, ``rect_improve``).
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


def filters(raw, c, cfg):
    diag = float(np.hypot(c["width"], c["height"]))
    lengths = np.hypot(raw[:, 2] - raw[:, 0], raw[:, 3] - raw[:, 1])
    cut = raw[lengths >= diag * cfg.min_line_length_factor]
    cl = lengths[lengths >= diag * cfg.min_line_length_factor]
    if len(cut) > cfg.max_line_segments:
        keep = np.argsort(-cl, kind="stable")[: cfg.max_line_segments]
        keep.sort()
        cut = cut[keep]
    return cut


def exclusive_covered(cov):
    """Greedy 1-1 residual<-segment assignment by coverage, 0.6 floor."""
    cov = cov.copy()
    used_seg = np.zeros(cov.shape[1], bool)
    got = np.zeros(cov.shape[0], bool)
    order = np.argsort(-cov.max(axis=1))
    for e in order:
        cands = np.where(~used_seg & (cov[e] >= 0.6))[0]
        if len(cands):
            used_seg[cands[np.argmax(cov[e][cands])]] = True
            got[e] = True
    return got


def main():
    from PIL import Image

    n_views = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    knob = sys.argv[2] if len(sys.argv) > 2 else "seed_center"
    cfg = l3d.Config()
    cams_j = json.load(open(CAMS))
    gold_lines = parse_lines3d_txt(GOLDEN)
    res_by_cam: dict[int, list] = {}
    for g in gold_lines:
        for r in g.residuals:
            res_by_cam.setdefault(int(r[0]), []).append(r[2:6])

    tot = {k: np.zeros(3, np.int64) for k in ("off", "on")}
    for cam_id_s in sorted(cams_j, key=int)[:n_views]:
        c = cams_j[cam_id_s]
        res = np.array(res_by_cam.get(int(cam_id_s), []), float)
        if not len(res):
            continue
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        line = f"cam {cam_id_s}: "
        for key, sc in (("off", False), ("on", True)):
            t0 = time.time()
            raw = np.asarray(lsd_ops.detect(
                img, max_width=cfg.max_image_width, **{knob: sc}), float)
            top = filters(raw, c, cfg)
            cov = residual_coverage(res, top)
            any_c = int(((cov >= 0.6).any(1)).sum())
            excl = int(exclusive_covered(cov).sum())
            tot[key] += (len(top), any_c, excl)
            line += (f"[{key}] segs={len(top)} any={any_c} excl={excl} "
                     f"({time.time() - t0:.0f}s)  ")
        print(line + f"of {len(res)}", flush=True)
    for key in ("off", "on"):
        print(f"TOTAL {key}: segs={tot[key][0]} any={tot[key][1]} "
              f"excl={tot[key][2]}")


if __name__ == "__main__":
    main()
