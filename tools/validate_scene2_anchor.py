"""Scene-2 transfer check for the anchored (bridge-resistant) clustering
knob ``cluster_strong_min`` (ops/clustering.cluster_edges_anchored).

Same rendered facade + ground truth as tools/validate_scene2.py; sweeps
cluster_strong_min over {0, 1, 2, 3} at the default config to see whether
two-tier clustering transfers off the golden testdata or is another
testdata-calibrated compensation (like split_bimodal_t, SECOND_SCENE.md).

Usage:
  PYTHONPATH=... python tools/validate_scene2_anchor.py [--cpu] [--quick]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import (line_match_metrics, scene_scale,
                                       segment_set_metrics)
from tools.validate_scene2 import build_scene, make_cameras, render


def main():
    quick = "--quick" in sys.argv
    quads, gt = build_scene()
    cams = make_cameras(V=6 if quick else 10)
    t0 = time.time()
    images = [render(c, quads, seed=100 + i) for i, c in enumerate(cams)]
    print(f"rendered {len(images)} views in {time.time() - t0:.1f}s "
          f"({len(gt)} ground-truth lines)", flush=True)

    tol = 0.01 * scene_scale(gt)
    gold_lines = [gt[i:i + 1] for i in range(len(gt))]

    rows = []
    for anchor in (0.0, 1.0, 2.0, 3.0):
        cfg = l3d.Config(num_neighbors=6, cluster_strong_min=anchor)
        pipe = l3d.Line3D(cfg)
        pipe.add_images([(i, cam, img) for i, (cam, img)
                         in enumerate(zip(cams, images))],
                        cache_dir="/tmp/scene2_cache")
        pipe.match_images()
        lines = pipe.reconstruct_3d_lines()
        pred_segs = (np.concatenate([l.segments3d for l in lines])
                     if lines else np.zeros((0, 6)))
        sm = segment_set_metrics(pred_segs, gt, tol=tol)
        lm = line_match_metrics([l.segments3d for l in lines], gold_lines,
                                tol=tol)
        rows.append((anchor, len(lines), sm, lm))
        print(f"anchor={anchor:<4} lines={len(lines):<4} "
              f"recall={sm['recall']:.3f} precision={sm['precision']:.3f} "
              f"count_f1={lm['count_f1']:.3f}", flush=True)

    print("\n| cluster_strong_min | lines | recall | precision | count_f1 |")
    print("|---|---|---|---|---|")
    for anchor, n, sm, lm in rows:
        print(f"| {anchor} | {n} | {sm['recall']:.3f} | "
              f"{sm['precision']:.3f} | {lm['count_f1']:.3f} |")


if __name__ == "__main__":
    main()
