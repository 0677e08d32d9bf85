"""End-to-end golden validation on the bundled testdata sequence.

Runs the full TPU pipeline — LSD detection, epipolar matching, scoring,
clustering, sweep — on the reference's 26 testdata images with cameras
recovered from the golden reconstruction (tools/resect_testdata_cameras.py,
because the upstream vsfm_result.nvm is missing, SURVEY.md §6), then scores
3D recall/precision against `testdata/Line3D++_ref/*.txt`.

Usage:  PYTHONPATH=/root/.axon_site:/root/repo python tools/run_testdata.py [--cpu]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the axon remote compile takes minutes for the
# big fused step; cache executables across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import (
    line_match_metrics, parse_lines3d_txt, scene_scale, segment_set_metrics,
    stack_golden_segments,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG_DIR = "/root/reference/testdata"
GOLDEN_DIR = os.path.join(IMG_DIR, "Line3D++_ref")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")
CACHE = os.path.join(REPO, "testdata", "L3D_cache")


def main():
    from PIL import Image

    optimize = "--optimize" in sys.argv
    block = next((int(a.split("=")[1]) for a in sys.argv
                  if a.startswith("--block=")), -1)
    split = next((float(a.split("=")[1]) for a in sys.argv
                  if a.startswith("--split=")), None)
    cache = next((a.split("=", 1)[1] for a in sys.argv
                  if a.startswith("--cache=")), CACHE)
    rounds = next((int(a.split("=")[1]) for a in sys.argv
                   if a.startswith("--rounds=")), 3)
    cams = json.load(open(CAMS))
    # seed_gate defaults OFF, matching Config: every fresh-detect
    # measurement has it NEGATIVE (round 3: 0.878 vs 0.8855; round 5:
    # 0.8633 vs 0.8738 CPU-fresh) — the old always-on tool default
    # contradicted both.  (--no-seed-gate kept for old command lines.)
    cfg = l3d.Config(optimize=optimize, view_block=block, lsd_rounds=rounds,
                     lsd_rescue="--rescue" in sys.argv,
                     lsd_seed_gate="--seed-gate" in sys.argv)
    if split is not None:
        cfg = dataclasses.replace(cfg, split_bimodal_t=split)
    relcut = next((float(a.split("=")[1]) for a in sys.argv
                   if a.startswith("--relcut=")), None)
    if relcut is not None:
        cfg = dataclasses.replace(cfg, match_rel_cut=relcut)
    minbest = next((float(a.split("=")[1]) for a in sys.argv
                    if a.startswith("--minbest=")), None)
    if minbest is not None:
        cfg = dataclasses.replace(cfg, min_best_score_3d=minbest)
    if "--rdd" in sys.argv:
        cfg = dataclasses.replace(cfg, perform_rdd=True)
    strong = next((float(a.split("=")[1]) for a in sys.argv
                   if a.startswith("--strong=")), None)
    if strong is not None:
        cfg = dataclasses.replace(cfg, split_strong_min=strong)
    canchor = next((float(a.split("=")[1]) for a in sys.argv
                    if a.startswith("--canchor=")), None)
    if canchor is not None:
        cfg = dataclasses.replace(cfg, cluster_strong_min=canchor)
    pipe = l3d.Line3D(cfg)

    t0 = time.time()
    items = []
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(os.path.join(IMG_DIR, c["image"])).convert("L"))
        items.append((int(cam_id), cam, img))
    pipe.add_images(items, cache_dir=cache)   # pipelined detection when cold
    for cam_id, _, _ in items:
        print(f"  view {cam_id}: {len(pipe._views[cam_id].segments)} segments")
    t_detect = time.time() - t0

    t0 = time.time()
    pipe.match_images()
    t_match = time.time() - t0

    t0 = time.time()
    lines = pipe.reconstruct_3d_lines()
    t_recon = time.time() - t0

    print(f"detect {t_detect:.1f}s  match {t_match:.1f}s  reconstruct {t_recon:.1f}s")
    print(f"reconstructed {len(lines)} 3D lines")

    out_dir = os.path.join(REPO, "testdata", "out")
    os.makedirs(out_dir, exist_ok=True)
    tag = cfg.filename_tag()
    pipe.save_txt(os.path.join(out_dir, tag + ".txt"))
    pipe.save_stl(os.path.join(out_dir, tag + ".stl"))
    pipe.save_obj(os.path.join(out_dir, tag + ".obj"))

    golden_txt = os.path.join(
        GOLDEN_DIR,
        "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
        + ("__kNN_10__OPTIMIZED__vis_3.txt" if optimize
           else "__kNN_10__vis_3.txt"),
    )
    gold_lines = parse_lines3d_txt(golden_txt)
    gold = stack_golden_segments(gold_lines)
    pred = (np.concatenate([l.segments3d for l in lines])
            if lines else np.zeros((0, 6)))
    tol = 0.01 * scene_scale(gold)
    m = segment_set_metrics(pred, gold, tol=tol)
    cm = line_match_metrics([l.segments3d for l in lines],
                            [g.segments3d for g in gold_lines], tol=tol)
    m.update(cm)
    print(f"golden: {len(gold_lines)} lines / {len(gold)} segments | "
          f"predicted: {len(lines)} lines / {len(pred)} segments")
    print(f"tol={tol:.3f} (1% of scene scale)")
    print("metrics vs golden:", {k: round(v, 4) for k, v in m.items()})
    return m


if __name__ == "__main__":
    main()
