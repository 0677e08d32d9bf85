"""Per-phase timing of the cold e2e bench (bench.py workload): two passes,
reporting detect / match / reconstruct wall separately.  Pass 2 is the
warm number (compile caches + executables loaded).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_phases.py [--cpu]
"""
from __future__ import annotations

import json
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

IMG_DIR = "/root/reference/testdata"
CAMS = os.path.join(os.path.dirname(__file__), "..", "testdata",
                    "cameras_testdata.json")


def one_pass(items):
    cfg = l3d.Config(optimize=False, load_segments=False)
    pipe = l3d.Line3D(cfg)
    t0 = time.perf_counter()
    pipe.add_images(items)
    t1 = time.perf_counter()
    pipe.match_images()
    t2 = time.perf_counter()
    lines = pipe.reconstruct_3d_lines()
    t3 = time.perf_counter()
    return dict(detect=t1 - t0, match=t2 - t1, reconstruct=t3 - t2,
                total=t3 - t0, lines=len(lines))


def main():
    from PIL import Image

    cams = json.load(open(CAMS))
    items = []
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(
            Image.open(os.path.join(IMG_DIR, c["image"])).convert("L"))
        items.append((int(cam_id), cam, img))

    for p in range(2):
        r = one_pass(items)
        n = len(items)
        print(f"pass {p}: total {r['total']:.1f}s ({n / r['total']:.3f} img/s)"
              f" | detect {r['detect']:.1f}s ({r['detect'] / n:.2f}/img)"
              f" | match {r['match']:.1f}s | reconstruct "
              f"{r['reconstruct']:.1f}s | {r['lines']} lines", flush=True)


if __name__ == "__main__":
    main()
