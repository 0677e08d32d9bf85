"""Measured CPU stand-in baseline for bench.py's `vs_baseline`.

The reference CPU Line3D++ cannot be built in this image (no Eigen/Boost,
zero egress), so the baseline divisor is THIS framework's identical math
executed end-to-end on the host CPU via the XLA CPU backend: LSD detection
(no segment caches) + epipolar matching + scoring + filtering + affinity +
clustering/fit/sweep on the same 26 testdata images bench.py times on TPU.
This replaces the round-1..3 estimate of 0.1 images/s, which was
corroborated only for phase 2 (VERDICT r3 missing-item 3).

Protocol: one warmup pass populates the persistent XLA compile cache, then
the reported number is the best of two timed passes (same best-of-N rule as
bench.py; segment caches disabled throughout so every pass pays detection).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_cpu_baseline.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# CLAUDE.md: the axon plugin overrides JAX_PLATFORMS; force CPU after import
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d

IMG_DIR = "/root/reference/testdata"
CAMS = os.path.join(os.path.dirname(__file__), "..", "testdata",
                    "cameras_testdata.json")
OUT = os.path.join(os.path.dirname(__file__), "..", ".bench_cpu_baseline.json")


def one_pass():
    from PIL import Image

    cams = json.load(open(CAMS))
    cfg = l3d.Config(optimize=False, load_segments=False)
    pipe = l3d.Line3D(cfg)
    t0 = time.perf_counter()
    items = []
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]),
                         np.array(c["t"]), c["width"], c["height"])
        img = np.asarray(
            Image.open(os.path.join(IMG_DIR, c["image"])).convert("L"))
        items.append((int(cam_id), cam, img))
    pipe.add_images(items)
    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    dt = time.perf_counter() - t0
    assert len(lines) > 500, f"implausible reconstruction: {len(lines)} lines"
    return len(cams), dt


def main():
    assert jax.default_backend() == "cpu", jax.default_backend()
    n, dt_warm = one_pass()
    print(f"warmup pass: {n} images in {dt_warm:.1f}s "
          f"({n / dt_warm:.4f} img/s, includes CPU compiles)", flush=True)
    times = []
    for i in range(2):
        _, dt = one_pass()
        times.append(dt)
        print(f"timed pass {i}: {dt:.1f}s ({n / dt:.4f} img/s)", flush=True)
    dt = min(times)
    result = {
        "metric": "cpu_e2e_images_per_sec",
        "value": round(n / dt, 4),
        "unit": ("images/s, full pipeline on XLA CPU (26x 3072x2304: LSD "
                 "detect + match + score + affinity + cluster/fit/sweep; "
                 "no segment caches; best of 2 after warmup)"),
        "seconds_best": round(dt, 1),
        "host": os.uname().nodename,
        "cpus": os.cpu_count(),
    }
    json.dump(result, open(OUT, "w"), indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
