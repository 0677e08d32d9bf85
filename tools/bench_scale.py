"""Large-scene throughput: the blocked pipeline on a synthetic V-view scene.

Demonstrates the single-chip scaling path for the survey's 100-2000+ image
configs (BASELINE.md): device memory stays O(view_block * S * M) while V
grows.  Usage:

    PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_scale.py [V] [--cpu]
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
from line3dpp_tpu.camera import rotation_from_rpy


def build_scene(V, S=3000, seed=0):
    rng = np.random.default_rng(seed)
    n_lines = 1500
    P = rng.uniform([-6, -4, 8], [6, 4, 18], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.5, 2.0, size=(n_lines, 1))

    K = np.array([[2400.0, 0, 1536], [0, 2400.0, 1152], [0, 0, 1]])
    views = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.005 * i + 0.2,
                              rng.normal() * 0.02)
        C = np.array([0.12 * i - 0.06 * V, rng.normal() * 0.1,
                      rng.normal() * 0.1])
        cam = l3d.Camera(K, R, -R @ C, 3072, 2304)
        sv = np.hstack([cam.project(P), cam.project(Q)])
        inside = ((sv[:, [0, 2]] > 0) & (sv[:, [0, 2]] < 3072)).all(1) & (
            (sv[:, [1, 3]] > 0) & (sv[:, [1, 3]] < 2304)).all(1)
        sv = sv[inside]
        n_fill = max(0, S - len(sv))
        a = rng.uniform([0, 0], [3072, 2304], size=(n_fill, 2))
        ang = rng.uniform(0, 2 * np.pi, n_fill)
        ln = rng.uniform(20, 300, n_fill)
        b = a + np.stack([np.cos(ang), np.sin(ang)], -1) * ln[:, None]
        segs = np.vstack([sv, np.hstack([a, b])])[:S]
        views.append((cam, segs))
    return views


def main():
    V = next((int(a) for a in sys.argv[1:] if a.isdigit()), 104)
    knn = next((int(a.split("=")[1]) for a in sys.argv
                if a.startswith("--knn=")), 10)
    block = next((int(a.split("=")[1]) for a in sys.argv
                  if a.startswith("--block=")), 26)
    t0 = time.time()
    views = build_scene(V)
    print(f"scene built in {time.time() - t0:.1f}s", flush=True)

    cfg = l3d.Config(optimize=False, view_block=block, knn=knn)
    pipe = l3d.Line3D(cfg)
    for i, (cam, segs) in enumerate(views):
        pipe.add_view(i, cam, segs)

    t0 = time.time()
    pipe.match_images()
    t_match = time.time() - t0
    t0 = time.time()
    lines = pipe.reconstruct_3d_lines()
    t_recon = time.time() - t0

    # device HBM high-water (absent on some backends/relays)
    stats = {}
    try:
        stats = jax.local_devices()[0].memory_stats() or {}
    except Exception:
        pass
    hbm_peak_gb = stats.get("peak_bytes_in_use", 0) / (1 << 30)

    print(json.dumps({
        "views": V,
        "knn": knn,
        "view_block": block,
        "match_s": round(t_match, 1),
        "reconstruct_s": round(t_recon, 1),
        "images_per_sec": round(V / (t_match + t_recon), 2),
        "lines": len(lines),
        "hbm_peak_gb": round(hbm_peak_gb, 2),
    }))


if __name__ == "__main__":
    main()
