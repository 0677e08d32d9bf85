"""Pre-compile the pipeline's device programs for a given image shape.

The axon relay compiles remotely and takes minutes for the fused detection
program; every program is stored in the persistent compilation cache
(/root/repo/.jax_cache), so this is a ONE-TIME cost per machine and image
shape.  Run this at install time (or first contact with a new camera
resolution) to move the wait out of the first reconstruction:

  PYTHONPATH=/root/.axon_site:/root/repo python tools/warmup_compile.py [WxH ...]

Defaults to 3072x2304 (the testdata shape).  Also warms the phase-2
fused step at the default testdata scale.  Prints per-program wall times;
the total is the documented cold-compile number (VERDICT r2 #8).
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def main():
    shapes = []
    for a in sys.argv[1:]:
        if "x" in a:
            w, h = a.split("x")
            shapes.append((int(h), int(w)))
    if not shapes:
        shapes = [(2304, 3072)]

    on_tpu = jax.default_backend() == "tpu"
    t_all = time.perf_counter()

    from line3dpp_tpu.ops import lsd

    for H, W in shapes:
        t0 = time.perf_counter()
        img = jnp.zeros((H, W), jnp.uint8)
        out = lsd._detect_compact(img, H, W, on_tpu)
        jax.device_get(out[2])
        print(f"detect program {W}x{H}: {time.perf_counter() - t0:.0f}s",
              flush=True)

    # phase-2 fused step at testdata scale (V=26, S=3000, N=10, k=10)
    t0 = time.perf_counter()
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import bench

    host_args = bench.make_workload(V=26, S=3000, N=10)
    args = tuple(jnp.asarray(a) for a in host_args)
    from line3dpp_tpu.models.step import forward_step

    out = forward_step(
        *args, epipolar_overlap=0.25, knn=10, two_sig_a_sqr=200.0,
        min_similarity=0.5, check_orientation=True, min_best_score=0.75,
        min_best_score_perc=0.10, min_affinity=0.5, pair_chunk=8,
        use_pallas_matching=on_tpu, use_pallas_scoring=on_tpu)
    float(jnp.sum(out.score3d))
    print(f"phase-2 step program: {time.perf_counter() - t0:.0f}s",
          flush=True)
    print(f"total warmup: {time.perf_counter() - t_all:.0f}s", flush=True)


if __name__ == "__main__":
    main()
