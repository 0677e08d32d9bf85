"""Per-round surviving-active-pixel counts across the 26 testdata images.

Sizes the round-3 inter-round shrink cap (NEXT.md item 2: rounds 2-3 run at
NC2 = 0.50*h2*w2 since the round-3 snapshot; round 3 could run shorter if
post-round-2 survivors are measurably fewer).  Mirrors `_lsd_core`'s round
loop and prints used_count / n_alive after rounds 1 and 2 as fractions of
h2*w2, plus wall per image.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_round_alive.py [--cpu] [N]
"""

from __future__ import annotations

import math
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

import jax.numpy as jnp

from line3dpp_tpu.ops import lsd, lsd_cc
from PIL import Image

IMG_DIR = "/root/reference/testdata"


def main():
    n_img = next((int(a) for a in sys.argv[1:] if a.isdigit()), 26)
    names = sorted(f for f in os.listdir(IMG_DIR) if f.endswith(".jpg"))[:n_img]
    use_pallas = jax.default_backend() == "tpu"
    fracs1, fracs2 = [], []
    for name in names:
        img = np.asarray(Image.open(os.path.join(IMG_DIR, name)).convert("L"),
                         np.float32)
        H, W = img.shape
        h2, w2, th, tw, hp, wp, NC, c_cap = lsd._lsd_statics(H, W, 0.62)
        NC2 = min(NC, lsd._round_up(int(0.50 * h2 * w2) + 1024, 8192))
        t0 = time.perf_counter()
        (angle, used, used_count, idx_used, cvalid, mag_c,
         ang_c) = lsd._grad_compact(jnp.asarray(img), H, W)
        prec_f = jnp.float32(math.radians(lsd.ANG_TH))
        link_cap = (lsd_cc.auto_link_cap((hp, wp), (th, tw))
                    if use_pallas else 0)
        active_d = used
        cur = (idx_used, cvalid, mag_c, ang_c)
        alive = []
        for r, link_tol in enumerate((prec_f, prec_f * 0.5, prec_f * 0.25)):
            segs_r, ok_r, active_d, diag, nxt = lsd._lsd_round(
                angle, active_d, *cur, link_tol, jnp.bool_(r < 2),
                th=th, tw=tw, c_cap=c_cap, hw2=h2 * w2, cc_iters=16,
                refine_iters=2, use_pallas_cc=use_pallas, link_cap=link_cap,
                next_nc=NC2)
            if r < 2:
                alive.append(int(diag["n_alive"]))
            if nxt is not None:
                idx2, mag2, ang2 = nxt
                cur = (idx2, idx2 < hp * wp, mag2, ang2)
        dt = time.perf_counter() - t0
        uc = int(used_count)
        hw = h2 * w2
        fracs1.append(alive[0] / hw)
        fracs2.append(alive[1] / hw)
        print(f"{name}: used {uc/hw:.3f}  alive_r1 {alive[0]/hw:.3f}  "
              f"alive_r2 {alive[1]/hw:.3f}  (NC2 {NC2/hw:.3f})  {dt:.2f}s",
              flush=True)
    print(f"max alive_r1 {max(fracs1):.3f}  max alive_r2 {max(fracs2):.3f}")


if __name__ == "__main__":
    main()
