"""Where does the LSD detector lose the 'undetected' golden residuals?

For one camera, take every golden residual 2D segment with no covering
detected segment (tools/diag_no_nodes.py 'undetected' bucket) and walk the
detector's stages on that image:

  raw-rejected  — an NFA-rejected raw rectangle covers it (acceptance
                  threshold is the loss point)
  cut-at-rank   — a raw ACCEPTED rectangle covers it but it fell below the
                  top-3000-by-length cut or the min-length filter
  inactive      — most of its pixels fail the gradient threshold rho
                  (QUANT/sin(prec), lsd.cpp:762) — invisible to the detector
  cc-lost       — pixels are active but no raw rectangle (accepted or not)
                  covers it: the CC/refit stages dissolved the region

Usage: PYTHONPATH=... python tools/diag_undetected.py [cam_id]
"""
from __future__ import annotations

import json
import math
import os
import sys
from collections import Counter

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

from line3dpp_tpu.ops import lsd
from line3dpp_tpu.utils import segments_cache
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from tools.diag_2d_granularity import seg_cover
from tools.diag_cluster_split import CACHE, GOLDEN, IMG_DIR

REPO = os.path.join(os.path.dirname(__file__), "..")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")


def main():
    from PIL import Image

    cam_id = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    cams = json.load(open(CAMS))
    c = cams[str(cam_id)]
    img = np.asarray(Image.open(
        os.path.join(IMG_DIR, c["image"])).convert("L"), np.float32)
    H, W = img.shape

    dets = segments_cache.load(CACHE, cam_id, (H, W), 3000)[:, :4]
    gold = parse_lines3d_txt(GOLDEN)
    resids = []
    for g in gold:
        for r in g.residuals:
            if int(r[0]) == cam_id:
                resids.append(np.asarray(r[2:6], float))
    und = [r for r in resids if seg_cover(r, dets)[0] < 0]
    print(f"cam {cam_id}: {len(resids)} residuals, {len(und)} undetected "
          f"by the cached top-3000", flush=True)
    if not und:
        return

    # raw candidates: all rectangle fits BEFORE the NFA cut
    segs, ok, diag = jax.jit(
        lsd._lsd_core, static_argnums=(1, 2))(jnp.asarray(img), H, W)
    segs = np.asarray(segs)
    ok = np.asarray(ok)
    real = np.linalg.norm(segs[:, 2:] - segs[:, :2], axis=1) > 1e-3
    acc, rej = segs[ok & real], segs[~ok & real]
    print(f"raw rectangles: {real.sum()} ({(ok & real).sum()} accepted)",
          flush=True)

    # gradient-activity field at detection scale
    h2 = int(round(H * lsd.SCALE))
    w2 = int(round(W * lsd.SCALE))
    kern = jnp.asarray(lsd._gaussian_kernel(lsd.SIGMA_SCALE / lsd.SCALE))
    blurred = lsd._separable_blur(jnp.asarray(img), kern)
    simg = lsd._bilinear_resize(blurred, h2, w2)
    a = simg
    gx = (lsd._shift(a, 0, 1, 0) - a + lsd._shift(a, 1, 1, 0)
          - lsd._shift(a, 1, 0, 0)) * 0.5
    gy = (lsd._shift(a, 1, 0, 0) - a + lsd._shift(a, 1, 1, 0)
          - lsd._shift(a, 0, 1, 0)) * 0.5
    mag = np.asarray(jnp.sqrt(gx * gx + gy * gy))
    rho = lsd.QUANT / math.sin(math.radians(lsd.ANG_TH))

    # min-length/top-3000 context
    lens = np.hypot(dets[:, 2] - dets[:, 0], dets[:, 3] - dets[:, 1])
    rank_len = lens.min() if len(lens) == 3000 else 0.0

    cls = Counter()
    for r in und:
        j_a, cov_a = seg_cover(r, acc) if len(acc) else (-1, 0.0)
        j_r, cov_r = seg_cover(r, rej) if len(rej) else (-1, 0.0)
        if j_a >= 0:
            cls["cut-at-rank"] += 1        # accepted but lost at top-K/minlen
            continue
        if j_r >= 0:
            cls["raw-rejected"] += 1
            continue
        # union coverage by ALL raw rectangles: several small pieces each
        # below the 0.6 single-segment bar means fragmentation, not loss
        allr = segs[real]
        ts9 = np.linspace(0, 1, 9)[:, None]
        p9 = r[:2] * (1 - ts9) + r[2:] * ts9
        a0 = allr[:, :2]
        d0 = allr[:, 2:] - a0
        len2 = np.maximum((d0 * d0).sum(-1), 1e-12)
        w0 = p9[:, None, :] - a0[None]
        t0 = np.clip((w0 * d0[None]).sum(-1) / len2[None], 0, 1)
        cl = a0[None] + t0[..., None] * d0[None]
        dist = np.linalg.norm(p9[:, None] - cl, axis=-1).min(1)
        if (dist < 2.5).mean() >= 0.6:
            cls["fragmented"] += 1
            continue
        ts = np.linspace(0, 1, 17)
        pts = (r[:2][None] * (1 - ts[:, None]) + r[2:][None] * ts[:, None])
        px = np.clip((pts * lsd.SCALE).astype(int), 0,
                     [w2 - 1, h2 - 1])
        act = mag[px[:, 1], px[:, 0]] > rho
        if act.mean() < 0.5:
            cls["inactive"] += 1
        else:
            cls["cc-lost"] += 1
    print("undetected classification:", dict(cls))
    print(f"(3000th detected length {rank_len:.1f} px; undetected residual "
          f"lengths p25/50/75 "
          f"{np.percentile([np.hypot(r[2]-r[0], r[3]-r[1]) for r in und], [25,50,75]).round(0)})")


if __name__ == "__main__":
    main()
