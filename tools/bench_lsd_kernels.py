"""Stage-level microbench of one `_lsd_round` on the real image.

`_lsd_core` measures 1.6 s device for 3 rounds but the big stages
(CC 40 ms + merge 56 ms + fits) only account for ~0.6 s — this times each
piece standalone at the true sizes to find the rest (NEXT.md item 2/3).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_lsd_kernels.py
"""
import math
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

sys.path.insert(0, "/root/repo")

from line3dpp_tpu.ops import lsd, lsd_cc, lsd_fit
from PIL import Image

IMG = "/root/reference/testdata/img000057.jpg"


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(jnp.abs(leaves[0].astype(jnp.float32).reshape(-1)[:64])))


def timeit(fn, n=3):
    sync(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


def main():
    img = np.asarray(Image.open(IMG).convert("L"), np.float32)
    H, W = img.shape
    dimg = jnp.asarray(img)
    h2, w2, th, tw, hp, wp, NC, c_cap = lsd._lsd_statics(H, W, 0.62)
    print(f"NC={NC} c_cap={c_cap} grid {hp}x{wp} tile {th}x{tw}", flush=True)

    (angle, used, used_count, idx_used, cvalid, mag_c,
     ang_c) = lsd._grad_compact(dimg, H, W)
    xs_c = (idx_used % wp).astype(jnp.float32)
    ys_c = (idx_used // wp).astype(jnp.float32)
    prec = jnp.float32(math.radians(lsd.ANG_TH))

    # one real CC pass for realistic labels
    lab_d, _ = lsd_cc.cc_tiles(angle, used, prec, tile=(th, tw))
    cap = lsd_cc.auto_link_cap((hp, wp), (th, tw))
    T, _ = lsd_cc.merge_tile_labels(lab_d, angle, used, prec,
                                    tile=(th, tw), link_cap=cap)
    HWp = hp * wp
    safe_idx = jnp.minimum(idx_used, HWp - 1)
    int_max = jnp.int32(2**31 - 1)

    @jax.jit
    def gather_labels(lab_d, T):
        lab_c = lab_d.reshape(-1)[safe_idx]
        return jnp.where(lab_c >= lsd_cc.INVALID, int_max,
                         T[jnp.clip(lab_c, 0, HWp - 1)])
    print(f"label gather x2   : {timeit(lambda: gather_labels(lab_d, T)):8.1f} ms",
          flush=True)
    lab_c = gather_labels(lab_d, T)

    active_c = cvalid & used.reshape(-1)[safe_idx]
    key = jnp.where(active_c & (lab_c < int_max), lab_c, int_max)

    sort4 = jax.jit(lambda k, a, b, c: jax.lax.sort(
        (k, a, b, c), num_keys=1))
    print(f"4-way sort ({NC/1e6:.1f}M) : "
          f"{timeit(lambda: sort4(key, mag_c, ang_c, idx_used)):8.1f} ms",
          flush=True)
    key_s, mag_s, ang_s, idx_s = sort4(key, mag_c, ang_c, idx_used)
    xs_s = (idx_s % wp).astype(jnp.float32)
    ys_s = (idx_s // wp).astype(jnp.float32)

    @jax.jit
    def scans(key_s):
        part_s = key_s < int_max
        new_run = part_s & jnp.concatenate(
            [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])
        is_last = part_s & jnp.concatenate(
            [key_s[1:] != key_s[:-1], jnp.ones((1,), bool)])
        pos = jnp.arange(NC, dtype=jnp.int32)
        start_pos = jax.lax.associative_scan(
            jnp.maximum, jnp.where(new_run, pos, -1))
        end_pos = jnp.flip(jax.lax.associative_scan(
            jnp.minimum, jnp.flip(jnp.where(is_last, pos, NC))))
        big_run = part_s & (end_pos - start_pos + 1 >= 5)
        dlab = jnp.cumsum((new_run & big_run).astype(jnp.int32)) - 1
        slot = jnp.where(big_run & (dlab < c_cap), dlab, c_cap)
        return slot
    print(f"run scans + slot  : {timeit(lambda: scans(key_s)):8.1f} ms",
          flush=True)
    slot = scans(key_s)
    pix = (key_s < int_max).astype(jnp.float32)

    print(f"moments kernel    : "
          f"{timeit(lambda: lsd_fit.moments(slot, xs_s, ys_s, mag_s, pix, c_cap)):8.1f} ms",
          flush=True)
    mom = lsd_fit.moments(slot, xs_s, ys_s, mag_s, pix, c_cap)
    tables = jnp.zeros((8, c_cap + lsd_fit.WIN), jnp.float32)
    tables = tables.at[0, :c_cap].set(1.0).at[4, :c_cap].set(1e9)
    print(f"extents kernel    : "
          f"{timeit(lambda: lsd_fit.extents(slot, xs_s, ys_s, pix, tables, c_cap)):8.1f} ms",
          flush=True)
    print(f"gate_pixels kernel: "
          f"{timeit(lambda: lsd_fit.gate_pixels(slot, xs_s, ys_s, ang_s, pix, tables, jnp.bool_(True), jnp.float32(-2.0), c_cap)):8.1f} ms",
          flush=True)

    @jax.jit
    def table_build(ct, st, cx, cy, gate):
        t = jnp.zeros((8, c_cap + lsd_fit.WIN), jnp.float32)
        return (t.at[0, :c_cap].set(ct).at[1, :c_cap].set(st)
                 .at[2, :c_cap].set(cx).at[3, :c_cap].set(cy)
                 .at[4, :c_cap].set(gate))
    z = jnp.zeros((c_cap,), jnp.float32)
    print(f"table build       : {timeit(lambda: table_build(z, z, z, z, z)):8.1f} ms",
          flush=True)

    @jax.jit
    def consume(consumed_s, idx_s, active):
        consumed_d = jnp.zeros((HWp,), bool).at[
            jnp.where(consumed_s, idx_s, HWp)].set(True, mode="drop")
        return active & ~consumed_d.reshape(hp, wp)
    cs = pix != 0.0
    print(f"consume scatter   : {timeit(lambda: consume(cs, idx_s, used)):8.1f} ms",
          flush=True)

    # betainc NFA at c_cap
    @jax.jit
    def nfa(npix, n):
        k = jnp.minimum(npix, n)
        tail = jax.scipy.special.betainc(
            jnp.maximum(k, 1.0), jnp.maximum(n - k + 1.0, 1.0),
            lsd.ANG_TH / 180.0)
        return -jnp.log10(jnp.maximum(tail, 1e-300))
    npix = mom[6]
    nn = jnp.maximum(npix * 2.0, 1.0)
    print(f"betainc NFA       : {timeit(lambda: nfa(npix, nn)):8.1f} ms",
          flush=True)

    # whole round, compiled standalone (shares the cache with _lsd_core)
    rnd = lambda: lsd._lsd_round(
        angle, used, idx_used, cvalid, mag_c, ang_c, prec,
        jnp.bool_(True),
        th=th, tw=tw, c_cap=c_cap, hw2=h2 * w2, cc_iters=16,
        refine_iters=2, use_pallas_cc=True, link_cap=cap)
    print(f"full _lsd_round   : {timeit(rnd, n=2):8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
