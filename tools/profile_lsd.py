"""Phase-level profiling of the TPU LSD detector.

Times the major stages of ops/lsd.py separately on one real image so we
know where the 10.6 s/image (round-1) goes: gradient field, connected
components, rectangle fits, NFA, compaction.  Best-of-N after warmup
(axon relay variance — CLAUDE.md).
"""
import sys, time, math
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_l3d")

from line3dpp_tpu.ops import lsd
from PIL import Image

IMG = "/root/reference/testdata/img000057.jpg"


def sync(x):
    if isinstance(x, (tuple, list, dict)):
        leaves = jax.tree_util.tree_leaves(x)
        x = leaves[0]
    return float(jnp.sum(jnp.abs(x.astype(jnp.float32).reshape(-1)[:128])))


def timeit(fn, n=3, warmup=1):
    for _ in range(warmup):
        sync(fn())
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    img = np.asarray(Image.open(IMG).convert("L"), np.float32)
    H, W = img.shape
    print(f"image {W}x{H}", flush=True)
    dimg = jnp.asarray(img)

    sigma = lsd.SIGMA_SCALE / lsd.SCALE
    kern = jnp.asarray(lsd._gaussian_kernel(sigma))
    h2, w2 = int(round(H * lsd.SCALE)), int(round(W * lsd.SCALE))

    @jax.jit
    def grad_field(im):
        blurred = lsd._separable_blur(im, kern)
        simg = lsd._bilinear_resize(blurred, h2, w2)
        a = simg
        gx = (lsd._shift(a, 0, 1, 0) - a + lsd._shift(a, 1, 1, 0) - lsd._shift(a, 1, 0, 0)) * 0.5
        gy = (lsd._shift(a, 1, 0, 0) - a + lsd._shift(a, 1, 1, 0) - lsd._shift(a, 0, 1, 0)) * 0.5
        mag = jnp.sqrt(gx * gx + gy * gy)
        angle = jnp.arctan2(gx, -gy)
        prec = math.radians(lsd.ANG_TH)
        rho = lsd.QUANT / math.sin(prec)
        used = mag > rho
        used = used.at[h2 - 1, :].set(False).at[:, w2 - 1].set(False)
        return mag, angle, used

    t = timeit(lambda: grad_field(dimg))
    print(f"grad field        : {t*1e3:8.1f} ms", flush=True)
    mag, angle, used = jax.jit(grad_field)(dimg)
    prec = math.radians(lsd.ANG_TH)
    frac = float(jnp.mean(used.astype(jnp.float32)))
    print(f"active pixels     : {frac*100:.1f}% of {h2*w2}", flush=True)

    from line3dpp_tpu.ops import lsd_cc
    th, tw = lsd._tile_for(h2, w2)
    hp, wp = lsd._round_up(h2, th), lsd._round_up(w2, tw)
    angle_p = jnp.pad(angle, ((0, hp - h2), (0, wp - w2)),
                      constant_values=lsd._BIG_ANGLE)
    used_p = jnp.pad(used, ((0, hp - h2), (0, wp - w2)))

    on_tpu = jax.default_backend() == "tpu"
    if on_tpu:
        t = timeit(lambda: lsd_cc.cc_tiles(angle_p, used_p,
                                           jnp.float32(prec), tile=(th, tw)))
        print(f"CC pallas tiles   : {t*1e3:8.1f} ms", flush=True)
        lab, _ = lsd_cc.cc_tiles(angle_p, used_p, jnp.float32(prec),
                                 tile=(th, tw))
        t = timeit(lambda: lsd_cc.merge_tile_labels(
            lab, angle_p, used_p, jnp.float32(prec), tile=(th, tw)))
        print(f"CC border merge   : {t*1e3:8.1f} ms", flush=True)
        cap = lsd_cc.auto_link_cap((hp, wp), (th, tw))
        t = timeit(lambda: lsd_cc.merge_tile_labels(
            lab, angle_p, used_p, jnp.float32(prec), tile=(th, tw),
            link_cap=cap))
        _, nv = lsd_cc.merge_tile_labels(
            lab, angle_p, used_p, jnp.float32(prec), tile=(th, tw),
            link_cap=cap)
        print(f"CC merge compacted: {t*1e3:8.1f} ms "
              f"(links {int(nv)}/{cap})", flush=True)
    else:
        cc = jax.jit(lambda a, u: lsd._connected_components(
            a, u, jnp.float32(prec), n_iters=16))
        t = timeit(lambda: cc(angle_p, used_p))
        print(f"CC (16 iters)     : {t*1e3:8.1f} ms", flush=True)

    # full core
    t = timeit(lambda: lsd._lsd_core(dimg, H, W, use_pallas_cc=on_tpu), n=2)
    print(f"full _lsd_core    : {t*1e3:8.1f} ms", flush=True)

    # full detect incl. host compaction + merge (twice: warm timing)
    for tag in ("cold", "warm"):
        t0 = time.perf_counter()
        segs = lsd.detect(img)
        print(f"full detect {tag}  : {(time.perf_counter()-t0)*1e3:8.1f} ms,"
              f" {len(segs)} segs", flush=True)


if __name__ == "__main__":
    main()
