"""TPU-native LSD line-segment detection.

The reference vendors the IPOL LSD detector (reference: lsd/lsd.cpp:2025
`LineSegmentDetection`; used by detectLineSegments line3D.cc:312-318), whose
core is an inherently *sequential* greedy region growing over a gradient
pseudo-ordering (lsd.cpp:1704-1754).  That formulation cannot map to a vector
machine, so this is an algorithmic redesign (SURVEY.md §7.1, §7.4):

1. Gaussian subsample (scale 0.8) and the level-line angle field
   (`ll_angle`, lsd.cpp:752-890) are data-parallel image stencils — plain XLA
   convs and elementwise ops.
2. Region growing becomes **connected components by iterated label
   propagation**: 8-neighbor pixels whose level-line angles agree within the
   22.5° tolerance are linked; alternating neighbor-min "hooking" with
   pointer-jumping converges in O(log diameter) fixed iterations.
3. Rectangle fit (lsd.cpp:1611), density check (lsd.cpp:1947) and the NFA
   a-contrario validation (lsd.cpp:1074, binomial tail) are **batched over
   all candidate regions at once** via segment reductions and
   ``betainc``-based binomial tails.

Segment sets are validated *statistically* against a reference detector
(OpenCV LSD) in tests; the pipeline's golden metric is 3D recall/precision,
which tolerates detector-level differences (SURVEY.md §4, §7.4).
"""

from __future__ import annotations

import functools
import math

import numpy as np

import jax
import jax.numpy as jnp

# canonical LSD parameters (lsd.cpp defaults; reference lsd/lsd.hpp:80-128)
SCALE = 0.8
SIGMA_SCALE = 0.6
QUANT = 2.0
ANG_TH = 22.5
DENSITY_TH = 0.7
LOG_EPS = 0.0

_INVALID = jnp.int32(2**30)


def _gaussian_kernel(sigma: float) -> np.ndarray:
    h = max(1, int(math.ceil(sigma * math.sqrt(2.0 * math.log(1000.0)))))
    x = np.arange(-h, h + 1, dtype=np.float64)
    k = np.exp(-0.5 * (x / sigma) ** 2)
    return (k / k.sum()).astype(np.float32)


def _separable_blur(img: jnp.ndarray, kern: jnp.ndarray) -> jnp.ndarray:
    """Reflect-padded separable Gaussian blur of a (H, W) image."""
    K = kern.shape[0]
    h = K // 2
    x = jnp.pad(img, ((h, h), (0, 0)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], kern.reshape(1, 1, K, 1),
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (h, h)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], kern.reshape(1, 1, 1, K),
        window_strides=(1, 1), padding="VALID",
    )[0, 0]
    return x


def _bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    return jax.image.resize(img, (out_h, out_w), method="bilinear")


def _angle_diff(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """|a - b| wrapped to [0, pi] (level-line angles are 2π-periodic
    directions; lsd.cpp `angle_diff`)."""
    d = jnp.abs(a - b)
    d = jnp.where(d > 2.0 * jnp.pi, d - 2.0 * jnp.pi, d)
    return jnp.where(d > jnp.pi, 2.0 * jnp.pi - d, d)


def _shift(x: jnp.ndarray, dy: int, dx: int, fill):
    """Shift a (H, W) array so out[y, x] = x[y+dy, x+dx], edge-filled."""
    out = jnp.roll(x, (-dy, -dx), axis=(0, 1))
    H, W = x.shape
    if dy == 1:
        out = out.at[H - 1, :].set(fill)
    elif dy == -1:
        out = out.at[0, :].set(fill)
    if dx == 1:
        out = out.at[:, W - 1].set(fill)
    elif dx == -1:
        out = out.at[:, 0].set(fill)
    return out


_NEIGHBORS = ((0, 1), (0, -1), (1, 0), (-1, 0), (1, 1), (1, -1), (-1, 1), (-1, -1))


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _connected_components(angle, used, tol, n_iters: int = 24):
    """Min-label connected components over the aligned-neighbor graph.

    Returns per-pixel root labels (flattened indices); unused pixels get
    _INVALID.  Hooking (neighbor min) + two pointer jumps per iteration
    gives O(log diameter) convergence.
    """
    H, W = angle.shape
    idx = jnp.arange(H * W, dtype=jnp.int32).reshape(H, W)
    lab = jnp.where(used, idx, _INVALID)

    def body(_, lab):
        best = lab
        for dy, dx in _NEIGHBORS:
            n_ang = _shift(angle, dy, dx, 100.0)
            n_lab = _shift(lab, dy, dx, _INVALID)
            aligned = used & (_angle_diff(angle, n_ang) <= tol)
            best = jnp.minimum(best, jnp.where(aligned, n_lab, _INVALID))
        flat = best.reshape(-1)
        safe = jnp.where(flat == _INVALID, 0, flat)
        # pointer jumping: label <- label[label], twice
        for _ in range(2):
            jumped = jnp.take(flat, safe)
            flat = jnp.where(flat == _INVALID, _INVALID, jumped)
            safe = jnp.where(flat == _INVALID, 0, flat)
        return flat.reshape(H, W)

    return jax.lax.fori_loop(0, n_iters, body, lab)


@functools.partial(jax.jit, static_argnames=("H", "W", "n_rounds",
                                              "cc_iters", "refine_iters"))
def _lsd_core(img: jnp.ndarray, H: int, W: int, n_rounds: int = 3,
              cc_iters: int = 16, refine_iters: int = 2):
    # iteration defaults ablated on testdata: (16, 2) matches (24, 3)'s
    # OpenCV-LSD coverage (0.82 at the >=80%-within-3px criterion) at 28%
    # less device time (10.6 s vs 14.4 s per 3072x2304 image)
    """Full detection on an already-loaded (H, W) float32 grayscale image
    in [0, 255].  Returns per-pixel-slot candidate segments + validity —
    compacted on the host."""
    # 1. Gaussian subsample to SCALE (lsd.cpp `gaussian_sampler`)
    sigma = SIGMA_SCALE / SCALE
    kern = jnp.asarray(_gaussian_kernel(sigma))
    blurred = _separable_blur(img, kern)
    h2, w2 = int(round(H * SCALE)), int(round(W * SCALE))
    simg = _bilinear_resize(blurred, h2, w2)

    # 2. level-line angle field (lsd.cpp ll_angle): 2x2 gradient masks
    a = simg
    gx = (_shift(a, 0, 1, 0) - a + _shift(a, 1, 1, 0) - _shift(a, 1, 0, 0)) * 0.5
    gy = (_shift(a, 1, 0, 0) - a + _shift(a, 1, 1, 0) - _shift(a, 0, 1, 0)) * 0.5
    mag = jnp.sqrt(gx * gx + gy * gy)
    angle = jnp.arctan2(gx, -gy)

    prec = math.radians(ANG_TH)
    rho = QUANT / math.sin(prec)       # gradient-magnitude threshold
    used = mag > rho
    # last row/col have no valid 2x2 gradient
    used = used.at[h2 - 1, :].set(False).at[:, w2 - 1].set(False)

    # 3..5: multi-round extraction.  Each round runs connected components on
    # the still-active pixels, fits/refines rectangles, validates by
    # density + NFA, then removes accepted rectangles' pixels — the parallel
    # analog of LSD marking region pixels USED so remaining structures (e.g.
    # a parallel line merged into the same gradient blob) can form their own
    # regions in the next round (lsd.cpp:2082-2091).
    HW = h2 * w2
    ys = jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 0).reshape(-1)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h2, w2), 1).reshape(-1)
    mag_flat = mag.reshape(-1)
    big = jnp.float32(1e9)
    prec_f = jnp.float32(prec)

    def one_round(active_flat, link_tol):
        lab = _connected_components(angle, used & active_flat.reshape(h2, w2),
                                    link_tol, n_iters=cc_iters)
        flat_lab = jnp.where(active_flat, lab.reshape(-1), 0)
        uflat = active_flat & used.reshape(-1)

        def fit(pix):
            """Weighted rectangle fit of every component over members pix."""
            wgt = jnp.where(pix, mag_flat, 0.0)
            seg_sum = lambda v: jax.ops.segment_sum(v, flat_lab, HW)
            sw = seg_sum(wgt)
            swz = jnp.maximum(sw, 1e-12)
            cx = seg_sum(wgt * xs) / swz
            cy = seg_sum(wgt * ys) / swz
            ixx = seg_sum(wgt * xs * xs) / swz - cx * cx
            iyy = seg_sum(wgt * ys * ys) / swz - cy * cy
            ixy = seg_sum(wgt * xs * ys) / swz - cx * cy
            npix = seg_sum(jnp.where(pix, 1.0, 0.0))

            # rectangle main direction = max-variance eigenvector of the
            # weighted scatter matrix (equivalent to lsd.cpp `get_theta`'s
            # smallest-inertia axis; inertia vs covariance swap x/y)
            diff = ixx - iyy
            disc = jnp.sqrt(diff * diff + 4.0 * ixy * ixy)
            lmax_eig = 0.5 * (ixx + iyy + disc)
            theta = jnp.where(
                jnp.abs(lmax_eig - ixx) > jnp.abs(lmax_eig - iyy),
                jnp.arctan2(lmax_eig - ixx, ixy),
                jnp.arctan2(ixy, lmax_eig - iyy),
            )

            ct = jnp.take(jnp.cos(theta), flat_lab)
            st = jnp.take(jnp.sin(theta), flat_lab)
            dxp = xs - jnp.take(cx, flat_lab)
            dyp = ys - jnp.take(cy, flat_lab)
            l_proj = dxp * ct + dyp * st
            w_proj = -dxp * st + dyp * ct
            seg_min = lambda v: jax.ops.segment_min(
                jnp.where(pix, v, big), flat_lab, HW)
            seg_max = lambda v: jax.ops.segment_max(
                jnp.where(pix, v, -big), flat_lab, HW)
            lmin, lmax = seg_min(l_proj), seg_max(l_proj)
            wmin, wmax = seg_min(w_proj), seg_max(w_proj)
            length = lmax - lmin
            width = jnp.maximum(wmax - wmin, 1.0)
            area = jnp.maximum(length, 1.0) * width
            density = npix / jnp.maximum(area, 1e-12)
            return dict(cx=cx, cy=cy, theta=theta, npix=npix,
                        lmin=lmin, lmax=lmax, wmin=wmin, wmax=wmax,
                        length=length, width=width, density=density,
                        w_proj=w_proj)

        # density refinement (lsd.cpp `refine`/`reduce_region_radius`):
        # failing components shrink toward their fitted axis and refit —
        # the parallel analog of LSD's iterative radius reduction.
        pix = uflat
        f = fit(pix)
        for _ in range(refine_iters):
            fail = f["density"] < DENSITY_TH
            half_w = jnp.maximum(
                jnp.maximum(jnp.abs(f["wmin"]), jnp.abs(f["wmax"])) * 0.6, 0.75)
            keep = jnp.abs(f["w_proj"]) <= jnp.take(half_w, flat_lab)
            pix = pix & (keep | ~jnp.take(fail, flat_lab))
            f = fit(pix)

        # NFA a-contrario validation (lsd.cpp `nfa`): binomial tail
        # P(X >= k | n, p), p = ANG_TH/180, n = rectangle area, k = aligned.
        p = ANG_TH / 180.0
        n = jnp.maximum(f["length"], 1.0) * f["width"]
        n = jnp.maximum(n, 1.0)
        k = jnp.minimum(f["npix"], n)
        tail = jax.scipy.special.betainc(
            jnp.maximum(k, 1.0), jnp.maximum(n - k + 1.0, 1.0), p)
        log_ntests = 2.5 * jnp.log10(jnp.float32(HW))   # (HW)^{5/2} tests
        log_nfa = -(log_ntests + jnp.log10(jnp.maximum(tail, 1e-300)))

        # a component's stats live at its root pixel slot only
        roots = jnp.arange(HW, dtype=jnp.int32)
        is_root = jax.ops.segment_min(
            jnp.where(uflat, jnp.arange(HW, dtype=jnp.int32), _INVALID),
            flat_lab, HW) == roots

        ok = (
            is_root
            & (f["npix"] >= 5.0)
            & (f["density"] >= DENSITY_TH)
            & (log_nfa > LOG_EPS)
        )

        # remove accepted rectangles' pixels for the next round: any active
        # pixel within the accepted component's rectangle width band
        # (root slots carry ok; members read the value at their root label)
        acc_of_label = jnp.take(ok, flat_lab)
        half_final = jnp.maximum(jnp.abs(f["wmin"]), jnp.abs(f["wmax"])) + 0.75
        in_rect = jnp.abs(f["w_proj"]) <= jnp.take(half_final, flat_lab)
        consumed = uflat & acc_of_label & in_rect

        # endpoints in subsampled coords -> original coords
        # (/SCALE upscale as lsd.cpp:2103-2108)
        cx, cy, theta = f["cx"], f["cy"], f["theta"]
        ex1 = (cx + f["lmin"] * jnp.cos(theta)) / SCALE
        ey1 = (cy + f["lmin"] * jnp.sin(theta)) / SCALE
        ex2 = (cx + f["lmax"] * jnp.cos(theta)) / SCALE
        ey2 = (cy + f["lmax"] * jnp.sin(theta)) / SCALE
        segs = jnp.stack([ex1, ey1, ex2, ey2], axis=-1)
        diag = dict(npix=f["npix"], density=f["density"], log_nfa=log_nfa,
                    is_root=is_root, length=f["length"], width=f["width"])
        return segs, ok, consumed, diag

    # round 1 links at the full 22.5° tolerance; later rounds re-cluster the
    # leftover pixels with tighter tolerances so smoothly-curving chains and
    # corner blobs (where the pairwise-link formulation over-merges relative
    # to LSD's region-angle test) split into straight pieces.
    active = jnp.ones(HW, dtype=bool)
    all_segs, all_ok = [], []
    diag = None
    for link_tol in (prec_f, prec_f * 0.5, prec_f * 0.25)[:n_rounds]:
        segs_r, ok_r, consumed, diag = one_round(active, link_tol)
        all_segs.append(segs_r)
        all_ok.append(ok_r)
        active = active & ~consumed

    segs = jnp.concatenate(all_segs, axis=0)
    ok = jnp.concatenate(all_ok, axis=0)
    return segs, ok, diag


def merge_collinear(segs: np.ndarray, angle_tol_deg: float = 2.0,
                    rho_tol: float = 2.5, gap_tol: float = 8.0) -> np.ndarray:
    """Merge collinear, nearly-touching fragments into single segments.

    The multi-round extraction fragments some long edges into pieces; left
    unmerged they rank low in the top-K-by-length selection
    (line3D.cc:320-360) and crowd out true structure.  Segments are hashed by
    quantized line parameters (θ mod π, signed offset ρ) on two offset grids
    each (to dodge quantization boundaries), then chains within a bucket are
    joined greedily along the line when the projection gap is < ``gap_tol``.
    """
    if len(segs) == 0:
        return segs
    segs = np.asarray(segs, np.float64)
    d = segs[:, 2:4] - segs[:, 0:2]
    L = np.maximum(np.hypot(d[:, 0], d[:, 1]), 1e-12)
    theta = np.arctan2(d[:, 1], d[:, 0]) % np.pi          # direction mod pi
    nx, ny = -np.sin(theta), np.cos(theta)
    rho = segs[:, 0] * nx + segs[:, 1] * ny               # line offset

    parent = np.arange(len(segs))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    ang_q = angle_tol_deg * np.pi / 180.0
    for a_off in (0.0, 0.5):
        for r_off in (0.0, 0.5):
            tq = np.floor(theta / ang_q + a_off).astype(np.int64)
            # wrap: theta near pi and near 0 are the same line direction
            tq_mod = tq % max(int(np.pi / ang_q), 1)
            rq = np.floor(rho / rho_tol + r_off).astype(np.int64)
            buckets: dict = {}
            for i, key in enumerate(zip(tq_mod.tolist(), rq.tolist())):
                buckets.setdefault(key, []).append(i)
            for members in buckets.values():
                if len(members) < 2:
                    continue
                m = np.array(members)
                # project onto the mean direction of the bucket
                th = theta[m[0]]
                ux, uy = np.cos(th), np.sin(th)
                p1 = segs[m, 0] * ux + segs[m, 1] * uy
                p2 = segs[m, 2] * ux + segs[m, 3] * uy
                lo = np.minimum(p1, p2)
                hi = np.maximum(p1, p2)
                order = np.argsort(lo)
                for a, b in zip(order[:-1], order[1:]):
                    if lo[b] - hi[a] <= gap_tol:
                        ra, rb = find(m[a]), find(m[b])
                        if ra != rb:
                            parent[rb] = ra

    roots = np.array([find(i) for i in range(len(segs))])
    out = []
    for r in np.unique(roots):
        member = np.nonzero(roots == r)[0]
        if len(member) == 1:
            out.append(segs[member[0]])
            continue
        # refit: extreme endpoints along the length-weighted mean direction
        th = np.arctan2(
            np.sum(np.sin(2 * theta[member]) * L[member]),
            np.sum(np.cos(2 * theta[member]) * L[member])) / 2.0
        ux, uy = np.cos(th), np.sin(th)
        pts = np.concatenate([segs[member, 0:2], segs[member, 2:4]], axis=0)
        t = pts[:, 0] * ux + pts[:, 1] * uy
        i_min, i_max = np.argmin(t), np.argmax(t)
        out.append(np.concatenate([pts[i_min], pts[i_max]]))
    return np.stack(out)


def detect(image: np.ndarray, max_width: int = -1) -> np.ndarray:
    """Detect 2D line segments; returns (n, 4) float64 [x1 y1 x2 y2] in
    original image coordinates.

    Mirrors the reference's detectLineSegments flow (line3D.cc:249-372):
    grayscale conversion and optional downscale to ``max_width`` happen
    here; the min-length/top-k filters live in the pipeline's add_view.
    """
    img = np.asarray(image)
    if img.ndim == 3:
        img = img @ np.array([0.299, 0.587, 0.114])  # RGB -> luma (PIL order)
    img = img.astype(np.float32)

    H0, W0 = img.shape
    ds = 1.0
    if max_width > 0 and W0 > max_width:
        ds = W0 / max_width
        nh, nw = int(round(H0 / ds)), max_width
        img = np.asarray(_bilinear_resize(jnp.asarray(img), nh, nw))

    H, W = img.shape
    segs, ok = _detect_compact(jnp.asarray(img), H, W)
    segs = np.asarray(segs)[np.asarray(ok)].astype(np.float64)
    segs = merge_collinear(segs)
    return segs * ds


_MAX_RAW_SEGMENTS = 32768


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _detect_compact(img: jnp.ndarray, H: int, W: int):
    """Run the core and compact accepted segments ON DEVICE — the raw
    per-pixel-slot outputs are ~300 MB per image and must never cross the
    host interconnect."""
    segs, ok, _ = _lsd_core(img, H, W)
    idx = jnp.nonzero(ok, size=_MAX_RAW_SEGMENTS, fill_value=-1)[0]
    valid = idx >= 0
    return segs[jnp.maximum(idx, 0)], valid
