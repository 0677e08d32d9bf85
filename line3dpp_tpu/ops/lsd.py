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
import os

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
_BIG_ANGLE = 100.0


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


def _tile_for(h2: int, w2: int) -> tuple:
    """CC tile for an image: the largest VMEM tile (up to 256 x 1024) that
    keeps row/column padding waste low; 8/128-aligned for small inputs."""
    def pick(dim, cands, align):
        if dim <= cands[-1]:
            return -(-dim // align) * align
        # biggest candidate whose padding waste is < 8%
        for c in cands:
            if (-(-dim // c) * c) - dim < 0.08 * dim:
                return c
        return cands[-1]

    return (pick(h2, (256, 128, 64, 32, 16, 8), 8),
            pick(w2, (1024, 512, 256, 128), 128))


def _round_up(n: int, m: int) -> int:
    return -(-n // m) * m


def _lsd_statics(H: int, W: int, nc_scale: float, c_cap_scale: int = 1):
    """Shape constants shared by the detection sub-programs."""
    h2, w2 = int(round(H * SCALE)), int(round(W * SCALE))
    th, tw = _tile_for(h2, w2)
    hp, wp = _round_up(h2, th), _round_up(w2, tw)
    NC = _round_up(int(nc_scale * h2 * w2) + 1024, 1024)  # active-pixel cap
    # component cap; `c_cap_scale` raises it when an image overflows the
    # default (the fit kernels' cost is windowed, so it scales mildly)
    c_cap = min((1 << 17) * c_cap_scale, _round_up(hp * wp, 128))
    return h2, w2, th, tw, hp, wp, NC, c_cap


@functools.partial(jax.jit, static_argnames=("H", "W", "nc_scale"))
def _grad_compact(img: jnp.ndarray, H: int, W: int, nc_scale: float = 0.62):
    """Gaussian subsample + level-line field + used-pixel compaction
    (lsd.cpp `gaussian_sampler` / `ll_angle`)."""
    h2, w2, th, tw, hp, wp, NC, c_cap = _lsd_statics(H, W, nc_scale)

    sigma = SIGMA_SCALE / SCALE
    kern = jnp.asarray(_gaussian_kernel(sigma))
    blurred = _separable_blur(img, kern)
    simg = _bilinear_resize(blurred, h2, w2)

    # level-line angle field (lsd.cpp ll_angle): 2x2 gradient masks
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

    # pad to CC-tile multiples; padded pixels are inactive.  All pixel
    # coordinates below are padded-grid flat indices (padding sits at the
    # right/bottom, so x/y coordinates are unchanged).
    angle = jnp.pad(angle, ((0, hp - h2), (0, wp - w2)),
                    constant_values=_BIG_ANGLE)
    mag = jnp.pad(mag, ((0, hp - h2), (0, wp - w2)))
    used = jnp.pad(used, ((0, hp - h2), (0, wp - w2)))

    # compact the (round-invariant) used-pixel set once.  ONE stable sort
    # (key = active ? flat index : HWp sentinel; mag/angle ride as
    # payloads) replaces nonzero + two full-grid gathers — identical
    # output (actives first, in index order), ~70 ms cheaper per image on
    # a v5e (measured: nonzero 44 ms + 2x ordered gather 25 ms vs one
    # 3-way sort ~20 ms at 4.9M).
    HWp = hp * wp
    flat_used = used.reshape(-1)
    used_count = jnp.sum(flat_used.astype(jnp.int32))
    key = jnp.where(flat_used, jnp.arange(HWp, dtype=jnp.int32), HWp)
    key_s, mag_s, ang_s = jax.lax.sort(
        (key, mag.reshape(-1), angle.reshape(-1)), num_keys=1)
    idx_used = key_s[:NC]
    cvalid = idx_used < HWp
    mag_c = jnp.where(cvalid, mag_s[:NC], 0.0)
    ang_c = jnp.where(cvalid, ang_s[:NC], _BIG_ANGLE)
    return (angle, used, used_count, idx_used, cvalid, mag_c, ang_c)


@functools.partial(jax.jit, static_argnames=(
    "th", "tw", "c_cap", "hw2", "cc_iters", "refine_iters", "use_pallas_cc",
    "link_cap", "rect_improve", "rescue", "seed_gate", "seed_center",
    "side_split", "next_nc", "pallas_gather", "pallas_lab_gather"))
def _lsd_round(angle, active_d, idx_used, cvalid, mag_c, ang_c,
               link_tol, do_consume, n_valid, *, th: int, tw: int,
               c_cap: int,
               hw2: int, cc_iters: int, refine_iters: int,
               use_pallas_cc: bool, link_cap: int = 0,
               rect_improve: bool = False, rescue: bool = False,
               seed_gate: bool = False,
               seed_center: bool = False, side_split: bool = False,
               next_nc: int = 0, pallas_gather: bool = False,
               pallas_lab_gather: bool = False):
    """One extraction round: CC -> sort-by-label -> rectangle fits ->
    NFA acceptance -> pixel consumption.  The annealed rounds share
    compiled subprograms per pixel-list size (the link tolerance is a
    traced scalar; a monolithic 3-round jit took >30 min to compile on
    the axon relay).

    ``next_nc`` > 0 additionally returns the surviving active pixels
    compacted (label-partition sort, actives first) and sliced to that
    static size, so later rounds run on a ~2x shorter pixel list instead
    of re-sorting/re-fitting the full compaction with 40-60% of entries
    consumed (NEXT.md round-2 budget: ~180 ms of each round scales with
    list length).  The compaction happens inside the ``do_consume``
    branch — the final round skips it at runtime."""
    from . import lsd_cc

    hp, wp = angle.shape
    HWp = hp * wp
    NC = idx_used.shape[0]
    safe_idx = jnp.minimum(idx_used, HWp - 1)
    big = jnp.float32(1e9)
    int_max = jnp.int32(2**31 - 1)
    p_nfa = ANG_TH / 180.0
    log_ntests = 2.5 * math.log10(float(hw2))           # (HW)^{5/2} tests
    # region-angle alignment gate (lsd.cpp `isaligned`, used by the region
    # grow at 1704-1754): pixels whose level-line angle deviates more than
    # ANG_TH from the component's fitted axis are pruned at every gated
    # refit.  Without it, pairwise-link chaining over-merges curved chains,
    # the merged component fails density/NFA, and rounds 2-3 re-extract the
    # SAME straight edge as several abutting fragments (round-2 diagnostic:
    # 13% of the reference's surviving segments were only covered piecewise,
    # with median fragment gap 1.3 px).
    cos_gate = jnp.float32(math.cos(math.radians(ANG_TH)))

    if True:
        # --- connected components on the dense grid ---
        gather_ovf = jnp.int32(0)
        if use_pallas_cc:
            lab_d, cc_unconv = lsd_cc.cc_tiles(angle, active_d, link_tol,
                                               tile=(th, tw))
            cc_unconverged = cc_unconv[0, 0]
            T, link_count = lsd_cc.merge_tile_labels(
                lab_d, angle, active_d, link_tol, tile=(th, tw),
                link_cap=link_cap)
            if pallas_gather:
                # windowed Pallas gathers (ops/lsd_gather.py): the merge
                # map applied tile-locally on the dense grid + a sorted-
                # index windowed compacted gather — 42 ms vs the 66 ms
                # XLA serial gathers at round-1 sizes (the full-grid
                # merge pass does NOT pay off for the shrunken rounds
                # 2-3, which keep the XLA path).  Tile spans beyond the
                # window poison their entries and raise gather_ovf; the
                # caller re-runs with the XLA gathers (loud, like every
                # other capacity fallback).
                from . import lsd_gather

                lab2 = lsd_gather.apply_merge_dense(
                    lab_d, T, (th, tw), int(lsd_cc.INVALID))
                lab_c, gather_ovf = lsd_gather.gather_sorted(
                    lab2.reshape(-1), safe_idx, win_rows=512,
                    fill=2**31 - 1, n_valid=n_valid)
                # invalid-pixel labels byte-truncate to garbage in the
                # kernel, but every cvalid+active compacted entry points
                # at an ACTIVE pixel (valid root < 2^24), and inactive
                # entries are masked by `part` below regardless of lab_c
                lab_c = jnp.where(lab_c >= lsd_cc.INVALID, int_max, lab_c)
            elif pallas_lab_gather:
                # rounds 2-3: the dense merge pass is grid-sized and does
                # not pay off at the shrunken pixel lists, but the LAB
                # half of the lookup still has the sorted-window
                # structure; the merge map T (scattered roots, no
                # locality) stays an XLA gather over the windowed result
                from . import lsd_gather

                lab_raw, gather_ovf = lsd_gather.gather_sorted(
                    lab_d.reshape(-1), safe_idx, win_rows=512,
                    fill=2**31 - 1, n_valid=n_valid)
                lab_c = jnp.where(lab_raw >= lsd_cc.INVALID, int_max,
                                  T[jnp.clip(lab_raw, 0, HWp - 1)])
            else:
                lab_c = lab_d.reshape(-1)[safe_idx]
                lab_c = jnp.where(lab_c >= lsd_cc.INVALID, int_max,
                                  T[jnp.clip(lab_c, 0, HWp - 1)])
        else:
            link_count = jnp.int32(0)
            cc_unconverged = jnp.int32(0)
            lab_d = _connected_components(angle, active_d, link_tol,
                                          n_iters=cc_iters)
            lab_c = lab_d.reshape(-1)[safe_idx]
            lab_c = jnp.where(lab_c >= _INVALID, int_max, lab_c)

        active_c = cvalid & active_d.reshape(-1)[safe_idx]
        part = active_c & (lab_c < int_max)
        key = jnp.where(part, lab_c, int_max)

        # --- sort active pixels by component label; payloads ride along.
        # x/y are NOT payloads: deriving them from the idx payload after
        # the sort (2 elementwise ops) is cheaper than moving two extra
        # f32 planes through the 2.8M-row sort ---
        key_s, mag_s, ang_s, idx_s = jax.lax.sort(
            (key, mag_c, ang_c, idx_used), num_keys=1)
        xs_s = (idx_s % wp).astype(jnp.float32)
        ys_s = (idx_s // wp).astype(jnp.float32)
        part_s = key_s < int_max
        new_run = part_s & jnp.concatenate(
            [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]])

        # runs shorter than 5 pixels can never pass the npix >= 5 acceptance
        # (lsd.cpp region size test) — drop them from component ranking so
        # noise singletons don't exhaust the c_cap table (a 3072x2304 image
        # has ~500k raw components but only ~tens of k with >= 5 pixels).
        # A run head at i starts a >= 5 run iff key_s[i+4] == key_s[i]
        # (runs are contiguous after the label sort); the flag is then
        # broadcast to the run's pixels by ONE "last head wins" scan —
        # encode head as (1 + big) and carry the latest nonzero — instead
        # of the previous two directional position scans + flips.
        big_head = new_run & jnp.concatenate(
            [key_s[4:] == key_s[:-4], jnp.zeros((4,), bool)])
        enc = jnp.where(new_run, 1 + big_head.astype(jnp.int32), 0)
        prop = jax.lax.associative_scan(
            lambda a, b: jnp.where(b > 0, b, a), enc)
        big_run = part_s & (prop == 2)

        new_run = new_run & big_run
        dlab = jnp.cumsum(new_run.astype(jnp.int32)) - 1
        ncomp = jnp.max(jnp.where(big_run, dlab, -1)) + 1
        # component slot per pixel; short runs, overflow and
        # non-participants all route to the dump slot c_cap
        slot = jnp.where(big_run & (dlab < c_cap), dlab, c_cap)
        comp_exists = (jnp.arange(c_cap) < jnp.minimum(ncomp, c_cap))

        # dump-slot entries are interspersed, so ids are NOT sorted
        seg_sum = lambda v: jax.ops.segment_sum(v, slot, c_cap + 1)[:c_cap]

        def expand(t, pad):
            # per-pixel value from a per-component table (monotone gather)
            return jnp.concatenate([t, jnp.full((1,), pad, t.dtype)])[slot]

        def _theta_from_moments(sw, swx, swy, sxx, syy, sxy, npix):
            swz = jnp.maximum(sw, 1e-12)
            cx = swx / swz
            cy = swy / swz
            ixx = sxx / swz - cx * cx
            iyy = syy / swz - cy * cy
            ixy = sxy / swz - cx * cy
            # main direction = max-variance eigenvector of the weighted
            # scatter matrix (lsd.cpp `get_theta`)
            diff = ixx - iyy
            disc = jnp.sqrt(diff * diff + 4.0 * ixy * ixy)
            lmax_eig = 0.5 * (ixx + iyy + disc)
            theta = jnp.where(
                jnp.abs(lmax_eig - ixx) > jnp.abs(lmax_eig - iyy),
                jnp.arctan2(lmax_eig - ixx, ixy),
                jnp.arctan2(ixy, lmax_eig - iyy),
            )
            # minor eigenvalue = weighted variance across the axis (w_proj
            # variance) — the side_split hollow-ness test reads it
            var_w = 0.5 * (ixx + iyy - disc)
            return cx, cy, theta, var_w

        def _finish_fit(cx, cy, theta, npix, lmin, lmax, wmin, wmax, extra):
            length = lmax - lmin
            width = jnp.maximum(wmax - wmin, 1.0)
            area = jnp.maximum(length, 1.0) * width
            density = npix / jnp.maximum(area, 1e-12)
            return dict(cx=cx, cy=cy, theta=theta, npix=npix,
                        lmin=lmin, lmax=lmax, wmin=wmin, wmax=wmax,
                        length=length, width=width, density=density,
                        **extra)

        if use_pallas_cc:
            # --- Pallas fit kernels (ops/lsd_fit.py): one-hot MXU
            # reductions/expansions over the sorted label windows ---
            from . import lsd_fit

            def _tables(ct, st, cx, cy, gate):
                t = jnp.zeros((8, c_cap + lsd_fit.WIN), jnp.float32)
                return (t.at[0, :c_cap].set(ct).at[1, :c_cap].set(st)
                         .at[2, :c_cap].set(cx).at[3, :c_cap].set(cy)
                         .at[4, :c_cap].set(gate))

            def fit_tail(mom, pix_f):
                cx, cy, theta, var_w = _theta_from_moments(
                    *(mom[i] for i in range(7)))
                npix = mom[6]
                tables = _tables(jnp.cos(theta), jnp.sin(theta), cx, cy,
                                 jnp.full((c_cap,), big))
                # scatter sentinel > any |projection| (grid diagonal bound)
                sb = float(max(8192, 1 << math.ceil(
                    math.log2(math.hypot(hp, wp) + 1.0))))
                ext = lsd_fit.extents(slot, xs_s, ys_s, pix_f, tables,
                                      c_cap, sb=sb)
                return _finish_fit(cx, cy, theta, npix,
                                   ext[0], -ext[2], ext[1], -ext[3],
                                   dict(tables=tables, var_w=var_w))

            def fit(pix_f):
                mom = lsd_fit.moments(slot, xs_s, ys_s, mag_s, pix_f, c_cap)
                return fit_tail(mom, pix_f)

            def gate_fit(f, gate_vec, pix_f, dump_keep):
                # fused gate + moments (one pixel pass instead of two);
                # bit-identical to gated_pix followed by fit
                tables = f["tables"].at[4, :c_cap].set(gate_vec)
                newpix, mom = lsd_fit.gate_moments(
                    slot, xs_s, ys_s, ang_s, mag_s, pix_f, tables,
                    jnp.bool_(dump_keep), cos_gate, c_cap)
                return newpix, fit_tail(mom, newpix)

            def gated_pix(f, gate_vec, pix_f, dump_keep, center=None,
                          cos_tol=None):
                # table row 5 = optional band center on the rect normal
                # (the kernel computes |w_proj - center| <= gate; zero
                # center reproduces the plain symmetric band)
                tables = f["tables"].at[4, :c_cap].set(gate_vec)
                if center is not None:
                    tables = tables.at[5, :c_cap].set(center)
                return lsd_fit.gate_pixels(
                    slot, xs_s, ys_s, ang_s, pix_f, tables,
                    jnp.bool_(dump_keep),
                    cos_gate if cos_tol is None else cos_tol, c_cap)
        else:
            # --- XLA fallback: segment reductions + monotone gathers ---
            def fit(pix_f):
                wgt = mag_s * pix_f
                mom = [seg_sum(wgt), seg_sum(wgt * xs_s), seg_sum(wgt * ys_s),
                       seg_sum(wgt * xs_s * xs_s), seg_sum(wgt * ys_s * ys_s),
                       seg_sum(wgt * xs_s * ys_s), seg_sum(pix_f)]
                cx, cy, theta, var_w = _theta_from_moments(*mom)
                npix = mom[6]
                ct, st = jnp.cos(theta), jnp.sin(theta)

                dxp = xs_s - expand(cx, 0.0)
                dyp = ys_s - expand(cy, 0.0)
                ct_p, st_p = expand(ct, 1.0), expand(st, 0.0)
                l_proj = dxp * ct_p + dyp * st_p
                w_proj = -dxp * st_p + dyp * ct_p

                inpix = pix_f != 0.0
                seg_min = lambda v: jax.ops.segment_min(
                    jnp.where(inpix, v, big), slot, c_cap + 1)[:c_cap]
                seg_max = lambda v: jax.ops.segment_max(
                    jnp.where(inpix, v, -big), slot, c_cap + 1)[:c_cap]
                return _finish_fit(cx, cy, theta, npix,
                                   seg_min(l_proj), seg_max(l_proj),
                                   seg_min(w_proj), seg_max(w_proj),
                                   dict(w_proj=w_proj, ct_p=ct_p, st_p=st_p,
                                        var_w=var_w))

            def gated_pix(f, gate_vec, pix_f, dump_keep, center=None,
                          cos_tol=None):
                gate_p = expand(gate_vec, big if dump_keep else -1.0)
                w = f["w_proj"]
                if center is not None:
                    w = w - expand(center, 0.0)
                ct = cos_gate if cos_tol is None else cos_tol
                aligned = jnp.abs(jnp.cos(ang_s) * f["ct_p"]
                                  + jnp.sin(ang_s) * f["st_p"]) >= ct
                keep = ((jnp.abs(w) <= gate_p)
                        & (aligned | (slot >= c_cap)))
                return pix_f * keep.astype(jnp.float32)

            def gate_fit(f, gate_vec, pix_f, dump_keep):
                # XLA fuses the gate into the segment sums on its own
                newpix = gated_pix(f, gate_vec, pix_f, dump_keep)
                return newpix, fit(newpix)

        # density refinement (lsd.cpp `refine`/`reduce_region_radius`):
        # failing components shrink toward their fitted axis and refit
        pix = part_s.astype(jnp.float32)
        n_split = jnp.int32(0)
        if seed_gate:
            # seed-angle gate on the INITIAL fit (lsd.cpp grows regions from
            # magnitude-ordered seeds and admits pixels aligned within
            # ANG_TH of the running region angle, lsd.cpp:1704-1754).  Pure
            # pairwise linking chains smoothly-curving edges; the curved
            # tail corrupts the first fitted axis, the density refine then
            # prunes around the wrong axis, and the true straight edge
            # fragments into abutting pieces (round-2 diagnostic: 13% of the
            # reference's surviving segments only covered piecewise, median
            # gap 1.3 px).  Approximating the region angle by the strongest
            # pixel's level-line angle un-corrupts the initial fit; gated-
            # out pixels stay unconsumed and re-cluster in later rounds.
            in_part = jnp.where(part_s, mag_s, -big)
            mmax = jax.ops.segment_max(in_part, slot, c_cap + 1)[:c_cap]
            is_root = part_s & (mag_s >= expand(mmax, big))
            root_ang = jax.ops.segment_max(
                jnp.where(is_root, ang_s, -big), slot, c_cap + 1)[:c_cap]
            dang = jnp.abs(ang_s - expand(root_ang, _BIG_ANGLE))
            dang = jnp.where(dang > 2.0 * jnp.pi, dang - 2.0 * jnp.pi, dang)
            dang = jnp.where(dang > jnp.pi, 2.0 * jnp.pi - dang, dang)
            seed_ok = (dang <= jnp.float32(math.radians(ANG_TH))) | (slot >= c_cap)
            f0 = fit(pix * seed_ok.astype(jnp.float32))
            # ... then re-admit every component pixel aligned (mod pi) with
            # that axis — one "region angle drift" update, so pixels whose
            # angle differs from the noisy seed but agrees with the fitted
            # direction are not lost (the seed-only gate measurably dropped
            # recall on the golden testdata)
            gate_all = jnp.full((c_cap,), big)
            pix = gated_pix(f0, gate_all, pix, True)
        f = fit(pix)
        if (seed_center or side_split) and refine_iters:
            # lsd.cpp reduce_region_radius (lsd.cpp:1296-1358) shrinks a
            # density-failing region toward its SEED pixel, not the fitted
            # axis.  For two close-parallel same-angle lines fused into one
            # CC component the fitted axis lies BETWEEN the lines, so the
            # symmetric |w_proj| <= half_w band keeps the gap and guts both
            # lines; anchoring the band on the seed's normal offset keeps
            # the seed's line intact and releases the other line's pixels
            # for re-extraction in a later annealed round (the reference
            # releases them via used[...] = NOTUSED and re-grows from the
            # next seed).  Seed = strongest-magnitude pixel, matching the
            # reference's decreasing-magnitude seed order (lsd.cpp:790-810).
            in_part = jnp.where(part_s, mag_s, -big)
            mmax = jax.ops.segment_max(in_part, slot, c_cap + 1)[:c_cap]
            is_root = part_s & (mag_s >= expand(mmax, big))
            # break magnitude ties by flat index (single segment_max)
            seed_flat = jax.ops.segment_max(
                jnp.where(is_root, idx_s.astype(jnp.int32), -1),
                slot, c_cap + 1)[:c_cap]
            seed_ok = seed_flat >= 0
            sf = jnp.maximum(seed_flat, 0)
            x_seed = (sf % wp).astype(jnp.float32)
            y_seed = (sf // wp).astype(jnp.float32)
        for _ in range(refine_iters):
            half_w = jnp.maximum(
                jnp.maximum(jnp.abs(f["wmin"]), jnp.abs(f["wmax"])) * 0.6,
                0.75)
            fail = f["density"] < DENSITY_TH
            # encode (fail ? half_w : keep-everything) in one table
            hw_gate = jnp.where(fail, half_w, big)
            if side_split and refine_iters:
                # Two close-parallel image lines fused into one CC component
                # put the fitted axis BETWEEN the lines: the w_proj
                # distribution is two bands around a hollow middle, which the
                # symmetric |w_proj| <= half_w shrink guts on both sides and
                # rounds 2-3 then re-extract only as short fragments.
                # Detect the hollowness from moments the fit already has —
                # for a filled band sigma_w/w_ext = 1/sqrt(3) = 0.58, for two
                # thin equal bands it tends to 1.0 — and keep the SEED's side
                # whole ([0, wmax] or [wmin, 0] on the rect normal, row-5
                # band center), releasing the other line full-length for the
                # next annealed round.  Reference analog: region growing from
                # per-line seeds never fuses the pair (lsd.cpp:1704-1754).
                w_ext = jnp.maximum(jnp.abs(f["wmin"]), jnp.abs(f["wmax"]))
                hollow = (jnp.sqrt(jnp.maximum(f["var_w"], 0.0))
                          >= 0.70 * w_ext)
                ct_c = jnp.cos(f["theta"])
                st_c = jnp.sin(f["theta"])
                w_seed = (-(x_seed - f["cx"]) * st_c
                          + (y_seed - f["cy"]) * ct_c)
                side_ext = jnp.where(w_seed >= 0.0, f["wmax"], f["wmin"])
                two = fail & hollow & seed_ok & (w_ext >= 1.0)
                n_split = n_split + jnp.sum(
                    (two & comp_exists).astype(jnp.int32))
                gate = jnp.where(two, 0.5 * jnp.abs(side_ext), hw_gate)
                wc = jnp.where(two, 0.5 * side_ext, 0.0)
                pix = gated_pix(f, gate, pix, True, center=wc)
            elif seed_center and refine_iters:
                ct_c = jnp.cos(f["theta"])
                st_c = jnp.sin(f["theta"])
                wc = (-(x_seed - f["cx"]) * st_c
                      + (y_seed - f["cy"]) * ct_c)
                wc = jnp.where(fail & seed_ok, wc, 0.0)
                pix = gated_pix(f, hw_gate, pix, True, center=wc)
            else:
                pix, f = gate_fit(f, hw_gate, pix, True)
                continue
            f = fit(pix)

        # NFA a-contrario validation (lsd.cpp `nfa`): binomial tail
        # P(X >= k | n, p), p = ANG_TH/180, n = rectangle area, k = aligned
        def nfa_of(k_cnt, n_area, p=p_nfa):
            n_ = jnp.maximum(n_area, 1.0)
            k_ = jnp.minimum(k_cnt, n_)
            tail = jax.scipy.special.betainc(
                jnp.maximum(k_, 1.0), jnp.maximum(n_ - k_ + 1.0, 1.0), p)
            return -(log_ntests + jnp.log10(jnp.maximum(tail, 1e-300)))

        log_nfa = nfa_of(f["npix"], jnp.maximum(f["length"], 1.0) * f["width"])

        ok = (
            comp_exists
            & (f["npix"] >= 5.0)
            & (f["density"] >= DENSITY_TH)
            & (log_nfa > LOG_EPS)
        )

        # band geometry of the rescued/consumed rectangles: offset on the
        # rect normal + half-width, both in w_proj units (0 = fitted axis)
        res_center = jnp.zeros((c_cap,), jnp.float32)
        res_gate = jnp.full((c_cap,), -1.0)
        rescued = jnp.zeros((c_cap,), bool)
        if rescue:
            # lsd.cpp rect_improve (1756-1873) as ONE composed, batched
            # cascade: finer precision p/2, 5 symmetric width cuts, 5 cuts
            # of either side (delta = 0.5 px, evaluated in the
            # s = 2*(w_proj - mid) frame so every retry is linear in
            # width), keep the best-NFA variant.  Differences from the
            # round-4 `rect_improve` knob that measured negative:
            # (a) one-sided cuts + the p/2 retry are included, (b) the
            # accepted variant's band REPLACES the full rectangle in the
            # consume step, so pixels the cut released stay alive for
            # rounds 2-3 instead of starving them (VERDICT r4 next-3),
            # (c) the emitted segment shifts onto the accepted band's
            # center line.  Attempted only where the reference would:
            # density passed, npix >= 5, NFA failed.
            mid = 0.5 * (f["wmin"] + f["wmax"])
            width = f["width"]
            length1 = jnp.maximum(f["length"], 1.0)
            sym = lambda n: (-1.0, 0.5 * n, 1.0, -0.5 * n)
            side_a = lambda n: (-1.0, float(n), 1.0, 0.0)
            side_b = lambda n: (-1.0, 0.0, 1.0, -float(n))
            bands_1 = tuple(sym(n) for n in (1, 2, 3, 4)) + tuple(
                side_a(n) for n in (1, 2, 3, 4))
            bands_2 = tuple(side_b(n) for n in (1, 2, 3, 4)) + (
                sym(5), side_a(5), side_b(5))
            # per-variant (half-step count, center offset in w units)
            steps = [1, 2, 3, 4, 1, 2, 3, 4,
                     1, 2, 3, 4, 5, 5, 5]
            offs = ([0.0] * 4 + [0.25, 0.5, 0.75, 1.0]
                    + [-0.25, -0.5, -0.75, -1.0] + [0.0, 1.25, -1.25])
            if use_pallas_cc:
                t2 = (f["tables"].at[4, :c_cap].set(mid)
                      .at[5, :c_cap].set(width))
                c1 = lsd_fit.band_counts(slot, xs_s, ys_s, pix, t2, c_cap,
                                         bands=bands_1)
                c2 = lsd_fit.band_counts(slot, xs_s, ys_s, pix, t2, c_cap,
                                         bands=bands_2)
                counts = jnp.concatenate([c1[:8], c2[:7]], axis=0)
            else:
                s_pix = 2.0 * (f["w_proj"] - expand(mid, 0.0))
                wid_p = expand(width, 0.0)
                seg_cnt = lambda m: seg_sum(pix * m.astype(jnp.float32))
                counts = jnp.stack([
                    seg_cnt((s_pix >= lw * wid_p + lc)
                            & (s_pix <= hw * wid_p + hc))
                    for (lw, lc, hw, hc) in bands_1 + bands_2])
            w_v = width[None, :] - 0.5 * jnp.asarray(steps)[:, None]
            nfa_v = nfa_of(counts, length1[None, :] * w_v)
            valid_v = (w_v > 0.5) & (counts >= 5.0)
            nfa_v = jnp.where(valid_v, nfa_v, -big)
            # p/2 retry: tighter alignment over the FULL band (the first
            # rescue lsd.cpp tries; k recounted at 11.25°, area unchanged)
            pix_half = gated_pix(
                f, jnp.where(width > 0, 0.5 * width, -1.0), pix, False,
                center=mid,
                cos_tol=jnp.float32(math.cos(math.radians(ANG_TH / 2))))
            k_half = seg_sum(pix_half)
            nfa_half = jnp.where(k_half >= 5.0,
                                 nfa_of(k_half, length1 * width,
                                        p=p_nfa / 2), -big)
            nfa_all = jnp.concatenate([nfa_half[None, :], nfa_v], axis=0)
            # every variant's band center in w_proj units: mid + the cut's
            # asymmetric shift (0.25 px per one-sided half-step)
            off_all = mid[None, :] + jnp.asarray([0.0] + offs)[:, None]
            w_all = jnp.concatenate([width[None, :], w_v], axis=0)
            best = jnp.argmax(nfa_all, axis=0)
            take = lambda t: jnp.take_along_axis(t, best[None, :],
                                                 axis=0)[0]
            nfa_best = take(nfa_all)
            attempt = comp_exists & (f["npix"] >= 5.0) & ~ok \
                & (f["density"] >= DENSITY_TH)
            rescued = attempt & (nfa_best > LOG_EPS)
            res_center = jnp.where(rescued, take(off_all), 0.0)
            res_gate = jnp.where(rescued, 0.5 * take(w_all), -1.0)
            ok = ok | rescued

        if rect_improve:
            # lsd.cpp rect_improve (1756-1873): rectangles failing the NFA
            # retry at reduced widths (0.5 px steps, band centered on the
            # rect mid-line, endpoints unchanged); accept when any retry
            # passes NFA + density.  Targets thin edges whose first-fit
            # rectangle is too wide (~half of the reference segments we
            # previously missed, tools/diag_undetected.py 'raw-rejected').
            # DEFAULT OFF: on the golden testdata the rescued rectangles
            # also consume their pixels, which starves rounds 2-3 and nets
            # out negative (count-F1 0.883 vs 0.888, precision 0.973 vs
            # 0.977 measured with TPU detections end-to-end).
            mid = 0.5 * (f["wmin"] + f["wmax"])
            if use_pallas_cc:
                t2 = (f["tables"].at[4, :c_cap].set(mid)
                      .at[5, :c_cap].set(f["width"]))
                counts = lsd_fit.band_counts(slot, xs_s, ys_s, pix, t2,
                                             c_cap)[:4]
            else:
                mid_p = expand(mid, 0.0)
                width_p = expand(f["width"], 0.0)
                d2 = 2.0 * jnp.abs(f["w_proj"] - mid_p)
                counts = jnp.stack([
                    seg_sum(pix * (d2 <= width_p - 0.5 * (b + 1)))
                    for b in range(4)])
            w_b = f["width"][None, :] - 0.5 * jnp.arange(1, 5)[:, None]
            area_b = jnp.maximum(f["length"], 1.0)[None, :] * w_b
            nfa_b = nfa_of(counts, area_b)
            dens_b = counts / jnp.maximum(area_b, 1e-12)
            ok_b = ((w_b > 0.5) & (counts >= 5.0)
                    & (dens_b >= DENSITY_TH) & (nfa_b > LOG_EPS))
            ok = ok | (comp_exists & ok_b.any(axis=0))

        # remove accepted rectangles' pixels for the next round: any
        # participating pixel within the accepted rectangle's width band.
        # The final round's active set is never read, so the gate + NC-wide
        # scatter (~60 ms on a v5e) are skipped at runtime via lax.cond —
        # `do_consume` stays a TRACED flag so all rounds share one compiled
        # program (a static flag would double the 7-15 min remote compile).
        def _consume(_):
            half_final = jnp.maximum(jnp.abs(f["wmin"]),
                                     jnp.abs(f["wmax"])) + 0.75
            # rescued rectangles consume ONLY their accepted (possibly
            # one-sided) band — the cut-away pixels stay alive for the
            # annealed rounds (lsd.cpp releases them per-region via its
            # seed order; here the partial consume is the batched analog)
            hf_gate = jnp.where(rescued, res_gate + 0.75,
                                jnp.where(ok, half_final, -1.0))
            consumed_s = gated_pix(f, hf_gate, part_s.astype(jnp.float32),
                                   False, center=res_center) != 0.0
            if not next_nc:
                consumed_d = jnp.zeros((HWp,), bool).at[
                    jnp.where(consumed_s, idx_s, HWp)].set(True, mode="drop")
                return active_d & ~consumed_d.reshape(hp, wp)
            # partition the sorted pixel list: survivors first (stable ->
            # they stay label-ordered), then slice to the static next_nc.
            # A sort is ~10x cheaper than the equivalent nonzero+gathers
            # at this size (SPEED.md fact 1).
            alive = (key_s < int_max) & ~consumed_s
            n_alive = jnp.sum(alive.astype(jnp.int32))
            key2 = jnp.where(alive, 0, 1).astype(jnp.int32)
            _, idx2, mag2, ang2 = jax.lax.sort(
                (key2, jnp.where(alive, idx_s, HWp), mag_s,
                 jnp.where(alive, ang_s, _BIG_ANGLE)), num_keys=1)
            # the dense active plane for the next round's CC is rebuilt
            # from the alive list's next_nc prefix instead of scattering
            # all NC consumed flags — half the scatter indices (~27 ms at
            # 2.8M).  Equivalent: every active pixel is in the compacted
            # list, so active & ~consumed == "in the alive list"; entries
            # beyond next_nc are dropped exactly like the next_compact
            # truncation, and that overflow already triggers the loud
            # unshrunk re-run via the n_alive diag (_detect_finalize).
            live_idx = jnp.where(
                jnp.arange(NC, dtype=idx_s.dtype) < n_alive, idx2,
                jnp.asarray(HWp, idx_s.dtype))[:next_nc]
            active_next = jnp.zeros((HWp,), bool).at[
                live_idx].set(True, mode="drop").reshape(hp, wp)
            return (active_next, (idx2[:next_nc], mag2[:next_nc],
                                  ang2[:next_nc]), n_alive)

        def _no_consume(_):
            if not next_nc:
                return active_d
            z = jnp.zeros((next_nc,), jnp.float32)
            return (active_d, (jnp.full((next_nc,), HWp, idx_used.dtype),
                               z, z), jnp.int32(0))

        out_c = jax.lax.cond(do_consume, _consume, _no_consume, operand=None)
        if next_nc:
            active_next, next_compact, n_alive = out_c
        else:
            active_next, next_compact, n_alive = out_c, None, jnp.int32(0)

        # endpoints in subsampled coords -> original coords
        # (/SCALE upscale as lsd.cpp:2103-2108); rescued segments shift
        # onto the accepted band's center line along the rect normal
        cx, cy, theta = f["cx"], f["cy"], f["theta"]
        ct_e, st_e = jnp.cos(theta), jnp.sin(theta)
        cx = cx - res_center * st_e
        cy = cy + res_center * ct_e
        ex1 = (cx + f["lmin"] * ct_e) / SCALE
        ey1 = (cy + f["lmin"] * st_e) / SCALE
        ex2 = (cx + f["lmax"] * ct_e) / SCALE
        ey2 = (cy + f["lmax"] * st_e) / SCALE
        segs = jnp.stack([ex1, ey1, ex2, ey2], axis=-1)
        diag = dict(npix=f["npix"], density=f["density"], log_nfa=log_nfa,
                    length=f["length"], width=f["width"], ncomp=ncomp,
                    link_count=link_count, cc_unconverged=cc_unconverged,
                    n_alive=n_alive, n_split=n_split,
                    gather_ovf=gather_ovf,
                    n_rescue=jnp.sum(rescued.astype(jnp.int32)))
        return segs, ok, active_next, diag, next_compact


def _lsd_core(img: jnp.ndarray, H: int, W: int, n_rounds: int = 3,
              cc_iters: int = 16, refine_iters: int = 2,
              use_pallas_cc: bool = False, nc_scale: float = 0.62,
              use_link_cap: bool = True, rect_improve: bool = False,
              rescue: bool = False, use_pallas_gather: bool = True,
              c_cap_scale: int = 1, seed_gate: bool = False,
              seed_center: bool = False, side_split: bool = False,
              shrink_scale: float = 0.50, shrink_scale3: float = 0.45):
    # iteration defaults ablated on testdata: (16, 2) matches (24, 3)'s
    # OpenCV-LSD coverage (0.82 at the >=80%-within-3px criterion)
    """Full detection on an already-loaded (H, W) float32 grayscale image
    in [0, 255].  Returns per-component-slot candidate segments + validity.

    TPU-first layout (round-2 rework): after the dense gradient field and
    connected components, everything runs over a **compacted active-pixel
    list sorted by component label** — rectangle fits become one-hot-MXU
    window reductions into component-table slots instead of 4.5M-wide
    scatter/gathers (the round-1 bottleneck: 7.2 s of 10.6 s/image).  CC
    uses the tile-local Pallas kernel + border merge (ops/lsd_cc.py) on
    TPU, hook+jump XLA elsewhere.  Orchestrated as three sub-programs
    (gradient/compaction, one shared round, output compaction) to keep
    remote compile times tractable."""
    h2, w2, th, tw, hp, wp, NC, c_cap = _lsd_statics(H, W, nc_scale,
                                                     c_cap_scale)
    (angle, used, used_count, idx_used, cvalid, mag_c,
     ang_c) = _grad_compact(img, H, W, nc_scale)

    # round 1 links at the full 22.5° tolerance; later rounds re-cluster the
    # leftover pixels with tighter tolerances so smoothly-curving chains and
    # corner blobs (where the pairwise-link formulation over-merges relative
    # to LSD's region-angle test) split into straight pieces.
    from . import lsd_cc

    prec_f = jnp.float32(math.radians(ANG_TH))
    active_d = used
    link_cap = (lsd_cc.auto_link_cap((hp, wp), (th, tw))
                if (use_link_cap and use_pallas_cc) else 0)
    # rounds 2+ run on the surviving actives compacted to NC2 (round 1
    # consumes into accepted rectangles; measured post-round-1 active
    # fraction 0.30-0.47 of h2*w2 across the 26 testdata images on the
    # TPU path — 0.50 clears all of them, and the cost model favors a
    # no-fallback cap: at 0.40 three images overflowed and their doubled
    # detect cost ate the 0.40-vs-0.50 per-round saving) — overflow is
    # checked against diag n_alive and falls back to the unshrunk path
    # in _detect_finalize
    NC2 = (min(NC, _round_up(int(shrink_scale * h2 * w2) + 1024, 1024))
           if (shrink_scale > 0 and n_rounds > 1) else 0)
    # round 3 shrinks AGAIN: post-round-2 survivors measured at
    # 0.239-0.424 of h2*w2 across the 26 testdata images
    # (tools/diag_round_alive.py; round 2 consumes only ~4% of pixels) —
    # 0.45 clears the 0.424 max with margin; overflow falls back loudly
    # via the per-round n_alive diags like the NC2 cap
    NC3 = (min(NC2, _round_up(int(shrink_scale3 * h2 * w2) + 1024, 1024))
           if (NC2 and shrink_scale3 > 0 and n_rounds > 2) else NC2)
    (all_segs, all_ok, link_counts, ncomps, unconv, alive,
     splits, rescues, govf) = [], [], [], [], [], [], [], [], []
    diag = None
    tols = (prec_f, prec_f * 0.5, prec_f * 0.25)[:n_rounds]
    next_caps = [NC2, NC3, NC3][:n_rounds]
    cur = (idx_used, cvalid, mag_c, ang_c)
    n_val = used_count
    for r, link_tol in enumerate(tols):
        idx_r, cvalid_r, mag_r, ang_r = cur
        # windowed Pallas gathers only pay off at the full round-1 list
        # (the dense merge pass is grid-sized, so the shrunken rounds
        # 2-3 are faster through XLA), and the byte-split select needs
        # labels < 2^24
        small = hp * wp < (1 << 24)
        pg = use_pallas_gather and use_pallas_cc and r == 0 and small
        # rounds 2-3 CANNOT use the windowed lab gather yet: the consume
        # compaction sorts by the alive FLAG only (stable -> the list
        # stays label-ordered, not index-sorted), so tile spans cover a
        # component's spatial extent and ~1/3 of entries overflow
        # (measured 506887 on img000057 round 2).  Making the consume
        # sort key the pixel index would restore the invariant (and is
        # cheaper: 3 sort arrays instead of 4) but changes within-
        # component summation order -> borderline NFA flips; deferred to
        # round 6 with a fresh-detect revalidation.
        pgl = False
        segs_r, ok_r, active_d, diag, nxt = _lsd_round(
            angle, active_d, idx_r, cvalid_r, mag_r, ang_r,
            link_tol, jnp.bool_(r + 1 < len(tols)),
            n_val,
            th=th, tw=tw, c_cap=c_cap, hw2=h2 * w2, pallas_gather=pg,
            pallas_lab_gather=pgl,
            cc_iters=cc_iters, refine_iters=refine_iters,
            use_pallas_cc=use_pallas_cc, link_cap=link_cap,
            rect_improve=rect_improve, rescue=rescue, seed_gate=seed_gate,
            seed_center=seed_center, side_split=side_split,
            next_nc=next_caps[r])
        all_segs.append(segs_r)
        all_ok.append(ok_r)
        link_counts.append(diag["link_count"])
        ncomps.append(diag["ncomp"])
        unconv.append(diag["cc_unconverged"])
        splits.append(diag["n_split"])
        rescues.append(diag["n_rescue"])
        govf.append(diag["gather_ovf"])
        if r + 1 < len(tols):
            alive.append(diag["n_alive"])
        if nxt is not None:
            idx2, mag2, ang2 = nxt
            cur = (idx2, idx2 < hp * wp, mag2, ang2)
            n_val = diag["n_alive"]

    segs = jnp.concatenate(all_segs, axis=0)
    ok = jnp.concatenate(all_ok, axis=0)
    diag = dict(diag, used_count=used_count, nc_cap=NC, c_cap=c_cap,
                link_count=jnp.max(jnp.stack(link_counts)),
                link_cap=link_cap,
                ncomp=jnp.max(jnp.stack(ncomps)),
                cc_unconverged=jnp.max(jnp.stack(unconv)),
                # summed across rounds: per-round diags are otherwise
                # overwritten and early-round side_split triggers vanish
                n_split=jnp.sum(jnp.stack(splits)),
                n_rescue=jnp.sum(jnp.stack(rescues)),
                gather_ovf=jnp.max(jnp.stack(govf)),
                n_alive=(alive[0] if alive else jnp.int32(0)),
                n_alive2=(alive[1] if len(alive) > 1 else jnp.int32(0)),
                nc2_cap=NC2, nc3_cap=NC3)
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

    # vectorized refit: extreme endpoints along each chain's
    # length-weighted mean direction (grouped via one sort + reduceat;
    # the old per-root nonzero scan was O(n^2) and dominated host time)
    order = np.argsort(roots, kind="stable")
    r_s = roots[order]
    starts = np.r_[0, np.flatnonzero(r_s[1:] != r_s[:-1]) + 1]
    sizes = np.diff(np.r_[starts, len(segs)])
    gid = np.repeat(np.arange(len(starts)), sizes)

    s2 = np.add.reduceat(np.sin(2 * theta[order]) * L[order], starts)
    c2 = np.add.reduceat(np.cos(2 * theta[order]) * L[order], starts)
    th_g = 0.5 * np.arctan2(s2, c2)
    ux, uy = np.cos(th_g), np.sin(th_g)

    # both endpoints of every member, laid out contiguously per group
    pts = segs[order].reshape(-1, 2, 2).reshape(-1, 2)      # (2n, 2) xy
    gid2 = np.repeat(gid, 2)
    t = pts[:, 0] * ux[gid2] + pts[:, 1] * uy[gid2]
    po = np.lexsort((t, gid2))
    gstarts2 = 2 * starts
    gends2 = np.r_[gstarts2[1:], 2 * len(segs)] - 1
    pmin = pts[po[gstarts2]]
    pmax = pts[po[gends2]]

    single = sizes == 1
    out = np.concatenate([pmin, pmax], axis=1)
    out[single] = segs[order[starts[single]]]
    return out


def _detect_prep(image: np.ndarray, max_width: int):
    """Grayscale conversion + optional downscale (line3D.cc:249-372).
    Returns (grayscale image, downscale factor).  The image stays uint8
    when it arrives uint8: the relay uplink runs at ~90 MB/s, so shipping
    a 3072x2304 frame as 7 MB u8 instead of 28 MB f32 saves ~0.2 s/image
    (tools/bench_relay.py); `_detect_compact` casts on device."""
    img = np.asarray(image)
    if img.ndim == 3:
        # RGB -> luma (PIL order); stays u8 when the input is u8.  Round
        # before integer casts: a bare cast floors the float luma (up to one
        # gray level, biased down) vs the rounded OpenCV-style conversion.
        luma = img @ np.array([0.299, 0.587, 0.114])
        if np.issubdtype(img.dtype, np.integer):
            luma = np.rint(luma)
        img = luma.astype(img.dtype)

    H0, W0 = img.shape
    ds = 1.0
    if max_width > 0 and W0 > max_width:
        ds = W0 / max_width
        nh, nw = int(round(H0 / ds)), max_width
        img = np.asarray(_bilinear_resize(
            jnp.asarray(img, jnp.float32), nh, nw))
    if img.dtype != np.uint8:
        img = img.astype(np.float32)
    return img, ds


def _detect_finalize(img: jnp.ndarray, out, use_pallas_cc: bool, ds: float,
                     rect_improve: bool = False, rescue: bool = False,
                     n_rounds: int = 3,
                     seed_gate: bool = False, seed_center: bool = False,
                     side_split: bool = False, refine_iters: int = 2):
    """Sync a submitted `_detect_compact`, running the (rare) capped-path
    fallbacks, and return host segments in original image coordinates.

    Every capacity in the compacted fast path is checked against the actual
    counts the device reports; an overflow triggers a loud warning and a
    re-run with that capacity lifted, so no detection is ever silently lost:

    * Pallas CC tile hit its sweep limit -> XLA hook+jump CC path;
    * border-link compaction cap -> uncompacted link merge;
    * active-pixel cap -> full-size (nc_scale=1) pixel list;
    * component cap (c_cap) -> re-run with the component table scaled up;
    * accepted-segment transfer cap -> re-run with a larger transfer buffer.
    """
    H, W = img.shape
    kw = dict(rect_improve=rect_improve, rescue=rescue, n_rounds=n_rounds,
              seed_gate=seed_gate, seed_center=seed_center,
              side_split=side_split, refine_iters=refine_iters)
    pallas_cc = use_pallas_cc
    for _ in range(7):  # each fallback fires at most once + final unpack
        # one batched device_get: the scalar diag reads below would
        # otherwise each pay a separate relay round trip
        out = jax.device_get(out)
        (segs, ok, n_ok, used_count, nc_cap, link_count, link_cap,
         ncomp, c_cap, cc_unconv, n_alive, nc2_cap, n_alive2,
         nc3_cap, gather_ovf) = out
        if int(gather_ovf) > 0:
            # a compacted-gather tile spanned beyond the Pallas window
            # (sparse scene with bridging tiles): entries were poisoned,
            # components would fragment — re-run with the XLA gathers
            print(f"[L3D-TPU] LSD: {int(gather_ovf)} compacted-gather "
                  "entries beyond the window; re-running with XLA "
                  "gathers", flush=True)
            kw.update(use_pallas_gather=False)
        elif pallas_cc and int(cc_unconv) > 0:
            # a CC tile exhausted its in-VMEM sweep budget (geodesically
            # huge component): its labels may fragment one component —
            # fall back to the XLA hook+jump CC for this image
            print(f"[L3D-TPU] LSD: {int(cc_unconv)} CC tiles did not "
                  "converge; falling back to the XLA CC path", flush=True)
            pallas_cc = False
        elif link_cap and int(link_count) > link_cap:
            # border-link cap overflow: merged components would fragment —
            # re-run with link compaction disabled (lsd_cc.merge_tile_labels)
            print(f"[L3D-TPU] LSD: {int(link_count)} border links exceed "
                  f"the {link_cap} compaction cap; re-running uncompacted",
                  flush=True)
            kw.update(use_link_cap=False)
        elif int(used_count) > nc_cap:
            # active-pixel cap overflow (extremely textured image): re-run
            # with compaction disabled rather than silently dropping pixels
            print(f"[L3D-TPU] LSD: {int(used_count)} active pixels exceed "
                  f"the {nc_cap} compaction cap; re-running uncompacted",
                  flush=True)
            kw.update(nc_scale=1.0, use_link_cap=False)
        elif int(nc2_cap) and int(n_alive) > int(nc2_cap):
            # inter-round shrink cap overflow (round 1 consumed little):
            # survivors beyond NC2 would be dropped from rounds 2+ —
            # re-run with the shrink disabled
            print(f"[L3D-TPU] LSD: {int(n_alive)} surviving active pixels "
                  f"exceed the {int(nc2_cap)} inter-round cap; re-running "
                  "unshrunk", flush=True)
            kw.update(shrink_scale=0.0, shrink_scale3=0.0)
        elif int(nc3_cap) and int(n_alive2) > int(nc3_cap):
            # round-3 shrink cap overflow: lift only the round-3 shrink
            # (rounds 2 stays at NC2, which the check above just cleared)
            print(f"[L3D-TPU] LSD: {int(n_alive2)} post-round-2 active "
                  f"pixels exceed the {int(nc3_cap)} round-3 cap; "
                  "re-running with the round-3 shrink lifted", flush=True)
            kw.update(shrink_scale3=0.0)
        elif int(ncomp) > c_cap:
            # component-table overflow: components beyond c_cap route to
            # the dump slot and their segments would be silently dropped —
            # re-run with the table scaled to fit
            scale = -(-int(ncomp) // (1 << 17))
            print(f"[L3D-TPU] LSD: {int(ncomp)} components exceed the "
                  f"{c_cap} component cap; re-running at c_cap_scale="
                  f"{scale}", flush=True)
            kw.update(c_cap_scale=scale)
        elif int(n_ok) > ok.shape[0]:
            # accepted segments beyond the transfer buffer are dropped in
            # label (spatial) order, NOT by strength — re-run with a buffer
            # sized to the actual count
            cap = _round_up(int(n_ok) + 1024, 1024)
            print(f"[L3D-TPU] LSD: {int(n_ok)} raw segments exceed the "
                  f"{ok.shape[0]} transfer cap; re-running with cap={cap}",
                  flush=True)
            kw.update(seg_cap=cap)
        else:
            break
        out = _detect_compact(img, H, W, pallas_cc, **kw)
    segs = np.asarray(segs)[np.asarray(ok)].astype(np.float64)
    # NOTE: collinear-fragment merging (merge_collinear) measurably HURTS
    # reconstruction on the golden testdata — merged 2D segments bridge
    # affinity clusters that the reference keeps separate (round-2 ablation:
    # recall 0.958 -> 0.978, per-line count-F1 0.69 -> 0.80 without it) —
    # so detect() returns the raw accepted rectangles.
    return segs * ds


def detect(image: np.ndarray, max_width: int = -1, n_rounds: int = 3,
           rescue: bool = False,
           seed_gate: bool = False, seed_center: bool = False,
           side_split: bool = False, refine_iters: int = 2) -> np.ndarray:
    """Detect 2D line segments; returns (n, 4) float64 [x1 y1 x2 y2] in
    original image coordinates.

    Mirrors the reference's detectLineSegments flow (line3D.cc:249-372):
    grayscale conversion and optional downscale to ``max_width`` happen
    here; the min-length/top-k filters live in the pipeline's add_view.
    """
    return detect_batch([image], max_width=max_width, depth=1,
                        n_rounds=n_rounds, rescue=rescue,
                        seed_gate=seed_gate,
                        seed_center=seed_center, side_split=side_split,
                        refine_iters=refine_iters)[0]


def detect_batch(images, max_width: int = -1, depth: int = 3,
                 rect_improve: bool = False, rescue: bool = False,
                 n_rounds: int = 3,
                 seed_gate: bool = False, seed_center: bool = False,
                 side_split: bool = False, refine_iters: int = 2) -> list:
    """Pipelined detection over several images.

    JAX dispatch is asynchronous: submitting image i+1's program before
    reading back image i's results overlaps the ~0.3 s/image uplink +
    host readback with the next image's device compute (a ~25% cold-run
    win at testdata scale; no effect on results).  ``depth`` bounds the
    number of in-flight programs (device memory: one padded gradient
    field + label grid each, ~60 MB at 3072x2304); 3 rides out single
    slow relay round trips that depth 2 stalls on.
    """
    use_pallas_cc = jax.default_backend() == "tpu"
    kw = dict(rect_improve=rect_improve, rescue=rescue, n_rounds=n_rounds,
              seed_gate=seed_gate, seed_center=seed_center,
              side_split=side_split, refine_iters=refine_iters)
    results = []
    inflight: list = []
    for image in images:
        img, ds = _detect_prep(image, max_width)
        d_img = jnp.asarray(img)
        H, W = img.shape
        inflight.append(
            (d_img, _detect_dispatch(d_img, H, W, use_pallas_cc, **kw), ds))
        if len(inflight) >= depth:
            d, out, dsf = inflight.pop(0)
            results.append(_detect_finalize(d, out, use_pallas_cc, dsf, **kw))
    for d, out, dsf in inflight:
        results.append(_detect_finalize(d, out, use_pallas_cc, dsf, **kw))
    return results


_MAX_RAW_SEGMENTS = 32768


@functools.partial(jax.jit, static_argnames=("H", "W", "use_pallas_cc",
                                              "nc_scale", "use_link_cap",
                                              "rect_improve", "c_cap_scale",
                                              "seg_cap", "rescue",
                                              "use_pallas_gather",
                                              "seed_gate",
                                              "seed_center", "side_split",
                                              "n_rounds", "shrink_scale",
                                              "shrink_scale3",
                                              "refine_iters"))
def _detect_compact(img: jnp.ndarray, H: int, W: int,
                    use_pallas_cc: bool = False, nc_scale: float = 0.62,
                    use_link_cap: bool = True, rect_improve: bool = False,
                    c_cap_scale: int = 1, seg_cap: int = _MAX_RAW_SEGMENTS,
                    rescue: bool = False, use_pallas_gather: bool = True,
                    seed_gate: bool = False, seed_center: bool = False,
                    side_split: bool = False,
                    n_rounds: int = 3, shrink_scale: float = 0.50,
                    shrink_scale3: float = 0.45, refine_iters: int = 2):
    """Run the core and compact accepted segments ON DEVICE — the raw
    per-component-slot outputs are ~10 MB per image and must never cross
    the host interconnect uncompacted."""
    img = img.astype(jnp.float32)    # u8 uplink, f32 compute
    segs, ok, diag = _lsd_core(img, H, W, n_rounds=n_rounds,
                               refine_iters=refine_iters,
                               use_pallas_cc=use_pallas_cc,
                               nc_scale=nc_scale, use_link_cap=use_link_cap,
                               rect_improve=rect_improve, rescue=rescue,
                               use_pallas_gather=use_pallas_gather,
                               c_cap_scale=c_cap_scale, seed_gate=seed_gate,
                               seed_center=seed_center, side_split=side_split,
                               shrink_scale=shrink_scale,
                               shrink_scale3=shrink_scale3)
    idx = jnp.nonzero(ok, size=seg_cap, fill_value=-1)[0]
    valid = idx >= 0
    return (segs[jnp.maximum(idx, 0)], valid, jnp.sum(ok.astype(jnp.int32)),
            diag["used_count"], diag["nc_cap"], diag["link_count"],
            diag["link_cap"], diag["ncomp"], diag["c_cap"],
            diag["cc_unconverged"], diag["n_alive"], diag["nc2_cap"],
            diag["n_alive2"], diag["nc3_cap"], diag["gather_ovf"])


# --------------------------------------------------------------------------
# AOT warm start.  The detection program takes 7-15 min to compile on the
# axon relay, and the relay's multi-tenant worker pool makes JAX's
# persistent-compilation-cache key drift between sessions (the Mosaic
# custom-call payload varies with the backend worker, so byte-identical
# Python programs hash to different cache keys — measured round 5: three
# fresh processes, three distinct jit__detect_compact keys, 450-570 s
# recompile each).  `jax.experimental.serialize_executable` bypasses the
# cache key entirely: tools/warmup_compile.py compiles once and pickles the
# loaded executable; here we deserialize it (~4 s) and run (~18 s first
# dispatch) instead of recompiling.  Artifacts are keyed by input shape,
# static detect args, AND a fingerprint of the three detection modules, so
# any code edit invalidates them; every failure falls back to normal jit.
# --------------------------------------------------------------------------

def aot_dir() -> str:
    return os.environ.get(
        "L3D_AOT_DIR",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_aot"))


@functools.lru_cache(maxsize=1)
def _code_fingerprint() -> str:
    import hashlib

    from . import lsd_cc, lsd_fit, lsd_gather

    h = hashlib.sha256()
    for mod in (__file__, lsd_fit.__file__, lsd_cc.__file__,
                lsd_gather.__file__):
        with open(mod, "rb") as fh:
            h.update(fh.read())
    return h.hexdigest()[:12]


def aot_path(H: int, W: int, use_pallas_cc: bool, kw: dict,
             dtype: str = "uint8") -> str:
    import hashlib

    key = hashlib.sha256(repr(sorted(kw.items())).encode()).hexdigest()[:8]
    return os.path.join(
        aot_dir(), f"detect_{H}x{W}_{dtype}_p{int(use_pallas_cc)}_{key}_"
        f"{_code_fingerprint()}.pkl")


_aot_loaded: dict = {}
_aot_validated: set = set()


def _detect_dispatch(img, H, W, use_pallas_cc, **kw):
    """`_detect_compact`, served from a serialized AOT executable when one
    matches (shape, dtype, static args, code fingerprint); plain jit
    otherwise."""
    path = aot_path(H, W, use_pallas_cc, kw, dtype=str(img.dtype))
    fn = _aot_loaded.get(path)
    if fn is None and os.path.exists(path):
        import pickle

        from jax.experimental import serialize_executable

        try:
            with open(path, "rb") as fh:
                payload = pickle.loads(fh.read())
            fn = serialize_executable.deserialize_and_load(*payload)
            print(f"[L3D-TPU] LSD: warm-started from {os.path.basename(path)}",
                  flush=True)
        except Exception as e:  # stale/foreign artifact -> recompile
            print(f"[L3D-TPU] LSD: AOT load failed ({e!r}); compiling",
                  flush=True)
            fn = False
        _aot_loaded[path] = fn
    if fn:
        try:
            out = fn(img)
            if path not in _aot_validated:
                # dispatch is async: an executable/worker mismatch would
                # otherwise only surface at the readback inside
                # _detect_finalize, past this except.  Force one scalar
                # readback on the artifact's FIRST use (~20 ms once);
                # later images skip it.
                float(out[2])
                _aot_validated.add(path)
            return out
        except Exception as e:  # relay/runtime mismatch -> recompile
            print(f"[L3D-TPU] LSD: AOT executable failed ({e!r}); compiling",
                  flush=True)
            _aot_loaded[path] = False
    return _detect_compact(img, H, W, use_pallas_cc, **kw)


def aot_warmup(H: int, W: int, use_pallas_cc: bool = True,
               dtype: str = "uint8", **kw) -> str:
    """Compile `_detect_compact` for one input shape/dtype and serialize
    the executable for future processes (tools/warmup_compile.py).
    ``dtype`` defaults to uint8 — the production uplink dtype
    (_detect_prep ships u8 frames; f32 only for float image arrays)."""
    import pickle

    from jax.experimental import serialize_executable

    full_kw = dict(rect_improve=False, rescue=False, n_rounds=3,
                   seed_gate=False, seed_center=False, side_split=False,
                   refine_iters=2)
    full_kw.update(kw)
    path = aot_path(H, W, use_pallas_cc, full_kw, dtype=dtype)
    os.makedirs(aot_dir(), exist_ok=True)
    img = jnp.zeros((H, W), jnp.dtype(dtype))
    compiled = _detect_compact.trace(
        img, H, W, use_pallas_cc, **full_kw).lower().compile()
    payload = serialize_executable.serialize(compiled)
    with open(path, "wb") as fh:
        fh.write(pickle.dumps(payload))
    return path
