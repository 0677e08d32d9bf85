"""Pallas TPU kernels for the LSD rectangle-fit stage.

After CC, active pixels are compacted and sorted by component label
(ops/lsd.py).  The rectangle fits then need, per component: weighted
moments (7 sums), per-pixel values expanded from per-component tables
(axis direction/centroid/width gates), and projection extents (4 min/max).
In XLA these are segment_sum/gather ops that cost ~20 ms each at 2.5M
pixels on a v5e — the round-1 detection bottleneck.

The kernels here exploit the sort: within any tile of 1024 consecutive
sorted pixels, non-dump component slots span a window of at most ~206
consecutive ids (every run covers >= MIN_RUN pixels — see the WIN
derivation below).  Each grid step therefore touches only a WIN-sized
slice of the component table, and:

* reductions become a one-hot matmul on the MXU:
  ``acc[:, lo:lo+WIN] += features[8, 128] @ onehot[128, WIN]`` per lane row;
* expansions become the transpose: ``vals = window[8, WIN] @ onehot^T``;
* extents use a segmented suffix-min over each tile's sorted runs plus a
  run-head sum-matmul scatter (see `_extent_kernel`).

Everything is feature-major ([8, C] tables: features on sublanes,
components on lanes), the full accumulator lives in VMEM across the
sequential grid, and each sorted pixel is read exactly once per pass.

Reference parity: these compute exactly the sums/extents of
lsd.cpp `get_theta` / rectangle fit; see ops/lsd.py `_lsd_core`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# One-hot matmul precision: HIGHEST (f32).  Do NOT "optimize" this to
# HIGH: the installed JAX 0.9.0 Mosaic lowering rejects HIGH inside
# Pallas kernels (pallas/mosaic/lowering.py:2254 "Unsupported dot
# precision"), which broke every TPU detection run in round 4
# (BENCH_r04 rc=1).  The bf16x3-exactness argument was also wrong:
# bf16_3x recomposition of an f32 operand is not exact in general.
# tests/test_lsd_fit.py::test_kernels_lower_for_tpu pins lowerability.
_PREC = jax.lax.Precision.HIGHEST

ROWS = 8              # sublane rows per tile
LANES = 128
TILE_N = ROWS * LANES  # 1024 pixels per grid step
MIN_RUN = 5           # smallest non-dump run (lsd.cpp npix >= 5 region test;
                      # enforced by ops/lsd.py _lsd_round's big_run filter)
# Window of consecutive component ids a tile can touch.  Component ids are
# consecutive over the label-sorted pixels and only increment at run
# starts; every run starting inside a tile except the last spans >=
# MIN_RUN in-tile pixels, plus at most one run straddling in from the
# previous tile: span <= (TILE_N - 1) // MIN_RUN + 2 = 206.  With the
# <= 127-lane down-alignment of the window start, max local id is
# 206 - 1 + 127 = 332 < 384.  (Dump-slot pixels only shrink the count.)
WIN = 384
assert ((TILE_N - 1) // MIN_RUN + 2 - 1) + (LANES - 1) <= WIN - 1
BIG = 1e9


def _tile_window_lo(slot, c_cap):
    """Start of the tile's component window: smallest non-dump slot,
    aligned DOWN to a 128-lane boundary (Mosaic dynamic slices must be
    lane-aligned).  Callers must respect the MIN_RUN contiguity invariant
    (see the WIN derivation at the top): a slot layout with runs shorter
    than MIN_RUN can exceed the WIN-127 span this window covers and would
    silently alias component ids through the clip."""
    lo = jnp.min(jnp.where(slot < c_cap, slot, c_cap))
    lo = jnp.minimum(lo, c_cap)
    return pl.multiple_of((lo // LANES) * LANES, LANES)


def _onehot_t(slot, c_cap: int):
    """(WIN, TILE_N) one-hot of the tile's window-local component ids,
    dump/out-of-window pixels poisoned to an id that never matches.
    Built once per tile and shared by the expansion matmul
    (``window @ oh -> per-pixel values``) and the scatter matmul
    (``feats ·contract pixels· oh -> per-component sums``)."""
    lo = _tile_window_lo(slot, c_cap)
    local = jnp.clip(slot - lo, 0, WIN - 1)
    # Mosaic cannot reshape i1 vectors: fold the dump mask into the int32
    # local ids instead (WIN + 1 never equals a window row)
    local = jnp.where(slot < c_cap, local, WIN + 1)
    loc_flat = local.reshape(1, TILE_N)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (WIN, TILE_N), 0)
    return lo, jnp.where(iota_w == loc_flat, 1.0, 0.0)


def _flat(v):
    """(ROWS, LANES) -> (1, TILE_N) row-major relayout."""
    return v.reshape(1, TILE_N)


def _moments_kernel(slot_ref, xs_ref, ys_ref, mag_ref, pix_ref, acc_ref,
                    *, c_cap: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # whole-tile (8, 128) vector ops — the previous per-row (1, 128)
    # formulation issued 8x the VPU ops for the same work
    lo, oh = _onehot_t(slot_ref[:], c_cap)
    x = xs_ref[:]
    y = ys_ref[:]
    pixf = pix_ref[:]
    w = mag_ref[:] * pixf
    feats = jnp.concatenate(
        [_flat(w), _flat(w * x), _flat(w * y), _flat(w * x * x),
         _flat(w * y * y), _flat(w * x * y), _flat(pixf),
         jnp.zeros((1, TILE_N), jnp.float32)], axis=0)        # (8, TILE_N)
    res = jax.lax.dot_general(
        feats, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                   # (8, WIN)

    acc_ref[:, pl.ds(lo, WIN)] += res


@functools.partial(jax.jit, static_argnames=("c_cap", "interpret"))
def moments(slot, xs, ys, mag, pix, c_cap: int, interpret: bool = False):
    """Per-component weighted moments.

    Inputs are the label-sorted compacted pixel arrays, length N (multiple
    of 1024).  Returns ``[8, c_cap]`` f32: rows (sum_w, sum_wx, sum_wy,
    sum_wxx, sum_wyy, sum_wxy, npix, 0).
    """
    n = slot.shape[0]
    assert n % TILE_N == 0, n
    shape2 = (n // LANES, LANES)
    grid = (n // TILE_N,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_moments_kernel, c_cap=c_cap),
        grid=grid,
        in_specs=[blk] * 5,
        out_specs=pl.BlockSpec((ROWS, c_cap + WIN), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ROWS, c_cap + WIN), jnp.float32),
        interpret=interpret,
    )(slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      mag.reshape(shape2), pix.reshape(shape2))
    return out[:, :c_cap]


# default sentinel for the run-head scatter matmul: must exceed any
# |projection| (bounded by the padded grid diagonal) while staying small
# enough that (v - sb) keeps f32 absolute precision ~1e-3 (at 1e9 it
# would be ~64).  `extents()` takes the actual bound as a static arg so
# arbitrarily large full-resolution images stay correct (ops/lsd.py
# passes the grid diagonal rounded up to a power of two).
_SB = 8192.0


def _extent_kernel(slot_ref, xs_ref, ys_ref, pix_ref,
                   tab_ref, ext_ref, *, c_cap: int, sb: float):
    """Per-component projection extents via segmented suffix-min.

    Pixels arrive label-sorted, so each component's pixels in a tile form
    ONE contiguous run (dump-slot pixels separate different labels, never
    split a label's run).  Per row the run-wise min is computed with 7
    sorted-key log-shift steps on (1, 128) vectors plus a cross-row carry
    (rows processed last-to-first); each run's total then sits at its
    in-tile head pixel, and heads are unique per (component, tile), so the
    scatter back to the component window is an EXACT sum matmul
    ``feats(8,128) @ onehot(128,WIN)`` on the MXU — the same shape as the
    moments kernel.  This replaces the previous four (WIN, 128) masked
    column-min reductions per row, which dominated the kernel (measured
    56 -> 33 ms at WIN=1152, before the WIN=384 shrink cut the one-hot
    cost further; tools/bench_lsd_kernels.py)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        ext_ref[:] = jnp.full_like(ext_ref, BIG)

    slot = slot_ref[:]                                        # (8, 128)
    msk = slot < c_cap
    lo, oh = _onehot_t(slot, c_cap)                           # (WIN, TILE_N)
    # full feature table (4.2 MB) stays VMEM-resident across the grid
    window = tab_ref[:, pl.ds(lo, WIN)]                       # (8, WIN)
    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1)
    row = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 1), 0)

    # table expansion: ONE (8, WIN) @ (WIN, 1024) matmul, then per-feature
    # (1, 1024) -> (8, 128) relayouts so everything below runs whole-tile
    # (the previous per-row (1, 128) formulation issued 8x the VPU ops)
    vals_all = jax.lax.dot_general(
        window, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                    # (8, 1024)
    grid2 = lambda f: vals_all[f:f + 1, :].reshape(ROWS, LANES)
    ct, st, cx, cy = grid2(0), grid2(1), grid2(2), grid2(3)
    dxp = xs_ref[:] - cx
    dyp = ys_ref[:] - cy
    l_proj = dxp * ct + dyp * st
    w_proj = -dxp * st + dyp * ct

    inpix = (pix_ref[:] != 0.0) & msk
    vs = [jnp.where(inpix, l_proj, BIG),
          jnp.where(inpix, w_proj, BIG),
          jnp.where(inpix, -l_proj, BIG),
          jnp.where(inpix, -w_proj, BIG)]

    # in-row segmented suffix-min, all 8 rows at once: after step d, lane j
    # holds the min over same-slot lanes [j, min(j + 2d - 1, run end)] —
    # sorted keys make the plain equality test sufficient
    for d in (1, 2, 4, 8, 16, 32, 64):
        ok_sh = (lane + d <= LANES - 1) & \
            (slot == jnp.roll(slot, -d, axis=1))
        vs = [jnp.minimum(v, jnp.where(ok_sh, jnp.roll(v, -d, axis=1),
                                       BIG)) for v in vs]

    # cross-row carry: a run's tail in row r continues into row r+1 iff
    # slot[r, j] == slot[r+1, 0].  After the in-row pass, lane 0 of each
    # row holds that row's head-run min, so the carry chain is a segmented
    # suffix-min over the (8, 1) lane-0 column keyed by its slot
    s0 = slot[:, 0:1]                                          # (8, 1)
    c0 = [v[:, 0:1] for v in vs]
    for d in (1, 2, 4):
        ok_r = (row + d <= ROWS - 1) & (s0 == jnp.roll(s0, -d, axis=0))
        c0 = [jnp.minimum(c, jnp.where(ok_r, jnp.roll(c, -d, axis=0), BIG))
              for c in c0]
    # shift down: carry for row r comes from row r+1's chained column value
    s_next = jnp.where(row <= ROWS - 2, jnp.roll(s0, -1, axis=0), -1)
    cont = slot == s_next                                      # (8, 128)
    vs = [jnp.where(cont, jnp.minimum(v, jnp.roll(c, -1, axis=0)), v)
          for v, c in zip(vs, c0)]

    # in-tile run heads: previous element (row-major) has another slot; the
    # tile's first element is always a head
    prev = jnp.roll(slot, 1, axis=1)
    prev_row_last = jnp.where(row >= 1, jnp.roll(slot[:, LANES - 1:], 1,
                                                 axis=0), -1)
    prev = jnp.where(lane == 0, prev_row_last, prev)
    hm = jnp.where((slot != prev) & msk, 1.0, 0.0)

    # head scatter as an exact sum matmul reusing the SAME one-hot: one
    # head per (slot, tile), all other lanes contribute 0; +sb restores
    # values afterwards (dump pixels have an all-zero one-hot column)
    feats = jnp.concatenate(
        [_flat(hm * (v - sb)) for v in vs]
        + [jnp.zeros((4, TILE_N), jnp.float32)], axis=0)        # (8, TILE_N)
    acc = jax.lax.dot_general(
        feats, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                    # (8, WIN)
    # components absent from this tile contributed exactly 0 (a present
    # head contributes v - sb != 0 since |v| < sb or v = BIG): keep BIG
    ext = jnp.where(acc == 0.0, BIG, acc + sb)
    cur = ext_ref[:, pl.ds(lo, WIN)]
    ext_ref[:, pl.ds(lo, WIN)] = jnp.minimum(cur, ext)


def _gate_kernel(scal_ref, slot_ref, xs_ref, ys_ref, ang_ref, pix_ref,
                 tab_ref, newpix_ref, *, c_cap: int):
    """newpix-only variant of `_extent_kernel`: the density-refine and
    pixel-consumption passes (ops/lsd.py `gated_pix`) never read the
    extents, and the four (WIN, 128) masked column-min reductions are
    ~80% of that kernel's time — this drops them, keeping only the one-hot
    MXU table expansion and the per-pixel gate test."""
    dump_keep = scal_ref[0] != 0.0
    cos_tol = scal_ref[1]
    slot = slot_ref[:]                                        # (8, 128)
    msk = slot < c_cap
    lo, oh = _onehot_t(slot, c_cap)
    window = tab_ref[:, pl.ds(lo, WIN)]                       # (8, WIN)

    # one table expansion for all 8 rows, whole-tile ops below
    # (see _extent_kernel)
    vals_all = jax.lax.dot_general(
        window, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                    # (8, 1024)
    grid2 = lambda f: vals_all[f:f + 1, :].reshape(ROWS, LANES)
    ct, st, cx, cy, gate, center = (grid2(0), grid2(1), grid2(2), grid2(3),
                                    grid2(4), grid2(5))
    dxp = xs_ref[:] - cx
    dyp = ys_ref[:] - cy
    # row 5 holds an optional band center on the rect normal (zero
    # everywhere except the seed-anchored refine, ops/lsd.py seed_center);
    # subtracting AFTER the projection keeps the arithmetic bit-identical
    # to the XLA path's `w_proj - expand(center)`
    w_proj = (-dxp * st + dyp * ct) - center
    ang = ang_ref[:]
    pix = pix_ref[:]
    aligned = jnp.abs(jnp.cos(ang) * ct + jnp.sin(ang) * st) >= cos_tol
    keep = (pix != 0.0) & (jnp.abs(w_proj) <= gate) & aligned
    newpix_ref[:] = jnp.where(
        msk, jnp.where(keep, 1.0, 0.0),
        jnp.where(dump_keep & (pix != 0.0), 1.0, 0.0))


def _gate_moments_kernel(scal_ref, slot_ref, xs_ref, ys_ref, ang_ref,
                         mag_ref, pix_ref, tab_ref, newpix_ref, acc_ref,
                         *, c_cap: int):
    """Fused `_gate_kernel` + `_moments_kernel`: the density-refine loop
    always follows a gate pass with a moments pass over the gated pixels
    (ops/lsd.py refine loop), which re-reads the same 6 pixel planes —
    fusing them halves that traffic and shares the one-hot build
    (~30 ms/round at 2.8M pixels).  Semantically identical to
    ``gate_pixels`` followed by ``moments`` on its output."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    dump_keep = scal_ref[0] != 0.0
    cos_tol = scal_ref[1]
    slot = slot_ref[:]                                        # (8, 128)
    msk = slot < c_cap
    lo, oh = _onehot_t(slot, c_cap)                           # (WIN, 1024)
    window = tab_ref[:, pl.ds(lo, WIN)]                       # (8, WIN)

    vals_all = jax.lax.dot_general(
        window, oh, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                    # (8, 1024)
    grid2 = lambda f: vals_all[f:f + 1, :].reshape(ROWS, LANES)
    ct, st, cx, cy, gate, center = (grid2(0), grid2(1), grid2(2), grid2(3),
                                    grid2(4), grid2(5))
    dxp = xs_ref[:] - cx
    dyp = ys_ref[:] - cy
    w_proj = (-dxp * st + dyp * ct) - center
    ang = ang_ref[:]
    pix = pix_ref[:]
    aligned = jnp.abs(jnp.cos(ang) * ct + jnp.sin(ang) * st) >= cos_tol
    keep = (pix != 0.0) & (jnp.abs(w_proj) <= gate) & aligned
    newpix = jnp.where(
        msk, jnp.where(keep, 1.0, 0.0),
        jnp.where(dump_keep & (pix != 0.0), 1.0, 0.0))
    newpix_ref[:] = newpix

    x = xs_ref[:]
    y = ys_ref[:]
    w = mag_ref[:] * newpix
    feats = jnp.concatenate(
        [_flat(w), _flat(w * x), _flat(w * y), _flat(w * x * x),
         _flat(w * y * y), _flat(w * x * y), _flat(newpix),
         jnp.zeros((1, TILE_N), jnp.float32)], axis=0)        # (8, TILE_N)
    acc_ref[:, pl.ds(lo, WIN)] += jax.lax.dot_general(
        feats, oh, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=_PREC)                   # (8, WIN)


@functools.partial(jax.jit, static_argnames=("c_cap", "interpret"))
def gate_moments(slot, xs, ys, ang, mag, pix, tables,
                 dump_keep: jnp.ndarray, cos_tol: jnp.ndarray, c_cap: int,
                 interpret: bool = False):
    """Fused :func:`gate_pixels` + :func:`moments` over the gated output.

    Returns ``(newpix (n,), mom [8, c_cap])`` — bit-identical to calling
    the two kernels back to back (same formulas, same precision, newpix
    is exactly 0/1), at roughly the cost of one."""
    n = slot.shape[0]
    assert n % TILE_N == 0, n
    assert tables.shape == (ROWS, c_cap + WIN), tables.shape
    shape2 = (n // LANES, LANES)
    grid = (n // TILE_N,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((ROWS, c_cap + WIN), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    scal = jnp.stack([jnp.where(dump_keep, 1.0, 0.0).astype(jnp.float32),
                      cos_tol.astype(jnp.float32)])
    newpix, acc = pl.pallas_call(
        functools.partial(_gate_moments_kernel, c_cap=c_cap),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk] * 6 + [full],
        out_specs=[blk, full],
        out_shape=[jax.ShapeDtypeStruct(shape2, jnp.float32),
                   jax.ShapeDtypeStruct((ROWS, c_cap + WIN), jnp.float32)],
        interpret=interpret,
    )(scal, slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      ang.reshape(shape2), mag.reshape(shape2), pix.reshape(shape2), tables)
    return newpix.reshape(n), acc[:, :c_cap]


@functools.partial(jax.jit, static_argnames=("c_cap", "interpret"))
def gate_pixels(slot, xs, ys, ang, pix, tables, dump_keep: jnp.ndarray,
                cos_tol: jnp.ndarray, c_cap: int, interpret: bool = False):
    """``newpix`` of :func:`extents` without the extents reduction —
    identical gating semantics, ~3x faster.

    ``tables`` row 5 holds an optional band center on the rect normal
    (the kernel tests ``|w_proj - center| <= gate``); all-zero row 5
    reproduces the plain symmetric band of :func:`extents`."""
    n = slot.shape[0]
    assert n % TILE_N == 0, n
    assert tables.shape == (ROWS, c_cap + WIN), tables.shape
    shape2 = (n // LANES, LANES)
    grid = (n // TILE_N,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((ROWS, c_cap + WIN), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    scal = jnp.stack([jnp.where(dump_keep, 1.0, 0.0).astype(jnp.float32),
                      cos_tol.astype(jnp.float32)])
    newpix = pl.pallas_call(
        functools.partial(_gate_kernel, c_cap=c_cap),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk] * 5 + [full],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct(shape2, jnp.float32),
        interpret=interpret,
    )(scal, slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      ang.reshape(shape2), pix.reshape(shape2), tables)
    return newpix.reshape(n)


def _band_counts_kernel(slot_ref, xs_ref, ys_ref, pix_ref, tab_ref, acc_ref,
                        *, c_cap: int, bands: tuple):
    """Region-pixel counts of every component in up to 8 reduced bands —
    the batched analog of lsd.cpp rect_improve's width/side-reduction
    retries (lsd.cpp:1756-1873), one pass for all components and all
    attempts.  ``bands`` row r = (lo_w, lo_c, hi_w, hi_c): count pixels
    with ``lo_w*width + lo_c <= 2*(w_proj - mid) <= hi_w*width + hi_c``
    (symmetric width cuts AND one-sided cuts are both linear in width in
    this form)."""
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    lo = _tile_window_lo(slot_ref[:], c_cap)
    window = tab_ref[:, pl.ds(lo, WIN)]                       # (8, WIN)
    iota_wl = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANES), 0)
    iota_lw = jax.lax.broadcasted_iota(jnp.int32, (LANES, WIN), 1)

    def row_body(r, acc):
        slot_r = slot_ref[pl.ds(r, 1), :]
        loc_r = jnp.clip(slot_r - lo, 0, WIN - 1)
        msk_r = slot_r < c_cap
        pix_r = pix_ref[pl.ds(r, 1), :]
        oh = jnp.where((iota_wl == loc_r) & msk_r, 1.0, 0.0)   # (WIN, 128)
        vals = jax.lax.dot_general(
            window, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC)                # (8, 128)
        ct, st = vals[0:1, :], vals[1:2, :]
        cx, cy = vals[2:3, :], vals[3:4, :]
        mid, width = vals[4:5, :], vals[5:6, :]
        dxp = xs_ref[pl.ds(r, 1), :] - cx
        dyp = ys_ref[pl.ds(r, 1), :] - cy
        w_proj = -dxp * st + dyp * ct
        s = 2.0 * (w_proj - mid)
        inpix = jnp.where((pix_r != 0.0) & msk_r, 1.0, 0.0)
        rows = [
            inpix * jnp.where(
                (s >= lo_w * width + lo_c) & (s <= hi_w * width + hi_c),
                1.0, 0.0)
            for (lo_w, lo_c, hi_w, hi_c) in bands
        ]
        feats = jnp.concatenate(
            rows + [jnp.zeros_like(inpix)] * (ROWS - len(rows)), axis=0)
        loc_m = jnp.where(msk_r, loc_r, WIN + 1)
        oh_t = jnp.where(iota_lw == loc_m.reshape(LANES, 1), 1.0, 0.0)
        return acc + jax.lax.dot_general(
            feats, oh_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=_PREC)                # (8, WIN)

    acc = jax.lax.fori_loop(0, ROWS, row_body,
                            jnp.zeros((ROWS, WIN), jnp.float32))
    acc_ref[:, pl.ds(lo, WIN)] += acc


# default bands reproduce the original symmetric width retries:
# row b counts 2|w_proj - mid| <= width - 0.5 (b+1)
SYM_BANDS = tuple((-1.0, 0.5 * (b + 1), 1.0, -0.5 * (b + 1))
                  for b in range(4))


@functools.partial(jax.jit, static_argnames=("c_cap", "bands", "interpret"))
def band_counts(slot, xs, ys, pix, tables, c_cap: int,
                bands: tuple = SYM_BANDS, interpret: bool = False):
    """Counts of region pixels within up to 8 reduced bands per component.

    ``tables`` rows: (cos t, sin t, cx, cy, band mid = (wmin+wmax)/2,
    width, ...).  ``bands`` row r = (lo_w, lo_c, hi_w, hi_c) counts pixels
    with ``lo_w*width+lo_c <= 2*(w_proj - mid) <= hi_w*width+hi_c``;
    the default reproduces the 4 symmetric width cuts
    ``2|w_proj - mid| <= width - 0.5 (b+1)``.  Returns ``[8, c_cap]``.
    """
    n = slot.shape[0]
    assert n % TILE_N == 0, n
    assert tables.shape == (ROWS, c_cap + WIN), tables.shape
    assert len(bands) <= ROWS, bands
    shape2 = (n // LANES, LANES)
    grid = (n // TILE_N,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((ROWS, c_cap + WIN), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_band_counts_kernel, c_cap=c_cap, bands=bands),
        grid=grid,
        in_specs=[blk] * 4 + [full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, c_cap + WIN), jnp.float32),
        interpret=interpret,
    )(slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      pix.reshape(shape2), tables)
    return out[:, :c_cap]


@functools.partial(jax.jit, static_argnames=("c_cap", "sb", "interpret"))
def extents(slot, xs, ys, pix, tables, c_cap: int, sb: float = _SB,
            interpret: bool = False):
    """Per-component projection extents over the label-sorted pixels.

    ``tables`` is ``[8, c_cap + WIN]`` f32 with rows (cos t, sin t, cx, cy,
    ...).  Returns ``ext [8, c_cap]`` with rows (lmin, wmin, -lmax (min of
    the negation), -wmax); rows 4-7 are BIG padding.  Pixel gating lives in
    :func:`gate_pixels` (the former fused newpix output was never consumed
    together with the extents).
    """
    n = slot.shape[0]
    assert n % TILE_N == 0, n
    assert tables.shape == (ROWS, c_cap + WIN), tables.shape
    shape2 = (n // LANES, LANES)
    grid = (n // TILE_N,)
    blk = pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    full = pl.BlockSpec((ROWS, c_cap + WIN), lambda i: (0, 0),
                        memory_space=pltpu.VMEM)
    ext = pl.pallas_call(
        functools.partial(_extent_kernel, c_cap=c_cap, sb=float(sb)),
        grid=grid,
        in_specs=[blk] * 4 + [full],
        out_specs=full,
        out_shape=jax.ShapeDtypeStruct((ROWS, c_cap + WIN), jnp.float32),
        interpret=interpret,
    )(slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      pix.reshape(shape2), tables)
    return ext[:, :c_cap]
