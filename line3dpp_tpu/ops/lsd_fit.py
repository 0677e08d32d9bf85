"""Pallas TPU kernels for the LSD rectangle-fit stage.

After CC, active pixels are compacted and sorted by component label
(ops/lsd.py).  The rectangle fits then need, per component: weighted
moments (7 sums), per-pixel values expanded from per-component tables
(axis direction/centroid/width gates), and projection extents (4 min/max).
In XLA these are segment_sum/gather ops that cost ~20 ms each at 2.5M
pixels on a v5e — the round-1 detection bottleneck.

The kernels here exploit the sort: within any tile of 1024 consecutive
sorted pixels, non-dump component slots span a window of at most 1024
consecutive ids.  Each grid step therefore touches only a WIN-sized slice
of the component table, and:

* reductions become a one-hot matmul on the MXU:
  ``acc[:, lo:lo+WIN] += features[8, 128] @ onehot[128, WIN]`` per lane row;
* expansions become the transpose: ``vals = window[8, WIN] @ onehot^T``;
* extents are a masked min-reduce over the same one-hot.

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

WIN = 1152            # window: 1024 max slot span + one 128-lane pad
ROWS = 8              # sublane rows per tile
LANES = 128
TILE_N = ROWS * LANES  # 1024 pixels per grid step
BIG = 1e9


def _tile_window_lo(slot, c_cap):
    """Start of the tile's component window: smallest non-dump slot,
    aligned DOWN to a 128-lane boundary (Mosaic dynamic slices must be
    lane-aligned).  Window slack: max in-tile slot span is 1024, plus at
    most 127 alignment shift — WIN = 1152 covers both exactly."""
    lo = jnp.min(jnp.where(slot < c_cap, slot, c_cap))
    lo = jnp.minimum(lo, c_cap)
    return pl.multiple_of((lo // LANES) * LANES, LANES)


def _moments_kernel(slot_ref, xs_ref, ys_ref, mag_ref, pix_ref, acc_ref,
                    *, c_cap: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    slot = slot_ref[:]
    lo = _tile_window_lo(slot, c_cap)
    local = jnp.clip(slot - lo, 0, WIN - 1)
    # encode out-of-window (dump) pixels as local id WIN-1 with a poisoned
    # id that can never match: Mosaic cannot reshape i1 vectors, so the
    # mask is folded into the int32 local ids instead
    local = jnp.where(slot < c_cap, local, WIN + 1)

    res = jnp.zeros((ROWS, WIN), jnp.float32)
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (LANES, WIN), 1)
    for r in range(ROWS):
        x = xs_ref[r:r + 1, :]
        y = ys_ref[r:r + 1, :]
        pixf = pix_ref[r:r + 1, :]
        w = mag_ref[r:r + 1, :] * pixf
        feats = jnp.concatenate(
            [w, w * x, w * y, w * x * x, w * y * y, w * x * y, pixf,
             jnp.zeros_like(w)], axis=0)                      # (8, 128)
        oh_t = jnp.where(
            iota_w == local[r:r + 1, :].reshape(LANES, 1),
            1.0, 0.0)                                         # (128, WIN)
        res = res + jax.lax.dot_general(
            feats, oh_t, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)               # (8, WIN)

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


def _extent_kernel(scal_ref, slot_ref, xs_ref, ys_ref, ang_ref, pix_ref,
                   tab_ref, ext_ref, newpix_ref, win_ref, dma_sem,
                   *, c_cap: int):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ext_ref[:] = jnp.full_like(ext_ref, BIG)

    lo = _tile_window_lo(slot_ref[:], c_cap)
    dump_keep = scal_ref[0] != 0.0     # pix value for dump pixels in newpix
    # region-angle gate (lsd.cpp `isaligned`): keep a pixel only when its
    # level-line angle is within the tolerance of the component's fitted
    # axis, orientation-free: |cos(a - theta)| >= cos_tol.  cos_tol <= -1
    # disables the gate.
    cos_tol = scal_ref[1]

    # the full feature table (8, c_cap+WIN) would not fit VMEM next to the
    # extents accumulator; it stays in HBM and only the tile's 128-aligned
    # window is DMA'd in
    copy = pltpu.make_async_copy(tab_ref.at[:, pl.ds(lo, WIN)], win_ref,
                                 dma_sem)
    copy.start()
    copy.wait()
    window = win_ref[:]                                       # (8, WIN)
    # running per-bucket minima as (WIN, 1) columns (functional — Mosaic
    # has no in-kernel scatter); transposed to (8, WIN) at the end via an
    # exact eye(8) matmul.  The sublane-row loop is a fori_loop, not a
    # Python unroll: unrolling keeps eight (WIN, 128) temporaries live and
    # blows the Mosaic stack past VMEM.
    iota_w = jax.lax.broadcasted_iota(jnp.int32, (WIN, LANES), 0)

    def row_body(r, cols):
        # dynamic row reads must go through the refs (Mosaic has no
        # dynamic_slice on values)
        slot_r = slot_ref[pl.ds(r, 1), :]
        loc_r = jnp.clip(slot_r - lo, 0, WIN - 1)
        msk_r = slot_r < c_cap
        pix_r = pix_ref[pl.ds(r, 1), :]
        oh = jnp.where((iota_w == loc_r) & msk_r, 1.0, 0.0)    # (WIN, 128)
        vals = jax.lax.dot_general(
            window, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (8, 128)
        ct, st = vals[0:1, :], vals[1:2, :]
        cx, cy = vals[2:3, :], vals[3:4, :]
        gate = vals[4:5, :]
        dxp = xs_ref[pl.ds(r, 1), :] - cx
        dyp = ys_ref[pl.ds(r, 1), :] - cy
        l_proj = dxp * ct + dyp * st
        w_proj = -dxp * st + dyp * ct

        inpix = (pix_r != 0.0) & msk_r
        ON = (oh != 0.0) & inpix                               # (WIN, 128)

        def col_min(col, v):
            m = jnp.where(ON, jnp.broadcast_to(v, ON.shape), BIG)
            return jnp.minimum(col, jnp.min(m, axis=1, keepdims=True))

        ang_r = ang_ref[pl.ds(r, 1), :]
        aligned = jnp.abs(jnp.cos(ang_r) * ct
                          + jnp.sin(ang_r) * st) >= cos_tol
        keep = (pix_r != 0.0) & (jnp.abs(w_proj) <= gate) & aligned
        newpix_ref[pl.ds(r, 1), :] = jnp.where(
            msk_r, jnp.where(keep, 1.0, 0.0),
            jnp.where(dump_keep & (pix_r != 0.0), 1.0, 0.0))

        return (col_min(cols[0], l_proj), col_min(cols[1], w_proj),
                col_min(cols[2], -l_proj), col_min(cols[3], -w_proj))

    init = tuple(jnp.full((WIN, 1), BIG, jnp.float32) for _ in range(4))
    cols = jax.lax.fori_loop(0, ROWS, row_body, init)

    A = jnp.concatenate(
        list(cols) + [jnp.full((WIN, 1), BIG, jnp.float32)] * 4,
        axis=1)                                                # (WIN, 8)
    eye8 = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (ROWS, ROWS), 1), 1.0, 0.0)
    # ext[f, w] = A[w, f]: exact transpose as an identity matmul
    ext = jax.lax.dot_general(eye8, A, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)
    cur = ext_ref[:, pl.ds(lo, WIN)]
    ext_ref[:, pl.ds(lo, WIN)] = jnp.minimum(cur, ext)


@functools.partial(jax.jit, static_argnames=("c_cap", "interpret"))
def extents(slot, xs, ys, ang, pix, tables, dump_keep: jnp.ndarray,
            cos_tol: jnp.ndarray, c_cap: int, interpret: bool = False):
    """Projection extents + gated pixel mask update, one pass.

    ``tables`` is ``[8, c_cap + WIN]`` f32 with rows (cos t, sin t, cx, cy,
    gate, ...).  Returns ``(ext [8, c_cap], newpix [N])`` where ext rows are
    (lmin, wmin, -lmax(min of neg), -wmax) and
    ``newpix = pix & (|w_proj| <= gate[slot]) & aligned`` with
    ``aligned = |cos(ang - theta[slot])| >= cos_tol`` (the lsd.cpp
    `isaligned` region-angle test; pass ``cos_tol <= -1`` to disable).
    Dump pixels keep ``pix`` when ``dump_keep`` else drop.
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
    scal = jnp.stack([jnp.where(dump_keep, 1.0, 0.0).astype(jnp.float32),
                      cos_tol.astype(jnp.float32)])
    ext, newpix = pl.pallas_call(
        functools.partial(_extent_kernel, c_cap=c_cap),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
        + [blk] * 5 + [pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(full, blk),
        out_shape=(jax.ShapeDtypeStruct((ROWS, c_cap + WIN), jnp.float32),
                   jax.ShapeDtypeStruct(shape2, jnp.float32)),
        scratch_shapes=[pltpu.VMEM((ROWS, WIN), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(scal, slot.reshape(shape2), xs.reshape(shape2), ys.reshape(shape2),
      ang.reshape(shape2), pix.reshape(shape2), tables)
    return ext[:, :c_cap], newpix.reshape(n)
