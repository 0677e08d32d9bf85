"""Pallas TPU kernels for the two LSD label gathers.

After tile-local CC (`lsd_cc.cc_tiles`) and the border merge
(`merge_tile_labels` -> root map ``T``), every detection round needs

    lab_c = T[lab_d.flat[safe_idx]]          # 2 x 2.8M arbitrary gathers

XLA lowers both to ~12 ns/element serial gathers (~66 ms/image round 1 —
the largest single cost left in the round after the round-5 fusions;
``indices_are_sorted`` hints measurably change nothing).  Both gathers
have structure XLA cannot see:

* ``T`` applied to the DENSE grid has perfect tile locality: cc_tiles
  labels are in-tile roots, so every label inside dense tile t is a flat
  index INSIDE tile t — viewing ``T`` as an (hp, wp) image and giving the
  kernel the SAME (th, tw) block as the label tile makes the lookup a
  VMEM-local select (`apply_merge_dense`);
* the compacted gather's indices are SORTED, so each 1024-entry tile of
  ``safe_idx`` touches one contiguous window of the dense grid (measured
  spans on testdata: p50 ~2.6k, p99 ~12k, max 54k at round-1 density) —
  a scalar-prefetched window base + one VMEM window per tile covers it
  (`gather_sorted`); tiles whose span exceeds the window are counted and
  poisoned, and the caller falls back to the XLA gather for that image.

Everything stays LANE-major (pixels ride the 128 lanes, table rows ride
sublanes): a row-one-hot MXU matmul replicates each pixel's source row
into its lane, then Mosaic's supported sublane `take_along_axis` gather
picks the element — no unsupported relayouts, no per-element loop.
Labels are < 2^24 (padded grids up to 16.7M pixels), so f32 matmul
arithmetic is exact; larger grids must use the XLA path (`detect()`
grids are ~5M).

Reference parity: this computes exactly ``T[lab_d.flat[idx]]``; see
ops/lsd.py `_lsd_round`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
ROWS = 8
CHUNK = ROWS * LANES          # entries per processing chunk
_PREC = jax.lax.Precision.HIGHEST
# f32 matmul exactness bound for integer payloads
MAX_EXACT_LABEL = 1 << 24


def _planes(table_i32):
    """Byte planes of an i32 table in [0, 2^24) — bf16 (integers 0..255
    are exact) so the one-hot matmuls run native single-pass bf16."""
    return tuple(((table_i32 >> s) & 0xFF).astype(jnp.bfloat16)
                 for s in (0, 8, 16))


def _select(planes, row, lane):
    """``table[row[p], lane[p]]`` for CHUNK entries, lane-major.

    ``planes``: byte planes from :func:`_planes` of an (n_rows, 128) i32
    table in [0, 2^24); ``row``/``lane``:
    (ROWS, LANES) i32 (pre-clamped in range).  A (n_rows, CHUNK) one-hot
    matmul replicates each entry's source row into its lane column, then
    a sublane one-hot mask + reduce picks the lane value (Mosaic's
    sublane gather cannot span >1 vreg).  The table is split into three
    byte planes so the matmuls run at DEFAULT precision (one bf16 MXU
    pass each — integers 0..255 and 0/1 one-hots are exact in bf16, and
    a one-hot contraction has a single nonzero per output, so the result
    is exact; HIGHEST would cost 6 passes for the same answer).
    Returns (ROWS, LANES) i32."""
    row_f = row.reshape(1, CHUNK)
    lane_f = lane.reshape(1, CHUNK)
    n_rows = planes[0].shape[0]
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (n_rows, CHUNK), 0)
    oh = jnp.where(iota_r == row_f, 1.0, 0.0).astype(
        jnp.bfloat16)                                     # (n_rows, 1024)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (LANES, CHUNK), 0)
    lane_m = iota_l == lane_f

    out = jnp.zeros((1, CHUNK), jnp.int32)
    for shift, plane in zip((0, 8, 16), planes):
        picked = jax.lax.dot_general(
            plane, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)          # (128, 1024)
        sel = jnp.sum(jnp.where(lane_m, picked, 0.0), axis=0,
                      keepdims=True)
        out = out | (sel.astype(jnp.int32) << shift)
    return out.reshape(ROWS, LANES)


def _merge_kernel(lab_ref, t_ref, out_ref, *, th: int, tw: int,
                  invalid: int):
    """out = T[lab] over one dense tile; labels are in-tile flat indices.

    Each CHUNK of pixels stores straight to ``out_ref`` so its
    temporaries die before the next chunk (a concatenate-at-the-end
    variant kept 64 chunks of one-hots live and blew the 16 MB
    scoped-vmem stack at 91 MB)."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    wp = pl.num_programs(1) * tw
    base = i * th * wp + j * tw                  # flat index of tile[0, 0]
    n_rows = (th * tw) // LANES

    # T tile in row-major (n_rows, 128) local layout: local flat offset
    # o = y_loc * tw + x_loc lives at (o // 128, o % 128)
    t_planes = _planes(t_ref[...].reshape(n_rows, LANES))

    lab = lab_ref[...]                                    # (th, tw) i32
    ok = lab < invalid
    safe = jnp.where(ok, lab, base)
    o = (safe // wp - i * th) * tw + (safe % wp - j * tw)
    o = jnp.clip(o, 0, th * tw - 1)

    k = CHUNK // tw                              # dense rows per chunk
    for c in range(th // k):
        oc = o[k * c:k * c + k, :].reshape(ROWS, LANES)
        vc = _select(t_planes, oc >> 7, oc & (LANES - 1))
        out_ref[k * c:k * c + k, :] = jnp.where(
            ok[k * c:k * c + k, :], vc.reshape(k, tw), invalid)


@functools.partial(jax.jit, static_argnames=("tile", "invalid", "interpret"))
def apply_merge_dense(lab_d, T, tile: tuple, invalid: int,
                      interpret: bool = False):
    """``where(lab_d < invalid, T.reshape(grid)[lab_d], invalid)`` with the
    root map applied tile-locally (cc_tiles labels never leave their
    tile).  ``T`` has length hp*wp."""
    hp, wp = lab_d.shape
    th, tw = tile
    assert hp % th == 0 and wp % tw == 0
    assert tw % LANES == 0 and (th * tw) % CHUNK == 0 and CHUNK % tw == 0
    grid = (hp // th, wp // tw)
    blk = pl.BlockSpec((th, tw), lambda i, j: (i, j),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_merge_kernel, th=th, tw=tw, invalid=invalid),
        grid=grid,
        in_specs=[blk, blk],
        out_specs=blk,
        out_shape=jax.ShapeDtypeStruct((hp, wp), jnp.int32),
        interpret=interpret,
    )(lab_d, T.reshape(hp, wp))


MAX_CHUNKS = 8


def _gather_kernel(scal_ref, idx_ref, src_hbm, out_ref, ovf_ref,
                   win_ref, sem, *, win_rows: int, n_src_rows: int,
                   fill: int):
    """out[p] = src[idx[p]] for one 1024-entry sorted-index tile.

    The tile's indices span [base*128, max_idx]; the kernel walks that
    span in ``win_rows``-row DMA chunks (usually one — testdata round-1
    spans: p50 ~2.6k elements, p99 ~12k, per-image max up to 152k), so
    occasional long-span tiles cost extra chunks instead of poisoning
    the whole image into the XLA fallback.  Tiles needing more than
    MAX_CHUNKS chunks still overflow (counted; caller falls back)."""
    g = pl.program_id(0)

    @pl.when(g == 0)
    def _():
        ovf_ref[0, 0] = 0

    base = scal_ref[g]
    n_valid = scal_ref[scal_ref.shape[0] - 1]

    idx = idx_ref[...]                                    # (8, 128) i32
    # chunks needed to reach the tile's max index (sorted -> last entry,
    # but padding clamps to the grid end: bound by real entries only)
    pos = (g * CHUNK
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 0) * LANES
           + jax.lax.broadcasted_iota(jnp.int32, (ROWS, LANES), 1))
    real = pos < n_valid
    max_row = jnp.max(jnp.where(real, idx, 0)) // LANES
    n_chunks = jnp.clip((max_row - base) // win_rows + 1, 1, MAX_CHUNKS)

    # statically unrolled chunk walk with runtime pl.when guards (Mosaic
    # cannot legalize a dynamic-bound scf.for carrying vectors); fill
    # doubles as the not-yet-covered marker — gathered values are < 2^24
    # so they can never collide with it
    out_ref[...] = jnp.full((ROWS, LANES), fill, jnp.int32)
    for c in range(MAX_CHUNKS):
        @pl.when(c < n_chunks)
        def _(c=c):
            start = jnp.minimum(base + c * win_rows,
                                max(n_src_rows - win_rows, 0))
            cp = pltpu.make_async_copy(
                src_hbm.at[pl.ds(start, win_rows), :], win_ref, sem)
            cp.start()
            cp.wait()
            o = idx - start * LANES
            ok = (o >= 0) & (o < win_rows * LANES)
            oc = jnp.where(ok, o, 0)
            val = _select(_planes(win_ref[...]), oc >> 7,
                          oc & (LANES - 1))
            prev = out_ref[...]
            out_ref[...] = jnp.where(ok & (prev == fill), val, prev)

    ovf = jnp.sum(jnp.where((out_ref[...] != fill) | ~real, 0, 1),
                  dtype=jnp.int32)

    @pl.when(ovf > 0)
    def _():
        ovf_ref[0, 0] += ovf


@functools.partial(jax.jit, static_argnames=("win_rows", "fill",
                                             "interpret"))
def gather_sorted(src, idx, win_rows: int = 512, fill: int = 0,
                  n_valid=None, interpret: bool = False):
    """``src[idx]`` for a SORTED (ascending) int index array.

    ``src`` is flat (values in [0, 2^24), length a multiple of 128);
    ``idx`` length a multiple of 1024.  Entries whose value lies beyond
    their tile's ``win_rows * 128``-element window are set to ``fill``
    and counted in the returned ``(out, n_overflow)`` — the caller must
    fall back to an exact gather when ``n_overflow > 0``.  Entries at
    flat positions >= ``n_valid`` (clamped padding) are excluded from
    the overflow count (their output is still ``fill`` when out of
    window).  Indices must be in-bounds.
    """
    n = idx.shape[0]
    if n_valid is None:
        n_valid = n
    # small sources: the whole array fits one window
    win_rows = min(win_rows, src.shape[0] // LANES)
    assert n % CHUNK == 0, n
    assert src.shape[0] % LANES == 0
    n_src_rows = src.shape[0] // LANES
    grid = (n // CHUNK,)

    # per-tile window base row: first (smallest) index's row, aligned
    # down to the 8-sublane i32 tile so the dynamic DMA slice is legal
    bases = jnp.minimum((idx[::CHUNK] // LANES) & ~7,
                        max(n_src_rows - win_rows, 0)).astype(jnp.int32)
    # last slot carries n_valid for the padding-aware overflow count
    scal = jnp.concatenate(
        [bases, jnp.asarray(n_valid, jnp.int32).reshape(1)])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda g, b: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, LANES), lambda g, b: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda g, b: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((win_rows, LANES), src.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    out, ovf = pl.pallas_call(
        functools.partial(_gather_kernel, win_rows=win_rows,
                          n_src_rows=n_src_rows, fill=fill),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n // LANES, LANES), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(scal, idx.reshape(n // LANES, LANES),
      src.reshape(n_src_rows, LANES))
    return out.reshape(n), ovf[0, 0]
