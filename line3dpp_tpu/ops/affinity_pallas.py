"""Pallas TPU kernel for the affinity stage's target-estimate gathers.

``affinity_dense`` needs, for every kept match slot (v, s, m), the match
target segment's 3D estimate: 8 features (P1 xyz, P2 xyz, d1, d2) read
from the target view's per-segment tables at ``tgt_seg[v, s, m]``.  As an
XLA advanced-indexing gather this is ~8 x 7.8M random lookups (~0.9 s of
the round-1 device step on a v5e — NEXT.md round-1 item 3).

TPU-native replacement: match slots are neighbor-grouped (M = N*k), so
each (src view, neighbor slot) pair gathers from ONE target view's table.
The kernel runs a grid over (v, g, chunk), holds the 8 x Sp feature-major
table of the target view in VMEM (selected by scalar-prefetched neighbor
ids), and turns the gather into a one-hot matmul on the MXU:

    vals[8, 128] = table[8, Sp] @ onehot(idx)[Sp, 128]

The one-hot dot picks exactly one product per output (values multiplied
by 1.0), so results are bit-exact f32 gathers at MXU throughput.

Reference parity: the gathered values feed the same similarity math as
line3D.cc:1449-1553 (see ops/affinity.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

FEATS = 8
ROW_BLK = 8           # index rows of 128 per grid step (1024 lookups)
LANES = 128


def _kernel(nbr_ref, tab_ref, idx_ref, out_ref, *, sp: int):
    tab = tab_ref[0]                                   # (8, Sp)
    idx = idx_ref[0]                                   # (ROW_BLK, 128)
    iota_s = jax.lax.broadcasted_iota(jnp.int32, (sp, LANES), 0)
    for r in range(ROW_BLK):
        oh = jnp.where(iota_s == idx[r:r + 1, :], 1.0, 0.0)   # (Sp, 128)
        out_ref[:, 0, r, :] = jax.lax.dot_general(
            tab, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)                # (8, 128)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_impl(tables_fm, nbr_ids, idx_rows, interpret: bool = False):
    V, F, Sp = tables_fm.shape               # V = GLOBAL view count
    Vn, N = nbr_ids.shape                    # Vn = local (sharded) views
    _, R, _ = idx_rows.shape                 # (Vn*N, R, 128) index rows
    assert F == FEATS
    assert R % ROW_BLK == 0, R
    rc = R // ROW_BLK
    grid = (Vn, N, rc)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, FEATS, Sp),
                         lambda v, g, c, nbr: (nbr[v, g], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ROW_BLK, LANES),
                         lambda v, g, c, nbr: (v * N + g, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (FEATS, 1, ROW_BLK, LANES),
            lambda v, g, c, nbr: (0, v * N + g, c, 0),
            memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, sp=Sp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((FEATS, Vn * N, R, LANES),
                                       jnp.float32),
        interpret=interpret,
    )(nbr_ids, tables_fm, idx_rows)
    return out


def gather_target_estimates(est_P1, est_P2, est_d1, est_d2, est_valid,
                            neighbor_ids, tgt_seg, knn: int,
                            interpret: bool = False):
    """Gather target-segment estimates for every match slot.

    Inputs are the (V, S[, 3]) estimate tables, (V, N) neighbor ids and the
    neighbor-grouped (V, S, M) target-segment indices (M = N*knn).
    Returns component planes P1b (3x), P2b (3x), d1b, d2b, validb — each
    (V, S, M) — exactly ``table[x][neighbor_ids -> view, tgt_seg]`` with
    invalid target estimates encoded as d1 < 0.
    """
    V, S, M = tgt_seg.shape                  # V = local (source) views
    N = neighbor_ids.shape[1]
    assert M == N * knn
    assert est_d1.shape[1] == S              # global tables, same S

    sp = -(-S // LANES) * LANES
    pad_s = sp - S

    def fm(x):
        return jnp.pad(x, ((0, 0), (0, pad_s)))[:, None, :]

    d1_enc = jnp.where(est_valid, est_d1, -1.0)
    tables = jnp.concatenate(
        [fm(est_P1[..., 0]), fm(est_P1[..., 1]), fm(est_P1[..., 2]),
         fm(est_P2[..., 0]), fm(est_P2[..., 1]), fm(est_P2[..., 2]),
         fm(d1_enc), fm(est_d2)], axis=1)               # (V, 8, Sp)

    # (V, S, M) -> (V, N, S*k) contiguous per pair, padded to row blocks
    grouped = (tgt_seg.reshape(V, S, N, knn)
               .transpose(0, 2, 1, 3).reshape(V, N, S * knn))
    per_pair = S * knn
    rows = -(-per_pair // (ROW_BLK * LANES)) * ROW_BLK
    grouped = jnp.pad(grouped, ((0, 0), (0, 0),
                                (0, rows * LANES - per_pair)))
    out = _gather_impl(tables, neighbor_ids.astype(jnp.int32),
                       grouped.reshape(V * N, rows, LANES),
                       interpret=interpret)             # (8, V*N, rows, 128)

    def back(f):
        x = out[f].reshape(V, N, rows * LANES)[:, :, :per_pair]
        return (x.reshape(V, N, S, knn).transpose(0, 2, 1, 3)
                .reshape(V, S, M))

    P1b = [back(0), back(1), back(2)]
    P2b = [back(3), back(4), back(5)]
    d1b, d2b = back(6), back(7)
    # invalid estimates were encoded as exactly -1.0 (valid depths are always
    # >= 0 by the matcher's depth>0 filter), so decode validity as d1b >= 0:
    # a valid estimate with est_d1 == 0.0 exactly stays valid, matching the
    # XLA gather path which reads est_valid directly.
    return P1b, P2b, jnp.maximum(d1b, 0.0), d2b, d1b >= 0.0
