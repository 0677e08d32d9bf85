"""Pallas TPU kernel for match scoring (3D hypothesis verification).

Fuses the whole per-segment [M, M] similarity tile — hypothesis endpoints,
pairwise angle/position similarities, per-camera max, cross-camera sum
(reference: K_score_matches cudawrapper.cu:256-367) — in VMEM.  The XLA path
(ops/scoring.py) materializes [chunk, M, M] intermediates through HBM; here
traffic is O(S*M) per view.

Grid: (V, S/Bt).  Every program handles Bt segments of one view, so the
per-view camera tables (target centers/regularizers per match slot) load as
single rows.  All 3-vectors arrive as separate component planes (see the
lane-padding note in ops/matching.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .scoring import ScoredMatches, PI_1_32
import math

EPS = 1e-12
# cos(pi/32): the orientation window ang in (pi/32, 31pi/32) is equivalent
# to |cos| < cos(pi/32) — no arccos needed (acos has no Pallas TPU lowering)
COS_PI_1_32 = math.cos(PI_1_32)


def _acos_approx(x):
    """arccos on [0, 1] via the Abramowitz-Stegun 4-term polynomial
    (max error 6.7e-5 rad); Pallas TPU has no acos primitive."""
    return jnp.sqrt(jnp.maximum(1.0 - x, 0.0)) * (
        1.5707288 + x * (-0.2121144 + x * (0.0742610 - 0.0187293 * x)))


def pick_seg_tile(N: int, M: int, knn: int) -> int:
    """Segment tile keeping the kernel's VMEM working set under budget.

    The unrolled per-group loop keeps ~n_groups * 6 * (Bt, M, k) buffers
    live on the VMEM stack (the N-dependent budget term), AND the per-tile
    working set scales with tile * M.  Measured against the 16 MB scoped
    limit: tile=40/M=90/N=9 (scene2) OOMs at 16.61 MB while
    tile=32/M=100/N=10 fits and tile=16/M=160/N=16 OOMs at 23.91 MB — so
    BOTH terms bind: keep the historical N-scaled budget and additionally
    cap tile * M at 3200 (the largest proven-fitting product).  Returns
    < 8 when even the smallest legal tile would overflow (callers then
    fall back to the XLA path)."""
    budget = 2_000_000 // max(N * 6 * M * knn, 1)
    return min(64, (budget // 8) * 8, ((3200 // max(M, 1)) // 8) * 8)


def _kernel(d1_ref, d2_ref, valid_ref,
            r1_refs, r2_refs, rm_refs,     # each: 3 refs (1, 1, Bt)
            C_ref, kv_ref,                 # (1, 1, 3), (1, 1, 1)
            tC_refs, tk_ref,               # 3x (1, 1, M), (1, 1, M)
            score_ref, ok_ref,
            *, knn: int, n_groups: int, two_sig_a_sqr: float,
            min_similarity: float, check_orientation: bool):
    d1 = d1_ref[0]             # (Bt, M)
    d2 = d2_ref[0]
    mvalid = valid_ref[0] > 0
    Bt, M = d1.shape

    Cv = [C_ref[0, 0, i] for i in range(3)]          # scalars
    kv = kv_ref[0, 0, 0]
    r1 = [r[0] for r in r1_refs]                     # (Bt, 1) each
    r2 = [r[0] for r in r2_refs]
    rm = [r[0] for r in rm_refs]
    tC = [r[0, 0][None, :] for r in tC_refs]         # (1, M) each
    tk = tk_ref[0, 0][None, :]

    # hypothesis endpoints and directions, component planes (Bt, M)
    P1 = [Cv[i] + r1[i] * d1 for i in range(3)]
    P2 = [Cv[i] + r2[i] * d2 for i in range(3)]
    dv = [p2 - p1 for p1, p2 in zip(P1, P2)]
    length = jnp.sqrt(sum(c * c for c in dv))
    inv_len = 1.0 / jnp.maximum(length, EPS)
    dirc = [c * inv_len for c in dv]
    ok = mvalid & (length > EPS)

    if check_orientation:
        dot = jnp.clip(sum(rm[i] * dirc[i] for i in range(3)), -1.0, 1.0)
        ok = ok & (jnp.abs(dot) < COS_PI_1_32)

    # regularizers (line3D.cc:1235-1248)
    sig1 = d1 * kv
    sig2 = d2 * kv
    sig1t = jnp.sqrt(sum((p - c) ** 2 for p, c in zip(P1, tC))) * tk
    sig2t = jnp.sqrt(sum((p - c) ** 2 for p, c in zip(P2, tC))) * tk
    reg1 = sig1 * sig1 + sig1t * sig1t
    reg2 = sig2 * sig2 + sig2t * sig2t

    # pairwise similarities, one neighbor group of m' at a time: the full
    # (Bt, M, M) tile overflows the remote Mosaic compiler; (Bt, M, k)
    # slices keep intermediates tiny and the per-camera max falls out of
    # the loop (reference semantics: per-camera max of
    # min(sim_angle, sim_pos) summed over *other* cameras,
    # line3D.cc:1250-1275).  |dot| folds the angle to [0, 90] directly.
    okf = ok.astype(jnp.float32)
    inv_reg1 = 1.0 / jnp.maximum(reg1, EPS)
    inv_reg2 = 1.0 / jnp.maximum(reg2, EPS)
    own_group = jax.lax.broadcasted_iota(jnp.int32, (Bt, M), 1) // knn
    score = jnp.zeros((Bt, M), jnp.float32)
    deg = 180.0 / math.pi
    for g in range(n_groups):
        lo, hi = g * knn, (g + 1) * knn
        d1g = d1[:, lo:hi]                    # (Bt, k)
        d2g = d2[:, lo:hi]
        okg = okf[:, lo:hi]
        dot = jnp.clip(jnp.abs(sum(
            c[:, :, None] * c[:, lo:hi][:, None, :] for c in dirc)),
            0.0, 1.0)
        ang_deg = _acos_approx(dot) * deg
        sim_a = jnp.exp(-ang_deg * ang_deg / two_sig_a_sqr)

        dd1 = d1[:, :, None] - d1g[:, None, :]
        dd2 = d2[:, :, None] - d2g[:, None, :]
        sim_p = jnp.minimum(
            jnp.exp(-dd1 * dd1 * inv_reg1[:, :, None]),
            jnp.exp(-dd2 * dd2 * inv_reg2[:, :, None]),
        )
        sim = jnp.minimum(sim_a, sim_p)
        sim = jnp.where(sim > min_similarity, sim, 0.0)
        sim = sim * okf[:, :, None] * okg[:, None, :]
        maxg = jnp.max(sim, axis=-1)          # per-camera max (Bt, M)
        score = score + jnp.where(own_group == g, 0.0, maxg)

    score_ref[0] = score * okf
    ok_ref[0] = okf


@functools.partial(
    jax.jit,
    static_argnames=("knn", "two_sig_a_sqr", "min_similarity",
                     "check_orientation", "seg_tile", "interpret"),
)
def score_matches_pallas(
    r1: jnp.ndarray,            # (V, S, 3)
    r2: jnp.ndarray,            # (V, S, 3)
    rmid: jnp.ndarray,          # (V, S, 3)
    C: jnp.ndarray,             # (V, 3)
    k_reg: jnp.ndarray,         # (V,)
    neighbor_ids: jnp.ndarray,  # (V, N) int32 (global ids OK)
    d_p1: jnp.ndarray,          # (V, S, M)
    d_p2: jnp.ndarray,          # (V, S, M)
    valid: jnp.ndarray,         # (V, S, M) bool
    knn: int,
    two_sig_a_sqr: float,
    min_similarity: float = 0.5,
    check_orientation: bool = True,
    seg_tile: int = 0,
    interpret: bool = False,
    C_table: jnp.ndarray | None = None,
    k_table: jnp.ndarray | None = None,
) -> ScoredMatches:
    V, S, M = d_p1.shape
    N = neighbor_ids.shape[1]
    assert M == N * knn
    if seg_tile <= 0:
        seg_tile = pick_seg_tile(N, M, knn)
        if seg_tile < 8:
            raise ValueError(
                f"match table too large for the Pallas scoring kernel "
                f"(N={N}, M={M}, k={knn}); use the XLA scoring path")

    if C_table is None:
        C_table = C
    if k_table is None:
        k_table = k_reg

    Sp = -(-S // seg_tile) * seg_tile
    padS = Sp - S

    # per-(view, match-slot) target camera tables (tiny)
    tC = C_table[neighbor_ids]            # (V, N, 3)
    tk = k_table[neighbor_ids]            # (V, N)
    tCm = jnp.repeat(tC, knn, axis=1)     # (V, M, 3)
    tkm = jnp.repeat(tk, knn, axis=1)     # (V, M)

    pad2 = lambda x: jnp.pad(x, ((0, 0), (0, padS), (0, 0)))
    padm = lambda x: jnp.pad(x, ((0, 0), (0, padS)))
    d1p = pad2(d_p1)
    d2p = pad2(d_p2)
    vp = pad2(valid.astype(jnp.float32))

    rays = []
    for arr in (r1, r2, rmid):
        for i in range(3):
            rays.append(padm(arr[..., i])[:, :, None])    # (V, Sp, 1)

    args = [d1p, d2p, vp] + rays + [
        C[:, None, :],                    # (V, 1, 3)
        k_reg[:, None, None],             # (V, 1, 1)
        tCm[..., 0][:, None, :], tCm[..., 1][:, None, :],
        tCm[..., 2][:, None, :],          # (V, 1, M)
        tkm[:, None, :],                  # (V, 1, M)
    ]

    n_tiles = Sp // seg_tile
    spec_sm = pl.BlockSpec((1, seg_tile, M), lambda v, t: (v, t, 0),
                           memory_space=pltpu.VMEM)
    spec_ray = pl.BlockSpec((1, seg_tile, 1), lambda v, t: (v, t, 0),
                            memory_space=pltpu.VMEM)
    spec_c3 = pl.BlockSpec((1, 1, 3), lambda v, t: (v, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_c1 = pl.BlockSpec((1, 1, 1), lambda v, t: (v, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((1, 1, M), lambda v, t: (v, 0, 0),
                          memory_space=pltpu.VMEM)
    in_specs = ([spec_sm] * 3 + [spec_ray] * 9 + [spec_c3, spec_c1]
                + [spec_m] * 4)
    out_spec = pl.BlockSpec((1, seg_tile, M), lambda v, t: (v, t, 0),
                            memory_space=pltpu.VMEM)

    def kern(d1_ref, d2_ref, valid_ref,
             a1, a2, a3, b1, b2, b3, c1, c2, c3,
             C_ref, kv_ref, t1, t2, t3, tk_ref,
             score_ref, ok_ref):
        _kernel(d1_ref, d2_ref, valid_ref,
                (a1, a2, a3), (b1, b2, b3), (c1, c2, c3),
                C_ref, kv_ref, (t1, t2, t3), tk_ref,
                score_ref, ok_ref,
                knn=knn, n_groups=N, two_sig_a_sqr=two_sig_a_sqr,
                min_similarity=min_similarity,
                check_orientation=check_orientation)

    score, okf = pl.pallas_call(
        kern,
        grid=(V, n_tiles),
        in_specs=in_specs,
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((V, Sp, M), jnp.float32),
            jax.ShapeDtypeStruct((V, Sp, M), jnp.float32),
        ],
        interpret=interpret,
    )(*args)

    return ScoredMatches(score3d=score[:, :S], valid=okf[:, :S] > 0)
