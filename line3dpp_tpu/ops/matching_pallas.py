"""Pallas TPU kernel for the epipolar matching hot loop.

One fused kernel per (view-pair, source-row-tile) computes the full
[TS, S] tile of epipolar overlaps + triangulation-depth gates and performs
the kNN selection in VMEM — the role the reference's ``K_match_lines`` CUDA
kernel plus host priority-queue epilogue plays (cudawrapper.cu:186-253,
592-650), with the kNN fused instead of staged through HBM.

Layout notes (see ops/matching.py and the lane-padding memory note): all
per-segment 3-vectors are laid out as (P, 3, S) — the lane dimension is the
big segment axis, never the 3-vector — and the kernel outputs (P, k, S)
which the caller reshapes into neighbor-grouped (V, S, N*k) tables.

The grid is (P, S/TS); every program instance:
  1. contracts the source tile's epipolar lines with the target segments'
     homogeneous endpoints/directions (dot_general over the 3-axis),
  2. computes mutual-overlap + positive-depth validity (VPU elementwise),
  3. extracts the k best columns per row by iterative max (k passes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .matching import PairMatches

EPS = 1e-12


def _kernel(e1_ref, e2_ref, rp1_ref, rp2_ref, ns_ref, ntg_ref,
            q1_ref, dq_ref, rq1_ref, rq2_ref,
            num_src_ref, num_tgt_ref, tlen_ref, smask_ref, tmask_ref,
            idx_ref, ov_ref, dp1_ref, dp2_ref, dq1_ref, dq2_ref,
            *, knn: int, epipolar_overlap: float):
    e1 = e1_ref[0]            # (3, TS)
    e2 = e2_ref[0]
    q1 = q1_ref[0]            # (3, S)
    dq = dq_ref[0]

    # K=3 contraction as explicit f32 broadcast sums on the VPU: the MXU
    # rounds through bf16 even under Precision.HIGHEST in Mosaic, and the
    # epipolar parameters are too precision-sensitive for that (marginal
    # matches flip, collapsing downstream scores)
    def dot(a, b):
        return (a[0][:, None] * b[0][None, :]
                + a[1][:, None] * b[1][None, :]
                + a[2][:, None] * b[2][None, :])

    # epipolar intersection parameters along each target segment
    e1q1 = dot(e1, q1)        # (TS, S)
    e1dq = dot(e1, dq)
    e2q1 = dot(e2, q1)
    e2dq = dot(e2, dq)

    zval = (jnp.abs(e1dq) > EPS) & (jnp.abs(e2dq) > EPS)
    t1 = -e1q1 / jnp.where(zval, e1dq, 1.0)
    t2 = -e2q1 / jnp.where(zval, e2dq, 1.0)

    # mutual overlap of {t1, t2, 0, 1} on the target line (line3D.cc:1086-1165)
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    outer = jnp.maximum(hi, 1.0) - jnp.minimum(lo, 0.0)
    inner = jnp.minimum(hi, 1.0) - jnp.maximum(lo, 0.0)
    tlen = tlen_ref[0, 0]      # (S,)
    outer_px = outer * tlen[None, :]
    overlap = jnp.where(
        (inner >= -EPS) & (outer_px >= 1.0) & zval,
        inner / jnp.maximum(outer, EPS), 0.0)

    # plane-ray triangulation depths d = num / den (line3D.cc:1168-1193)
    rp1 = rp1_ref[0]           # (3, TS)
    rp2 = rp2_ref[0]
    ns = ns_ref[0]             # (3, TS) src plane normals
    ntg = ntg_ref[0]           # (3, S)  tgt plane normals
    den_p1 = dot(rp1, ntg)     # (TS, S)
    den_p2 = dot(rp2, ntg)
    den_q1 = dot(ns, rq1_ref[0])
    den_q2 = dot(ns, rq2_ref[0])

    num_s = num_src_ref[0, 0][None, :]  # (1, S) per-target numerators
    num_t = num_tgt_ref[0, 0][:, None]  # (TS, 1) per-source numerators

    def pos(num, den):
        return (jnp.abs(den) > EPS) & (num * den > 0)

    depths_ok = (pos(num_s, den_p1) & pos(num_s, den_p2)
                 & pos(num_t, den_q1) & pos(num_t, den_q2))

    smask = smask_ref[0, 0]    # (TS,)
    tmask = tmask_ref[0, 0]    # (S,)
    valid = ((overlap > epipolar_overlap) & depths_ok
             & (smask[:, None] > 0) & (tmask[None, :] > 0))
    masked = jnp.where(valid, overlap, -1.0)

    safe = lambda x: jnp.where(jnp.abs(x) > EPS, x, EPS)
    d_p1 = num_s / safe(den_p1)
    d_p2 = num_s / safe(den_p2)
    d_q1 = num_t / safe(den_q1)
    d_q2 = num_t / safe(den_q2)

    S = masked.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, masked.shape, 1)
    for j in range(knn):
        m = jnp.max(masked, axis=1)                    # (TS,)
        am = jnp.argmax(masked, axis=1).astype(jnp.int32)
        onehot = col == am[:, None]
        ok_j = m > 0.0
        z = jnp.where(ok_j, 1.0, 0.0)
        pick = lambda d: jnp.sum(jnp.where(onehot, d, 0.0), axis=1) * z
        idx_ref[0, j, :] = jnp.where(ok_j, am, 0)
        ov_ref[0, j, :] = jnp.maximum(m, 0.0) * z
        dp1_ref[0, j, :] = pick(d_p1)
        dp2_ref[0, j, :] = pick(d_p2)
        dq1_ref[0, j, :] = pick(d_q1)
        dq2_ref[0, j, :] = pick(d_q2)
        masked = jnp.where(onehot, -2.0, masked)


@functools.partial(
    jax.jit,
    static_argnames=("epipolar_overlap", "knn", "row_tile", "interpret"),
)
def match_pairs_pallas(
    segments: jnp.ndarray,    # (V, S, 4)
    seg_mask: jnp.ndarray,    # (V, S)
    RtKinv: jnp.ndarray,      # (V, 3, 3)
    C: jnp.ndarray,           # (V, 3)
    src_idx: jnp.ndarray,     # (P,) int32
    tgt_idx: jnp.ndarray,     # (P,) int32
    F: jnp.ndarray,           # (P, 3, 3)
    pair_valid: jnp.ndarray,  # (P,) bool
    epipolar_overlap: float = 0.25,
    knn: int = 10,
    row_tile: int = 128,
    interpret: bool = False,
) -> PairMatches:
    """Same contract as matching.match_pairs_batched, but results arrive in
    (P, k, S) layout (transposed) — use ``transposed=True`` regrouping."""
    V, S, _ = segments.shape
    P = src_idx.shape[0]

    Sp = -(-S // row_tile) * row_tile
    pad = Sp - S

    # (V, 3, S) homogeneous endpoints / directions, lane = segment axis
    ones = jnp.ones((V, 1, S), segments.dtype)
    p1h = jnp.concatenate([segments[..., 0:2].swapaxes(1, 2), ones], axis=1)
    p2h = jnp.concatenate([segments[..., 2:4].swapaxes(1, 2), ones], axis=1)

    # per-segment rays and plane normals (small, (V, 3, S))
    HI = jax.lax.Precision.HIGHEST

    def rays(v_p):
        r = jnp.einsum("vij,vjs->vis", RtKinv, v_p, precision=HI)
        return r / jnp.maximum(
            jnp.sqrt(jnp.sum(r * r, axis=1, keepdims=True)), EPS)

    r1 = rays(p1h)
    r2 = rays(p2h)
    n = jnp.cross(r1, r2, axis=1)
    n = n / jnp.maximum(jnp.sqrt(jnp.sum(n * n, axis=1, keepdims=True)), EPS)

    # gather per-pair tensors
    gs = lambda x: x[src_idx]
    gt = lambda x: x[tgt_idx]
    e1 = jnp.einsum("pij,pjs->pis", F, gs(p1h), precision=HI)  # F p1h
    e2 = jnp.einsum("pij,pjs->pis", F, gs(p2h), precision=HI)
    dqh = gt(p2h) - gt(p1h)

    Cs, Ct = C[src_idx], C[tgt_idx]
    num_src = jnp.einsum("pis,pi->ps", gt(n), Ct - Cs, precision=HI)
    num_tgt = jnp.einsum("pis,pi->ps", gs(n), Cs - Ct, precision=HI)
    seglen = jnp.sqrt(jnp.sum(
        (segments[..., 2:4] - segments[..., 0:2]) ** 2, axis=-1))  # (V, S)
    smask = (seg_mask[src_idx] & pair_valid[:, None]).astype(jnp.float32)
    tmask = seg_mask[tgt_idx].astype(jnp.float32)

    padS = lambda x: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    # per-segment scalar tables as (P, 1, S) so Pallas block shapes satisfy
    # the (sublane, lane) divisibility rules
    one = lambda x: x[:, None, :]
    args = [padS(a) for a in (
        e1, e2, gs(r1), gs(r2), gs(n), gt(n),
        gt(p1h), dqh, gt(r1), gt(r2),
        one(num_src), one(num_tgt), one(gt(seglen)), one(smask), one(tmask),
    )]

    n_tiles = Sp // row_tile
    vec_spec3 = lambda tiled: pl.BlockSpec(
        (1, 3, row_tile if tiled else Sp),
        (lambda p, r: (p, 0, r)) if tiled else (lambda p, r: (p, 0, 0)),
        memory_space=pltpu.VMEM)
    vec_spec1 = lambda tiled: pl.BlockSpec(
        (1, 1, row_tile if tiled else Sp),
        (lambda p, r: (p, 0, r)) if tiled else (lambda p, r: (p, 0, 0)),
        memory_space=pltpu.VMEM)

    in_specs = [
        vec_spec3(True),   # e1
        vec_spec3(True),   # e2
        vec_spec3(True),   # rp1
        vec_spec3(True),   # rp2
        vec_spec3(True),   # n_src
        vec_spec3(False),  # n_tgt
        vec_spec3(False),  # q1h
        vec_spec3(False),  # dqh
        vec_spec3(False),  # rq1
        vec_spec3(False),  # rq2
        vec_spec1(False),  # num_src (per target col)
        vec_spec1(True),   # num_tgt (per source row)
        vec_spec1(False),  # tgt seglen
        vec_spec1(True),   # smask
        vec_spec1(False),  # tmask
    ]
    out_spec = pl.BlockSpec((1, knn, row_tile), lambda p, r: (p, 0, r),
                            memory_space=pltpu.VMEM)
    out_shape = [
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.int32),
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.float32),
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.float32),
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.float32),
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.float32),
        jax.ShapeDtypeStruct((P, knn, Sp), jnp.float32),
    ]

    kern = functools.partial(_kernel, knn=knn,
                             epipolar_overlap=epipolar_overlap)
    idx, ov, dp1, dp2, dq1, dq2 = pl.pallas_call(
        kern,
        grid=(P, n_tiles),
        in_specs=in_specs,
        out_specs=[out_spec] * 6,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)

    cut = lambda x: x[:, :, :S]
    ov = cut(ov)
    return PairMatches(
        tgt_seg=cut(idx), overlap=ov,
        d_p1=cut(dp1), d_p2=cut(dp2), d_q1=cut(dq1), d_q2=cut(dq2),
        valid=ov > 0.0,
    )
