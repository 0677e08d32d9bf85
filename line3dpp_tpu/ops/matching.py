"""Pairwise epipolar line matching — the pipeline's hottest kernel.

For a view pair (src, tgt) and every segment pair (r, c) this computes the
mutual epipolar overlap and the plane-ray triangulation depths, then keeps the
k best matches per source segment (reference: matchingCPU line3D.cc:900-1015,
K_match_lines cudawrapper.cu:186-253, kNN selection cudawrapper.cu:592-650).

TPU-first design
----------------
Instead of the reference's per-pair kernel launches over ragged lists, view
pairs are batched on a leading axis P with fixed segment capacity S:

* Epipolar intersections are computed in *line-parameter space*: the
  intersection of epipolar line ``e`` with the target segment
  ``q(t) = q1 + t (q2 - q1)`` is ``t = -(e . q1h) / (e . dqh)``.  Both dot
  products over all (r, c) are [S,3]x[3,S] matmuls -> MXU.
* All four collinear points of the reference's ``mutualOverlap``
  (line3D.cc:1086-1165) live on the target line, so the overlap reduces to
  interval arithmetic on (0, 1, t1, t2) — no 2D distances needed.
* Triangulation depths d = n.(C2-C1) / (n.ray) (line3D.cc:1168-1193) are
  again thin matmuls; only their *signs* gate kNN selection, the actual
  depth values are re-computed after top-k on the [S,k] winners.
* kNN via ``jax.lax.top_k`` on the masked overlap row (replaces the host
  priority queue of cudawrapper.cu:598-645).

Everything is float32; the scene must be median-centered by the caller
(line3D.cc:500-536 does the same before matching).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# geometry matmuls are K=3 contractions: full f32 accumulation costs nothing
# and is required (TPU default matmul precision is bf16, which loses ~1e-2
# on epipolar intersection parameters)
HI = jax.lax.Precision.HIGHEST


def _mm(a, b):
    return jnp.matmul(a, b, precision=HI)

from . import geometry as geo

EPS = 1e-12


class PairMatches(NamedTuple):
    """k best matches per (pair, src segment).

    Depths are four separate (P, S, k) arrays, NOT one (P, S, k, 4) tensor:
    a trailing dim of 4 would be lane-padded to 128 on TPU (32x memory
    expansion on the biggest intermediate of the whole pipeline).
    """

    tgt_seg: jnp.ndarray    # (P, S, k) int32 target segment index
    overlap: jnp.ndarray    # (P, S, k) f32 epipolar overlap score
    d_p1: jnp.ndarray       # (P, S, k) f32 src endpoint-1 depth
    d_p2: jnp.ndarray       # (P, S, k) f32 src endpoint-2 depth
    d_q1: jnp.ndarray       # (P, S, k) f32 tgt endpoint-1 depth
    d_q2: jnp.ndarray       # (P, S, k) f32 tgt endpoint-2 depth
    valid: jnp.ndarray      # (P, S, k) bool


def _seg_line_quantities(segs: jnp.ndarray, RtKinv: jnp.ndarray):
    """Per-segment precomputation: endpoint rays + segment plane normal.

    segs: (S,4), RtKinv: (3,3) -> rays (S,3)x2, plane normal (S,3).
    The plane normal spans the camera center and both endpoint rays
    (reference: line3D.cc:1182-1185).
    """
    r1, r2 = geo.segment_rays(RtKinv, segs)
    n = jnp.cross(r1, r2)
    n = geo.normalize(n)
    return r1, r2, n


def match_pair(
    src_segs: jnp.ndarray,   # (S, 4)
    src_mask: jnp.ndarray,   # (S,)
    tgt_segs: jnp.ndarray,   # (S, 4)
    tgt_mask: jnp.ndarray,   # (S,)
    F: jnp.ndarray,          # (3, 3) fundamental src->tgt
    src_RtKinv: jnp.ndarray,  # (3, 3)
    tgt_RtKinv: jnp.ndarray,  # (3, 3)
    src_C: jnp.ndarray,      # (3,)
    tgt_C: jnp.ndarray,      # (3,)
    epipolar_overlap: float,
    knn: int,
) -> PairMatches:
    """Match all source segments of one view pair.  vmap over pairs."""
    S = src_segs.shape[0]

    p1h = jnp.concatenate([src_segs[:, 0:2], jnp.ones((S, 1), src_segs.dtype)], axis=1)
    p2h = jnp.concatenate([src_segs[:, 2:4], jnp.ones((S, 1), src_segs.dtype)], axis=1)
    q1h = jnp.concatenate([tgt_segs[:, 0:2], jnp.ones((S, 1), tgt_segs.dtype)], axis=1)
    q2h = jnp.concatenate([tgt_segs[:, 2:4], jnp.ones((S, 1), tgt_segs.dtype)], axis=1)

    # epipolar lines of src endpoints in the tgt image (line3D.cc:925-926)
    e1 = _mm(p1h, F.T)                       # (S, 3)
    e2 = _mm(p2h, F.T)

    # intersection parameters along the tgt segment:  t = -(e.q1h)/(e.dqh)
    dqh = q2h - q1h                      # z-component = 0
    e1q1 = _mm(e1, q1h.T)                    # (S_src, S_tgt)  MXU
    e1dq = _mm(e1, dqh.T)
    e2q1 = _mm(e2, q1h.T)
    e2dq = _mm(e2, dqh.T)

    # |e.dq| ~ 0 <=> epipolar line parallel to tgt line (x.z check,
    # line3D.cc:944)
    zval = (jnp.abs(e1dq) > EPS) & (jnp.abs(e2dq) > EPS)
    t1 = -e1q1 / jnp.where(zval, e1dq, 1.0)
    t2 = -e2q1 / jnp.where(zval, e2dq, 1.0)

    # mutual overlap of the 4 collinear points {t1, t2, 0, 1} on the tgt line
    # (line3D.cc:1086-1165), scaled to pixels by the tgt segment length.
    tgt_len = jnp.linalg.norm(tgt_segs[:, 2:4] - tgt_segs[:, 0:2], axis=1)  # (S,)
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    t_min = jnp.minimum(lo, 0.0)
    t_max = jnp.maximum(hi, 1.0)
    outer = t_max - t_min
    inner = jnp.minimum(hi, 1.0) - jnp.maximum(lo, 0.0)
    # segments must overlap (touching counts: pointOnSegment <= eps,
    # line3D.cc:1077-1083)
    overlapping = inner >= -EPS
    outer_px = outer * tgt_len[None, :]
    overlap = jnp.where(
        overlapping & (outer_px >= 1.0) & zval,
        inner / jnp.maximum(outer, EPS),
        0.0,
    )

    # triangulation depth *signs* (values recomputed post-top-k):
    # d = n.(C_other - C_own) / (n.ray)   (line3D.cc:1168-1193)
    r_p1, r_p2, n_src = _seg_line_quantities(src_segs, src_RtKinv)
    r_q1, r_q2, n_tgt = _seg_line_quantities(tgt_segs, tgt_RtKinv)

    num_src = _mm(n_tgt, tgt_C - src_C)    # (S_tgt,)
    den_p1 = _mm(r_p1, n_tgt.T)              # (S_src, S_tgt)  MXU
    den_p2 = _mm(r_p2, n_tgt.T)
    num_tgt = _mm(n_src, src_C - tgt_C)    # (S_src,)
    den_q1 = _mm(n_src, r_q1.T)              # (S_src, S_tgt)
    den_q2 = _mm(n_src, r_q2.T)

    def _pos(num, den):
        # depth = num/den > eps, with |den| > eps guard (line3D.cc:1187-1191)
        return (jnp.abs(den) > EPS) & (num * den > 0)

    depths_ok = (
        _pos(num_src[None, :], den_p1)
        & _pos(num_src[None, :], den_p2)
        & _pos(num_tgt[:, None], den_q1)
        & _pos(num_tgt[:, None], den_q2)
    )

    valid = (
        (overlap > epipolar_overlap)
        & depths_ok
        & src_mask[:, None]
        & tgt_mask[None, :]
    )
    overlap_masked = jnp.where(valid, overlap, -1.0)

    # kNN selection by overlap (max-heap semantics of commons.h:217-228)
    top_overlap, top_idx = jax.lax.top_k(overlap_masked, knn)   # (S, k)
    top_valid = top_overlap > 0.0

    # recompute depths only for the winners
    sel_num_src = num_src[top_idx]                  # (S, k)
    sel_n_tgt = n_tgt[top_idx]                      # (S, k, 3)
    d_p1 = sel_num_src / _safe(jnp.einsum("skj,sj->sk", sel_n_tgt, r_p1, precision=HI))
    d_p2 = sel_num_src / _safe(jnp.einsum("skj,sj->sk", sel_n_tgt, r_p2, precision=HI))
    d_q1 = num_tgt[:, None] / _safe(jnp.einsum("sj,skj->sk", n_src, r_q1[top_idx], precision=HI))
    d_q2 = num_tgt[:, None] / _safe(jnp.einsum("sj,skj->sk", n_src, r_q2[top_idx], precision=HI))

    z = jnp.where(top_valid, 1.0, 0.0)
    return PairMatches(
        tgt_seg=top_idx.astype(jnp.int32),
        overlap=jnp.where(top_valid, top_overlap, 0.0),
        d_p1=d_p1 * z, d_p2=d_p2 * z, d_q1=d_q1 * z, d_q2=d_q2 * z,
        valid=top_valid,
    )


def _safe(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.abs(x) > EPS, x, EPS)


def match_pairs_chunked(
    segments: jnp.ndarray,    # (V, S, 4)
    seg_mask: jnp.ndarray,    # (V, S)
    RtKinv: jnp.ndarray,      # (V, 3, 3)
    C: jnp.ndarray,           # (V, 3)
    src_idx: jnp.ndarray,     # (P,) int32
    tgt_idx: jnp.ndarray,     # (P,) int32
    F: jnp.ndarray,           # (P, 3, 3)
    pair_valid: jnp.ndarray,  # (P,) bool
    epipolar_overlap: float,
    knn: int,
    chunk: int = 8,
) -> PairMatches:
    """Like :func:`match_pairs_batched` but processes the pair axis in
    fixed-size chunks under ``lax.map`` so the (chunk, S, S) intermediates
    bound HBM use — the TPU equivalent of the reference's 3072-row GPU buffer
    tiling (cudawrapper.cu:570-586, cudawrapper.h:46-47)."""
    P = src_idx.shape[0]
    pad = (-P) % chunk
    if pad:
        padz = lambda x: jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
        src_idx, tgt_idx, F = padz(src_idx), padz(tgt_idx), padz(F)
        pair_valid = jnp.concatenate([pair_valid, jnp.zeros(pad, bool)])

    n_chunks = (P + pad) // chunk
    reshape = lambda x: x.reshape(n_chunks, chunk, *x.shape[1:])
    args = (reshape(src_idx), reshape(tgt_idx), reshape(F), reshape(pair_valid))

    out = jax.lax.map(
        lambda a: match_pairs_batched(
            segments, seg_mask, RtKinv, C, *a, epipolar_overlap, knn),
        args,
    )
    unpad = lambda x: x.reshape(n_chunks * chunk, *x.shape[2:])[:P]
    return PairMatches(*(unpad(x) for x in out))


def match_pairs_batched(
    segments: jnp.ndarray,    # (V, S, 4)
    seg_mask: jnp.ndarray,    # (V, S)
    RtKinv: jnp.ndarray,      # (V, 3, 3)
    C: jnp.ndarray,           # (V, 3)
    src_idx: jnp.ndarray,     # (P,) int32
    tgt_idx: jnp.ndarray,     # (P,) int32
    F: jnp.ndarray,           # (P, 3, 3)
    pair_valid: jnp.ndarray,  # (P,) bool — padding pairs contribute nothing
    epipolar_overlap: float,
    knn: int,
) -> PairMatches:
    """Batched matching over a pair list.  The caller chunks P to bound memory."""

    def one(src, tgt, Fp, pvalid):
        res = match_pair(
            segments[src], seg_mask[src] & pvalid,
            segments[tgt], seg_mask[tgt],
            Fp, RtKinv[src], RtKinv[tgt], C[src], C[tgt],
            epipolar_overlap, knn,
        )
        return res

    return jax.vmap(one)(src_idx, tgt_idx, F, pair_valid)
