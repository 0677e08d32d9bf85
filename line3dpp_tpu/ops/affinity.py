"""Match filtering, best-hypothesis selection, and affinity edge computation.

Filtering (reference: filterMatches line3D.cc:1586-1669): matches must score
at least 10% of the view's best score; the best match per segment (if above
0.75) becomes that segment's *estimated 3D position*, and the median of the
kept best-match depths becomes the view's regularization depth.

Affinity (reference: computingAffinityMatrix line3D.cc:1852-1979 and
similarity line3D.cc:1449-1553): for every segment with an estimate and every
of its kept matches whose target segment also has an estimate, a symmetric
similarity of the two 3D hypotheses (angle + mutual point-to-line distances
with depth-cutoff regularizers) yields a sparse edge when > 0.5.

TPU-first design: everything is a dense masked [V, S, M] computation; edges
are extracted on the host from the returned weight/mask tensors (the
downstream union-find is sequential anyway, SURVEY.md §7.1).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

EPS = 1e-12


class FilteredMatches(NamedTuple):
    kept: jnp.ndarray         # (V, S, M) bool — survives the 10%-of-max cut
    est_valid: jnp.ndarray    # (V, S) bool — best score > 0.75
    est_P1: jnp.ndarray       # (V, S, 3) hypothesis endpoints
    est_P2: jnp.ndarray       # (V, S, 3)
    est_d1: jnp.ndarray       # (V, S) best-match depth 1
    est_d2: jnp.ndarray       # (V, S) best-match depth 2
    max_score: jnp.ndarray    # (V,)


def filter_matches(
    r1: jnp.ndarray,          # (V, S, 3)
    r2: jnp.ndarray,          # (V, S, 3)
    C: jnp.ndarray,           # (V, 3)
    score3d: jnp.ndarray,     # (V, S, M)
    valid: jnp.ndarray,       # (V, S, M)
    d_p1: jnp.ndarray,        # (V, S, M)
    d_p2: jnp.ndarray,        # (V, S, M)
    min_best_score: float = 0.75,
    min_best_score_perc: float = 0.10,
) -> FilteredMatches:
    score = jnp.where(valid, score3d, 0.0)
    max_score = jnp.max(score, axis=(1, 2))                      # (V,)
    lim = (min_best_score_perc * max_score)[:, None, None]
    kept = valid & (score > 0.0) & (score > lim)

    best_slot = jnp.argmax(jnp.where(kept, score, 0.0), axis=-1)  # (V, S)
    best_score = jnp.take_along_axis(score, best_slot[..., None], axis=-1)[..., 0]
    est_valid = kept.any(-1) & (best_score > min_best_score)

    # segments whose best match is not good enough lose ALL their matches
    # (line3D.cc:1648-1652)
    kept = kept & est_valid[..., None]

    bd1 = jnp.take_along_axis(d_p1, best_slot[..., None], axis=-1)[..., 0]
    bd2 = jnp.take_along_axis(d_p2, best_slot[..., None], axis=-1)[..., 0]
    est_P1 = C[:, None, :] + r1 * bd1[..., None]
    est_P2 = C[:, None, :] + r2 * bd2[..., None]

    return FilteredMatches(
        kept=kept,
        est_valid=est_valid,
        est_P1=est_P1,
        est_P2=est_P2,
        est_d1=bd1,
        est_d2=bd2,
        max_score=max_score,
    )


def count_edges(edge_valid: jnp.ndarray) -> int:
    """Number of valid affinity edges (single-scalar device->host read)."""
    return int(jnp.sum(edge_valid))


def compaction_capacity(n: int, floor: int = 65536) -> int:
    """Round a compaction size up to a power-of-4 bucket (floor 64k): every
    distinct capacity is a fresh jit executable, and remote compiles cost
    minutes — coarse buckets keep the variants rare across blocks/runs."""
    n = max(n, 1)
    cap = 1 << (-(-((n - 1).bit_length()) // 2) * 2)
    return max(cap, floor)


def _compact_impl(weight, edge_valid, tgt_view, tgt_seg, size):
    flat_valid = edge_valid.reshape(-1)
    idx = jnp.nonzero(flat_valid, size=size, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.maximum(idx, 0)
    return (
        idx,
        ok,
        weight.reshape(-1)[safe],
        tgt_view.reshape(-1)[safe],
        tgt_seg.reshape(-1)[safe],
    )


_compact_edges_jit = jax.jit(_compact_impl, static_argnames=("size",))


def compact_edges(aff: "AffinityDense", size: int):
    """Device-side compaction of the dense [V, S, M] edge tensors into flat
    arrays of at most ``size`` edges — transfers O(E) instead of O(V*S*M)
    host<->device traffic (the dense pull dominates the reconstruct phase on
    slow interconnects otherwise).

    Returns (flat_index, valid, weight, tgt_view, tgt_seg) host arrays.
    """
    return tuple(np.asarray(x) for x in _compact_edges_jit(
        aff.weight, aff.edge_valid, aff.tgt_view, aff.tgt_seg, size))


def _compact_kept_impl(kept, tgt_seg, size):
    flat = kept.reshape(-1)
    idx = jnp.nonzero(flat, size=size, fill_value=-1)[0]
    ok = idx >= 0
    safe = jnp.maximum(idx, 0)
    return idx, ok, tgt_seg.reshape(-1)[safe]


_compact_kept_jit = jax.jit(_compact_kept_impl, static_argnames=("size",))


def compact_kept(kept: jnp.ndarray, tgt_seg: jnp.ndarray, size: int):
    """Device-side compaction of kept matches: flat indices into the
    [Vb, S, M] block plus each match's target segment (host arrays)."""
    return tuple(np.asarray(x) for x in _compact_kept_jit(kept, tgt_seg, size))


@jax.jit
def affinity_edges_flat(
    est_P1, est_P2, est_d1, est_d2, est_valid,   # (V, S, ...) global tables
    src_v, src_s, tgt_v, tgt_s, edge_ok,         # (E,) flat edges
    k_reg, median_depth,                          # (V,)
    med_scene, two_sig_a_sqr, min_affinity,
):
    """Edge-wise affinity similarity over a flat candidate-edge list — the
    O(E) formulation of :func:`affinity_dense` used by the blocked
    large-scene path (same math: line3D.cc:1449-1553).  Pad E as needed."""
    g = lambda T, v, s: T[v, s]
    P1a = [g(est_P1[..., i], src_v, src_s) for i in range(3)]   # (E,)
    P2a = [g(est_P2[..., i], src_v, src_s) for i in range(3)]
    P1b = [g(est_P1[..., i], tgt_v, tgt_s) for i in range(3)]
    P2b = [g(est_P2[..., i], tgt_v, tgt_s) for i in range(3)]
    d1a = g(est_d1, src_v, src_s)
    d2a = g(est_d2, src_v, src_s)
    d1b = g(est_d1, tgt_v, tgt_s)
    d2b = g(est_d2, tgt_v, tgt_s)
    va = g(est_valid, src_v, src_s)
    vb = g(est_valid, tgt_v, tgt_s)

    dva = [q - p for p, q in zip(P1a, P2a)]
    lena = jnp.sqrt(sum(c * c for c in dva))
    dira = [c / jnp.maximum(lena, EPS) for c in dva]
    dvb = [q - p for p, q in zip(P1b, P2b)]
    lenb = jnp.sqrt(sum(c * c for c in dvb))
    dirb = [c / jnp.maximum(lenb, EPS) for c in dvb]

    ok = edge_ok & va & vb & (lena > EPS) & (lenb > EPS)

    dot = jnp.clip(jnp.abs(sum(a * b for a, b in zip(dira, dirb))), 0.0, 1.0)
    ang = jnp.degrees(jnp.arccos(dot))
    sim_a = jnp.exp(-ang * ang / two_sig_a_sqr)

    med_scene = jnp.asarray(med_scene, jnp.float32)
    scene_cut = jnp.where(med_scene > EPS, med_scene, jnp.inf)
    cut_a = jnp.minimum(median_depth[src_v], scene_cut)
    cut_b = jnp.minimum(median_depth[tgt_v], scene_cut)
    k_a = k_reg[src_v]
    k_b = k_reg[tgt_v]
    sig11 = jnp.minimum(d1a, cut_a) * k_a
    sig12 = jnp.minimum(d2a, cut_a) * k_a
    sig21 = jnp.minimum(d1b, cut_b) * k_b
    sig22 = jnp.minimum(d2b, cut_b) * k_b

    def p2l(P, L0, Ld):
        w = [p - l0 for p, l0 in zip(P, L0)]
        w2 = sum(c * c for c in w)
        proj = sum(c * d for c, d in zip(w, Ld))
        return jnp.sqrt(jnp.maximum(w2 - proj * proj, 0.0))

    d11 = p2l(P1a, P1b, dirb)
    d12 = p2l(P2a, P1b, dirb)
    d21 = p2l(P1b, P1a, dira)
    d22 = p2l(P2b, P1a, dira)

    expf = lambda d, sig: jnp.exp(-d * d / jnp.maximum(2.0 * sig * sig, EPS))
    sim_p1 = jnp.minimum(expf(d11, sig11), expf(d12, sig12))
    sim_p2 = jnp.minimum(expf(d21, sig21), expf(d22, sig22))
    sim = jnp.minimum(sim_a, jnp.minimum(sim_p1, sim_p2))

    valid = ok & (sim > min_affinity)
    return jnp.where(valid, sim, 0.0), valid


class AffinityDense(NamedTuple):
    weight: jnp.ndarray       # (V, S, M) f32 similarity of (seg, match-target)
    edge_valid: jnp.ndarray   # (V, S, M) bool
    tgt_view: jnp.ndarray     # (V, S, M) int32 global view idx of the target
    tgt_seg: jnp.ndarray      # (V, S, M) int32


def affinity_dense(
    fm: FilteredMatches,
    tgt_seg: jnp.ndarray,       # (V, S, M) int32 — per-match target segment
    neighbor_ids: jnp.ndarray,  # (V, N) int32 — group g target view
    k_reg: jnp.ndarray,         # (V,)
    median_depth: jnp.ndarray,  # (V,) per-view regularization depth
    med_scene_depth_lines: float,
    two_sig_a_sqr: float,
    min_affinity: float = 0.5,
    tgt_est: FilteredMatches | None = None,
    k_table: jnp.ndarray | None = None,
    median_depth_table: jnp.ndarray | None = None,
    use_pallas: bool = False,
    pallas_interpret: bool = False,
) -> AffinityDense:
    """Similarity of each (segment-estimate, match-target-estimate) pair
    (reference: line3D.cc:1449-1553, called from 1873-1899).

    When the view axis is sharded, ``fm``/``tgt_seg``/``neighbor_ids`` are the
    local shard while ``tgt_est``/``k_table``/``median_depth_table`` are the
    all-gathered global tables that resolve the (global) target view indices;
    they default to the local arrays in the unsharded case."""
    V, S, M = tgt_seg.shape
    N = neighbor_ids.shape[1]
    k = M // N

    if tgt_est is None:
        tgt_est = fm
    if k_table is None:
        k_table = k_reg
    if median_depth_table is None:
        median_depth_table = median_depth

    tview = jnp.repeat(neighbor_ids, k, axis=1)[:, None, :]     # (V, 1, M)
    tview = jnp.broadcast_to(tview, (V, S, M))

    # gather the target segments' estimates.  All 3-vectors are handled as
    # separate x/y/z (V, S, M) component arrays: a (V, S, M, 3) layout would
    # be lane-padded 3 -> 128 on TPU and dominate HBM.
    if use_pallas:
        # one-hot MXU gather over per-neighbor-view tables — replaces ~8
        # random 7.8M-element XLA gathers (ops/affinity_pallas.py)
        from . import affinity_pallas

        P1b, P2b, d1b, d2b, validb = \
            affinity_pallas.gather_target_estimates(
                tgt_est.est_P1, tgt_est.est_P2, tgt_est.est_d1,
                tgt_est.est_d2, tgt_est.est_valid, neighbor_ids, tgt_seg, k,
                interpret=pallas_interpret)
    else:
        g = lambda x: x[tview, tgt_seg]                         # adv. indexing
        P1b = [g(tgt_est.est_P1[..., i]) for i in range(3)]     # 3x (V, S, M)
        P2b = [g(tgt_est.est_P2[..., i]) for i in range(3)]
        d1b, d2b = g(tgt_est.est_d1), g(tgt_est.est_d2)         # (V, S, M)
        validb = g(tgt_est.est_valid)

    # own estimates, broadcast over M
    P1a = [fm.est_P1[..., i, None] for i in range(3)]           # 3x (V, S, 1)
    P2a = [fm.est_P2[..., i, None] for i in range(3)]
    d1a, d2a = fm.est_d1[..., None], fm.est_d2[..., None]

    dva = [p2 - p1 for p1, p2 in zip(P1a, P2a)]
    lena = jnp.sqrt(sum(c * c for c in dva))
    dira = [c / jnp.maximum(lena, EPS) for c in dva]
    dvb = [p2 - p1 for p1, p2 in zip(P1b, P2b)]
    lenb = jnp.sqrt(sum(c * c for c in dvb))
    dirb = [c / jnp.maximum(lenb, EPS) for c in dvb]

    ok = (
        fm.est_valid[..., None]
        & validb
        & fm.kept
        & (lena > EPS)
        & (lenb > EPS)
    )

    # angular similarity (line3D.cc:1487-1489)
    dot = jnp.clip(sum(a * b for a, b in zip(dira, dirb)), -1.0, 1.0)
    ang = jnp.degrees(jnp.arccos(dot))
    ang = jnp.where(ang > 90.0, 180.0 - ang, ang)
    sim_a = jnp.exp(-ang * ang / two_sig_a_sqr)

    # depth-cutoff regularizers (line3D.cc:1491-1536):
    # sig = min(depth, cutoff) * k_view,  cutoff = min(median_depth, scene med)
    # med_scene_depth_lines may be a traced scalar (fused forward step) or a
    # host float; <= EPS disables the scene-level cutoff.
    med_scene = jnp.asarray(med_scene_depth_lines, dtype=jnp.float32)
    scene_cut = jnp.where(med_scene > EPS, med_scene, jnp.inf)
    cut_a = jnp.minimum(median_depth[:, None, None], scene_cut)
    # per-target-view scalars: tiny (V, N) lookup + repeat instead of a
    # (V, S, M)-indexed gather from a V-entry table
    per_pair = lambda t: jnp.repeat(t[neighbor_ids], k, axis=1)[:, None, :]
    cut_b = jnp.minimum(per_pair(median_depth_table), scene_cut)
    k_a = k_reg[:, None, None]
    k_b = per_pair(k_table)
    sig11 = jnp.minimum(d1a, cut_a) * k_a
    sig12 = jnp.minimum(d2a, cut_a) * k_a
    sig21 = jnp.minimum(d1b, cut_b) * k_b
    sig22 = jnp.minimum(d2b, cut_b) * k_b

    # mutual point-to-line distances (line3D.cc:1501-1505):
    # d^2 = |w|^2 - (w . dir)^2 with w = P - L0, all component-wise
    def p2l(P, L0, Ld):
        w = [p - l0 for p, l0 in zip(P, L0)]
        w2 = sum(c * c for c in w)
        proj = sum(c * d for c, d in zip(w, Ld))
        return jnp.sqrt(jnp.maximum(w2 - proj * proj, 0.0))

    d11 = p2l(P1a, P1b, dirb)   # dist of own P1 to target line
    d12 = p2l(P2a, P1b, dirb)
    d21 = p2l(P1b, P1a, dira)
    d22 = p2l(P2b, P1a, dira)

    expf = lambda d, sig: jnp.exp(-d * d / jnp.maximum(2.0 * sig * sig, EPS))
    sim_p1 = jnp.minimum(expf(d11, sig11), expf(d12, sig12))
    sim_p2 = jnp.minimum(expf(d21, sig21), expf(d22, sig22))
    sim = jnp.minimum(sim_a, jnp.minimum(sim_p1, sim_p2))

    edge_valid = ok & (sim > min_affinity)
    return AffinityDense(
        weight=jnp.where(edge_valid, sim, 0.0),
        edge_valid=edge_valid,
        tgt_view=tview.astype(jnp.int32),
        tgt_seg=tgt_seg.astype(jnp.int32),
    )
