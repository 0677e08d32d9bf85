"""Fused device-side forward step of the line-MVS model.

One pure, jittable function runs the full per-round device compute of the
pipeline — epipolar matching, 3D hypothesis scoring, match filtering, and
affinity weighting — over a batch of views (reference phases 2+3 device work:
matchImages line3D.cc:375-497 and computingAffinityMatrix line3D.cc:1852-1979).
The host never sees intermediates; only the filtered estimates, scores and
affinity edge weights come back.

This is the "flagship forward step": `__graft_entry__.entry()` compiles it
single-chip, and `parallel.sharded` wraps it in a `shard_map` over a view-
sharded mesh for multi-chip execution (SURVEY.md §7.2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import affinity as affinity_ops
from ..ops import geometry as geo
from ..ops import matching as matching_ops
from ..ops import scoring as scoring_ops

EPS = 1e-12


class StepOutputs(NamedTuple):
    """Per-view dense outputs of the fused forward step."""

    tgt_seg: jnp.ndarray      # (V, S, M) int32 match target segment
    match_valid: jnp.ndarray  # (V, S, M) bool
    score3d: jnp.ndarray      # (V, S, M) f32
    kept: jnp.ndarray         # (V, S, M) bool — post 10%-of-max filter
    est_valid: jnp.ndarray    # (V, S) bool
    est_P1: jnp.ndarray       # (V, S, 3) best-hypothesis endpoints
    est_P2: jnp.ndarray       # (V, S, 3)
    est_d1: jnp.ndarray       # (V, S)
    est_d2: jnp.ndarray       # (V, S)
    aff_weight: jnp.ndarray   # (V, S, M) f32 affinity edge weight
    aff_valid: jnp.ndarray    # (V, S, M) bool
    median_depth: jnp.ndarray  # (V,) f32 median kept best-match depth


def _median_positive(x: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """Upper median over the valid entries of a flat array (line3D.cc:1657-1668)."""
    n = x.shape[0]
    big = jnp.where(valid, x, jnp.inf)
    srt = jnp.sort(big)
    cnt = jnp.sum(valid)
    idx = jnp.clip(cnt // 2, 0, n - 1)
    med = srt[idx]
    return jnp.where(cnt > 0, med, EPS)


def _match_score_filter(
    segments, seg_mask, RtKinv, C, k_reg, neighbor_ids, F, pair_valid,
    *, epipolar_overlap, knn, two_sig_a_sqr, min_similarity,
    check_orientation, min_best_score, min_best_score_perc, pair_chunk,
    use_pallas_matching, use_pallas_scoring, pallas_interpret=False,
    src_rows=None):
    """Matching -> scoring -> filtering -> per-view medians for a batch of
    source views.

    ``segments``/``seg_mask`` and the camera tables cover ALL views;
    ``neighbor_ids``/``F``/``pair_valid`` cover only the source batch.
    ``src_rows`` selects the batch (defaults to every view) — the blocked
    large-scene path slices the view axis this way (targets can lie outside
    the block; only O(Vb*S*M) memory is live per block)."""
    S = seg_mask.shape[1]
    N = neighbor_ids.shape[1]
    k = knn
    M = N * k

    if src_rows is None:
        src_rows = jnp.arange(seg_mask.shape[0], dtype=jnp.int32)
    Vb = src_rows.shape[0]

    src_idx = jnp.repeat(src_rows, N)
    tgt_idx = neighbor_ids.reshape(-1)
    if use_pallas_matching:
        from ..ops import matching_pallas

        pm = matching_pallas.match_pairs_pallas(
            segments, seg_mask, RtKinv, C,
            src_idx, tgt_idx, F.reshape(-1, 3, 3), pair_valid.reshape(-1),
            epipolar_overlap=epipolar_overlap, knn=k,
            interpret=pallas_interpret,
        )

        # (P, k, S) -> (Vb, S, M): keep the big segment axis on lanes until
        # the final transpose (lane dims S and M are both large)
        def regroup(x):
            return x.reshape(Vb, N * k, S).swapaxes(1, 2)
    else:
        pm = matching_ops.match_pairs_chunked(
            segments, seg_mask, RtKinv, C,
            src_idx, tgt_idx, F.reshape(-1, 3, 3), pair_valid.reshape(-1),
            epipolar_overlap, k, chunk=pair_chunk,
        )

        # regroup (Vb*N, S, k) -> (Vb, S, M) with neighbor-grouped M axis
        def regroup(x):
            x = x.reshape(Vb, N, S, k)
            return jnp.moveaxis(x, 1, 2).reshape(Vb, S, M)

    t_seg = regroup(pm.tgt_seg)
    t_valid = regroup(pm.valid)
    d_p1 = regroup(pm.d_p1)
    d_p2 = regroup(pm.d_p2)

    seg_src = segments[src_rows]
    RtKinv_src = RtKinv[src_rows]
    C_src = C[src_rows]
    k_src = k_reg[src_rows]

    r1, r2 = geo.segment_rays(RtKinv_src[:, None], seg_src)
    mid = 0.5 * (seg_src[..., 0:2] + seg_src[..., 2:4])
    rmid = geo.rays_from_pixels(RtKinv_src[:, None], mid)

    if use_pallas_scoring:
        from ..ops import scoring_pallas

        # very large match tables (big N*k) overflow the kernel's VMEM
        # working set — fall back to the chunked XLA path for those
        use_pallas_scoring = scoring_pallas.pick_seg_tile(N, M, k) >= 8
    if use_pallas_scoring:
        from ..ops import scoring_pallas

        scored = scoring_pallas.score_matches_pallas(
            r1, r2, rmid, C_src, k_src, neighbor_ids,
            d_p1, d_p2, t_valid,
            knn=k, two_sig_a_sqr=two_sig_a_sqr,
            min_similarity=min_similarity,
            check_orientation=check_orientation,
            C_table=C, k_table=k_reg,
            interpret=pallas_interpret,
        )
    else:
        scored = scoring_ops.score_matches(
            r1, r2, rmid, C_src, k_src, neighbor_ids,
            d_p1, d_p2, t_valid,
            knn=k, two_sig_a_sqr=two_sig_a_sqr,
            min_similarity=min_similarity,
            check_orientation=check_orientation,
            C_table=C, k_table=k_reg,
        )

    fm = affinity_ops.filter_matches(
        r1, r2, C_src, scored.score3d, scored.valid,
        d_p1, d_p2, min_best_score, min_best_score_perc,
    )

    both = jnp.concatenate([fm.est_d1, fm.est_d2], axis=1)
    bvalid = jnp.concatenate([fm.est_valid, fm.est_valid], axis=1)
    median_depth = jax.vmap(_median_positive)(both, bvalid)

    return dict(t_seg=t_seg, t_valid=t_valid, d_p1=d_p1, d_p2=d_p2,
                scored=scored, fm=fm, median_depth=median_depth,
                r1=r1, r2=r2)


@functools.partial(
    jax.jit,
    static_argnames=(
        "epipolar_overlap", "knn", "two_sig_a_sqr", "min_similarity",
        "check_orientation", "min_best_score", "min_best_score_perc",
        "min_affinity", "med_scene_depth_static", "pair_chunk",
        "use_pallas_matching", "use_pallas_scoring", "pallas_interpret",
    ),
)
def forward_step(
    segments: jnp.ndarray,      # (V, S, 4) f32 2D segments (dense, masked)
    seg_mask: jnp.ndarray,      # (V, S) bool
    RtKinv: jnp.ndarray,        # (V, 3, 3) f32
    C: jnp.ndarray,             # (V, 3) f32 (median-centered)
    k_reg: jnp.ndarray,         # (V,) f32 spatial regularizer
    neighbor_ids: jnp.ndarray,  # (V, N) int32
    F: jnp.ndarray,             # (V, N, 3, 3) f32 fundamental matrices
    pair_valid: jnp.ndarray,    # (V, N) bool
    *,
    epipolar_overlap: float = 0.25,
    knn: int = 10,
    two_sig_a_sqr: float = 200.0,
    min_similarity: float = 0.5,
    check_orientation: bool = True,
    min_best_score: float = 0.75,
    min_best_score_perc: float = 0.10,
    min_affinity: float = 0.5,
    med_scene_depth_static: float = -1.0,
    pair_chunk: int = 8,
    use_pallas_matching: bool = False,
    use_pallas_scoring: bool = False,
    pallas_interpret: bool = False,
) -> StepOutputs:
    msf = _match_score_filter(
        segments, seg_mask, RtKinv, C, k_reg, neighbor_ids, F, pair_valid,
        epipolar_overlap=epipolar_overlap, knn=knn,
        two_sig_a_sqr=two_sig_a_sqr, min_similarity=min_similarity,
        check_orientation=check_orientation, min_best_score=min_best_score,
        min_best_score_perc=min_best_score_perc, pair_chunk=pair_chunk,
        use_pallas_matching=use_pallas_matching,
        use_pallas_scoring=use_pallas_scoring,
        pallas_interpret=pallas_interpret,
    )
    t_seg, t_valid = msf["t_seg"], msf["t_valid"]
    scored, fm, median_depth = msf["scored"], msf["fm"], msf["median_depth"]

    # median scene depth over views for the affinity depth cutoff
    # (line3D.cc:1758-1774); a static override keeps parity with the
    # host-orchestrated path when provided.
    if med_scene_depth_static > 0:
        med_scene = jnp.float32(med_scene_depth_static)
    else:
        med_scene = _median_positive(median_depth, median_depth > EPS)

    # ---- affinity weights ----
    aff = affinity_ops.affinity_dense(
        fm, t_seg, neighbor_ids, k_reg, median_depth,
        med_scene, two_sig_a_sqr, min_affinity,
        use_pallas=use_pallas_matching, pallas_interpret=pallas_interpret,
    )

    return StepOutputs(
        tgt_seg=t_seg,
        match_valid=t_valid,
        score3d=scored.score3d,
        kept=fm.kept,
        est_valid=fm.est_valid,
        est_P1=fm.est_P1,
        est_P2=fm.est_P2,
        est_d1=fm.est_d1,
        est_d2=fm.est_d2,
        aff_weight=aff.weight,
        aff_valid=aff.edge_valid,
        median_depth=median_depth,
    )
