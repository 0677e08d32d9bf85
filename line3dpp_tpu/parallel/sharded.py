"""Multi-chip execution: the forward step sharded over a view mesh.

The reference is a single-process, single-GPU program (SURVEY.md §2.3); this
module is its scale-out replacement.  Views are sharded across devices on a
1-D ``("views",)`` mesh: each device owns a contiguous block of views'
segments and computes matching/scoring/filtering/affinity for the pairs whose
*source* view is local.  The only communication is

* one ``all_gather`` of the (small) segment tensors so any device can read
  its targets' segments — the CP-style analog of the reference's tiled
  pairwise buffers (cudawrapper.cu:570-586), riding ICI;
* one ``all_gather`` of the per-view best-hypothesis estimates before the
  affinity stage (targets' estimates live on other shards);
* an ``all_gather`` of the per-view median depths (V scalars) for the
  scene-level depth cutoff (line3D.cc:1758-1774).

Everything else is local.  Cameras (V×(3,3) matrices) are replicated — they
are tiny compared to segments.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import affinity as affinity_ops
from ..models.step import StepOutputs, _median_positive

EPS = 1e-12

AXIS = "views"


def make_mesh(n_devices: int | None = None) -> Mesh:
    """1-D device mesh over the view axis."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (AXIS,))


def _local_step(
    seg_local, mask_local,          # (Vl, S, 4), (Vl, S) — local shard
    RtKinv, C, k_reg,               # (V, ...) replicated camera tables
    nbr_local, F_local, pv_local,   # (Vl, N), (Vl, N, 3, 3), (Vl, N)
    src_base,                       # (1,) int32 — global index of local view 0
    *,
    epipolar_overlap, knn, two_sig_a_sqr, min_similarity,
    check_orientation, min_best_score, min_best_score_perc, min_affinity,
    pair_chunk, use_pallas, pallas_interpret, comm="gather",
):
    """Runs inside shard_map; axis name ``views`` is available.

    ``comm="tile"`` is a BENCHMARK-ONLY control: every all_gather is
    replaced by a local tile to the same global shape, so downstream
    shapes/FLOPs are identical but no collective runs.  Outputs are
    numerically meaningless in that mode; tools/bench_scaling.py uses the
    delta real-vs-tile to isolate gather cost under identical host
    contention on the virtual CPU mesh."""
    Vl, S = mask_local.shape
    N = nbr_local.shape[1]
    k = knn

    if comm == "tile":
        D = jax.lax.axis_size(AXIS)
        gather = lambda x: jnp.tile(x, (D,) + (1,) * (x.ndim - 1))
    else:
        gather = lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True)

    # --- collective 1: segments of all views (targets may be remote) ---
    seg_all = gather(seg_local)
    mask_all = gather(mask_local)

    src_rows = src_base[0] + jnp.arange(Vl, dtype=jnp.int32)

    from ..models.step import _match_score_filter

    msf = _match_score_filter(
        seg_all, mask_all, RtKinv, C, k_reg,
        nbr_local, F_local, pv_local,
        epipolar_overlap=epipolar_overlap, knn=k,
        two_sig_a_sqr=two_sig_a_sqr, min_similarity=min_similarity,
        check_orientation=check_orientation, min_best_score=min_best_score,
        min_best_score_perc=min_best_score_perc, pair_chunk=pair_chunk,
        use_pallas_matching=use_pallas, use_pallas_scoring=use_pallas,
        pallas_interpret=pallas_interpret,
        src_rows=src_rows,
    )
    t_seg, t_valid = msf["t_seg"], msf["t_valid"]
    scored, fm = msf["scored"], msf["fm"]
    median_local = msf["median_depth"]
    k_local = k_reg[src_rows]

    # --- collective 2: estimates + median depths for the affinity stage ---
    tgt_est = affinity_ops.FilteredMatches(
        kept=fm.kept,  # unused on the target side
        est_valid=gather(fm.est_valid),
        est_P1=gather(fm.est_P1),
        est_P2=gather(fm.est_P2),
        est_d1=gather(fm.est_d1),
        est_d2=gather(fm.est_d2),
        max_score=fm.max_score,
    )
    median_all = gather(median_local)
    med_scene = _median_positive(median_all, median_all > EPS)

    aff = affinity_ops.affinity_dense(
        fm, t_seg, nbr_local, k_local, median_local,
        med_scene, two_sig_a_sqr, min_affinity,
        tgt_est=tgt_est, k_table=k_reg, median_depth_table=median_all,
        use_pallas=use_pallas, pallas_interpret=pallas_interpret,
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
        median_depth=median_local,
    )


def sharded_forward_step(mesh: Mesh, **static_kwargs):
    """Build the jitted, view-sharded forward step for a mesh.

    Returns ``fn(segments, seg_mask, RtKinv, C, k_reg, neighbor_ids, F,
    pair_valid)`` with the view axis of segments/neighbors sharded over the
    mesh and camera tables replicated.  V must be divisible by the mesh size.
    """
    n_shards = mesh.devices.size

    defaults = dict(
        epipolar_overlap=0.25, knn=10, two_sig_a_sqr=200.0,
        min_similarity=0.5, check_orientation=True,
        min_best_score=0.75, min_best_score_perc=0.10, min_affinity=0.5,
        pair_chunk=8, use_pallas=False, pallas_interpret=False,
        comm="gather",
    )
    defaults.update(static_kwargs)
    body = functools.partial(_local_step, **defaults)

    shard = P(AXIS)
    repl = P()
    out_shard = StepOutputs(
        tgt_seg=shard, match_valid=shard, score3d=shard, kept=shard,
        est_valid=shard, est_P1=shard, est_P2=shard,
        est_d1=shard, est_d2=shard,
        aff_weight=shard, aff_valid=shard, median_depth=shard,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(shard, shard, repl, repl, repl, shard, shard, shard, shard),
        out_specs=out_shard,
        check_vma=False,
    )

    def fn(segments, seg_mask, RtKinv, C, k_reg, neighbor_ids, F, pair_valid):
        V = segments.shape[0]
        if V % n_shards:
            raise ValueError(f"V={V} not divisible by mesh size {n_shards}")
        Vl = V // n_shards
        # global view index of each shard's first view: one scalar per device
        src_base = jnp.arange(n_shards, dtype=jnp.int32) * Vl
        return mapped(
            segments, seg_mask, RtKinv, C, k_reg,
            neighbor_ids, F, pair_valid, src_base,
        )

    return jax.jit(fn)


def shard_inputs(mesh: Mesh, segments, seg_mask, RtKinv, C, k_reg,
                 neighbor_ids, F, pair_valid):
    """Place host arrays on the mesh with the step's shardings."""
    shard = NamedSharding(mesh, P(AXIS))
    repl = NamedSharding(mesh, P())
    put = lambda x, s: jax.device_put(jnp.asarray(x), s)
    return (
        put(segments, shard), put(seg_mask, shard),
        put(RtKinv, repl), put(C, repl), put(k_reg, repl),
        put(neighbor_ids, shard), put(F, shard), put(pair_valid, shard),
    )
