"""Line3D pipeline orchestrator.

The TPU-native equivalent of the reference's ``L3DPP::Line3D`` class
(reference: line3D.h:61-424): owns views, runs the three phases

    [1] view ingestion  ->  [2] line matching  ->  [3] reconstruction

and writes the resulting 3D line model.  Unlike the reference's
mutex-guarded incremental state (line3D.h:358-417), all device state is
immutable batched tensors; the host keeps only small bookkeeping (ids,
neighbor graphs, cluster lists).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..camera import (Camera, CameraBatch, fundamental_matrices,
                      median_center_translation)
from ..config import Config
from ..ops import affinity as affinity_ops
from ..ops import clustering as clustering_ops
from ..ops import fitting as fitting_ops
from ..ops import geometry as geo
from ..ops import sweep as sweep_ops
from ..utils.writers import FinalLine3D, save_bin, save_obj, save_stl, save_txt

EPS = 1e-12


@jax.jit
def _rel_cut_mask(edge_valid, score3d, kept, rel):
    """Affinity edges whose match scores >= rel * its segment's best kept
    score (Config.match_rel_cut; see reconstruct_3d_lines)."""
    best = jnp.max(jnp.where(kept, score3d, 0.0), axis=-1, keepdims=True)
    return edge_valid & (score3d >= rel * best)


@dataclasses.dataclass
class _ViewEntry:
    cam_id: int
    camera: Camera
    segments: np.ndarray     # (n, 4) float
    worldpoints: list | None


class Line3D:
    """End-to-end line-based MVS pipeline."""

    def __init__(self, config: Config | None = None):
        self.config = config or Config()
        self._views: dict[int, _ViewEntry] = {}
        self._fixed_neighbors: dict[int, list[int]] = {}
        self.lines3d: list[FinalLine3D] = []
        self._last_state: dict = {}
        # opt-in split diagnostics: set to [] before reconstruct to collect
        # per-candidate records (tools/diag_split_quality.py)
        self._split_records: list | None = None
        # opt-in cluster-fate diagnostics (tools/diag_lost_clusters.py)
        self._cluster_records: list | None = None

    # ------------------------------------------------------------------
    # phase 1: view ingestion (reference: addImage line3D.cc:112-227)
    # ------------------------------------------------------------------
    def add_view(
        self,
        cam_id: int,
        camera: Camera,
        segments: np.ndarray,
        worldpoints: Sequence[int] | None = None,
    ) -> None:
        """Register a view with precomputed 2D segments (the
        ``line_segments`` path of addImage, reference: line3D.h:104-108)."""
        segments = np.asarray(segments, dtype=np.float64).reshape(-1, 4)
        # min-length filter + keep longest max_line_segments
        # (reference: line3D.cc:320-360)
        lengths = np.hypot(segments[:, 2] - segments[:, 0], segments[:, 3] - segments[:, 1])
        min_len = camera.diagonal * self.config.min_line_length_factor
        segments = segments[lengths >= min_len]
        lengths = lengths[lengths >= min_len]
        if len(segments) > self.config.max_line_segments:
            keep = np.argsort(-lengths, kind="stable")[: self.config.max_line_segments]
            keep.sort()
            segments = segments[keep]
        self._views[cam_id] = _ViewEntry(cam_id, camera, segments,
                                         list(worldpoints) if worldpoints is not None else None)

    def add_image(self, cam_id: int, camera: Camera, image: np.ndarray,
                  worldpoints: Sequence[int] | None = None,
                  cache_dir: str | None = None) -> None:
        """Register a view, detecting 2D segments with the TPU LSD detector
        (reference: line3D.cc:249-372)."""
        from ..ops import lsd as lsd_ops
        from ..utils import segments_cache

        # reject too-small images, as the reference does (line3D.cc:119-126)
        width = image.shape[1] if image.ndim >= 2 else 0
        if width < self.config.min_image_width:
            print(f"[L3D-TPU] warning: image {cam_id} too small "
                  f"({width} < {self.config.min_image_width} px wide) -> "
                  f"skipped", flush=True)
            return

        segs = None
        if cache_dir and self.config.load_segments:
            segs = segments_cache.load(cache_dir, cam_id, image.shape,
                                       self.config.max_line_segments,
                                       self.config.max_image_width)
        if segs is None:
            segs = lsd_ops.detect(image, max_width=self.config.max_image_width,
                                  n_rounds=self.config.lsd_rounds,
                                  rescue=self.config.lsd_rescue,
                                  seed_gate=self.config.lsd_seed_gate)
            if cache_dir and self.config.load_segments:
                segments_cache.store(cache_dir, cam_id, image.shape,
                                     self.config.max_line_segments, segs,
                                     self.config.max_image_width)
        self.add_view(cam_id, camera, segs, worldpoints)

    def add_images(self, items: Sequence[tuple],
                   cache_dir: str | None = None) -> None:
        """Register several views at once, pipelining detection.

        ``items`` is a sequence of ``(cam_id, camera, image)`` or
        ``(cam_id, camera, image, worldpoints)`` tuples.  Uncached images
        are detected through :func:`ops.lsd.detect_batch`, which overlaps
        each image's host readback with the next one's device compute —
        ~25% faster cold ingestion than per-image :meth:`add_image` calls
        at full resolution (identical results)."""
        from ..ops import lsd as lsd_ops
        from ..utils import segments_cache

        todo = []          # (cam_id, camera, image, wps) needing detection
        for it in items:
            cam_id, camera, image = it[0], it[1], it[2]
            wps = it[3] if len(it) > 3 else None
            width = image.shape[1] if image.ndim >= 2 else 0
            if width < self.config.min_image_width:
                print(f"[L3D-TPU] warning: image {cam_id} too small "
                      f"({width} < {self.config.min_image_width} px wide) "
                      f"-> skipped", flush=True)
                continue
            segs = None
            if cache_dir and self.config.load_segments:
                segs = segments_cache.load(cache_dir, cam_id, image.shape,
                                           self.config.max_line_segments,
                                           self.config.max_image_width)
            if segs is None:
                todo.append((cam_id, camera, image, wps))
            else:
                self.add_view(cam_id, camera, segs, wps)
        if not todo:
            return
        seg_lists = lsd_ops.detect_batch(
            [t[2] for t in todo], max_width=self.config.max_image_width,
            n_rounds=self.config.lsd_rounds,
            rescue=self.config.lsd_rescue,
            seed_gate=self.config.lsd_seed_gate)
        for (cam_id, camera, image, wps), segs in zip(todo, seg_lists):
            if cache_dir and self.config.load_segments:
                segments_cache.store(cache_dir, cam_id, image.shape,
                                     self.config.max_line_segments, segs,
                                     self.config.max_image_width)
            self.add_view(cam_id, camera, segs, wps)

    def set_visual_neighbors(self, cam_id: int, neighbors: Sequence[int]) -> None:
        """Explicit neighbor list (reference: line3D.cc:230-246)."""
        self._fixed_neighbors[cam_id] = list(neighbors)

    # ------------------------------------------------------------------
    # phase 2 + 3
    # ------------------------------------------------------------------
    def match_images(self) -> None:
        cfg = self.config
        cam_ids = sorted(self._views)
        V = len(cam_ids)
        if V == 0:
            raise ValueError("no views added")
        S = cfg.num_segments
        N = max(cfg.num_neighbors, 2)
        k = cfg.knn_effective

        id2idx = {c: i for i, c in enumerate(cam_ids)}
        cams = [self._views[c].camera for c in cam_ids]

        # median-centering for float32 stability (line3D.cc:500-536)
        translation = median_center_translation(cams)
        fixed_reg = cfg.sigma_p < 0
        med_scene_depth = cfg.const_regularization_depth
        if fixed_reg and med_scene_depth < 0:
            depths = sorted(c.median_depth for c in cams)
            med_scene_depth = depths[len(depths) // 2]
        cb = CameraBatch.from_cameras(
            cams, cfg.sigma_p, translation,
            med_scene_depth if fixed_reg else None, fixed_reg,
        )

        # dense segment tensors
        segs = np.zeros((V, S, 4), np.float32)
        mask = np.zeros((V, S), bool)
        for i, c in enumerate(cam_ids):
            sv = self._views[c].segments[:S]
            segs[i, : len(sv)] = sv
            mask[i, : len(sv)] = True

        # visual neighbors -> (V, N) neighbor table + pair validity.
        # The relation is symmetrized: the reference propagates every match
        # back to the target view (storeInverseMatches, line3D.cc:1672-1699).
        # That propagation is order-gated (!processed_[tgt]): a view only
        # inherits matches from views processed BEFORE it (ascending camID),
        # never from later ones — so back-edges j->i exist only when i
        # precedes j.  "full" symmetrization (both directions uncondition-
        # ally) yields a denser graph that over-merges near-duplicate
        # parallel 3D lines in clustering.
        nbr_lists = self._visual_neighbors(cam_ids, cams, N)
        nbr_sets: dict[int, list[int]] = {
            c: [id2idx[n] for n in nbr_lists[c] if n in id2idx][:N]
            for c in cam_ids
        }
        sym = cfg.match_symmetrization
        if sym not in ("full", "ordered", "none"):
            raise ValueError(f"match_symmetrization={sym!r}")
        if sym != "none":
            for i, c in enumerate(cam_ids):
                for j in nbr_sets[c]:
                    back = nbr_sets[cam_ids[j]]
                    if i not in back and (sym == "full" or i < j):
                        back.append(i)
        N = max(N, max((len(v) for v in nbr_sets.values()), default=N))
        neighbor_ids = np.zeros((V, N), np.int32)
        pair_valid = np.zeros((V, N), bool)
        for i, c in enumerate(cam_ids):
            nl = nbr_sets[c]
            neighbor_ids[i, : len(nl)] = nl
            pair_valid[i, : len(nl)] = True

        # fundamental matrices per (view, neighbor slot): one batched host
        # pass over all valid pairs (O(V*N) python calls dominated setup at
        # thousands of views)
        F = np.zeros((V, N, 3, 3), np.float32)
        centered = [Camera(c.K, c.R, -c.R @ (c.C - translation), c.width, c.height)
                    for c in cams]
        src_p, slot_p = np.nonzero(pair_valid)
        if len(src_p):
            F[src_p, slot_p] = fundamental_matrices(
                centered, src_p, neighbor_ids[src_p, slot_p])

        # --- device: one fused step (matching -> scoring -> filtering ->
        # affinity + per-view medians); see models/step.py ---
        from .step import forward_step

        d_segs = jnp.asarray(segs)
        d_mask = jnp.asarray(mask)
        d_RtKinv = jnp.asarray(cb.RtKinv)
        d_C = jnp.asarray(cb.C)
        d_nbr = jnp.asarray(neighbor_ids)

        # the fused Pallas matching kernel needs a real TPU backend; the XLA
        # path serves CPU tests and any other platform
        use_pallas = (cfg.use_pallas_matching
                      and jax.default_backend() == "tpu")

        # all-matches mode (knn <= 0) or very large scenes can exceed device
        # memory on the fused path ([V, S, N*k] tensors); fall back to the
        # blocked path with a block size that keeps ~O(1 GB) per array
        view_block = cfg.view_block
        fused_bytes = V * S * N * k * 4
        if view_block <= 0 and fused_bytes > (2 << 30):
            view_block = max(1, (2 << 30) // max(S * N * k * 4, 1))
            print(
                f"[L3D-TPU] match tensors would be {fused_bytes / (1 << 30):.1f}"
                f" GiB per array (knn={cfg.knn}); auto-blocking source views"
                f" at view_block={view_block}", flush=True)

        if view_block > 0 and V > view_block:
            # large-scene path: process source views in blocks so device
            # memory stays O(block * S * M) regardless of V
            self._match_images_blocked(
                cam_ids, cams, translation, cb, segs, mask,
                neighbor_ids, pair_valid, F, k, use_pallas,
                med_scene_depth, fixed_reg, view_block)
            return

        out = forward_step(
            d_segs, d_mask, d_RtKinv, d_C, jnp.asarray(cb.k_reg),
            d_nbr, jnp.asarray(F), jnp.asarray(pair_valid),
            epipolar_overlap=cfg.epipolar_overlap, knn=k,
            two_sig_a_sqr=cfg.two_sig_a_sqr,
            min_similarity=cfg.min_similarity_3d,
            check_orientation=cfg.check_match_orientation,
            min_best_score=cfg.min_best_score_3d,
            min_best_score_perc=cfg.min_best_score_perc,
            min_affinity=cfg.min_affinity,
            pair_chunk=max(cfg.pair_chunk, 1),
            use_pallas_matching=use_pallas,
            use_pallas_scoring=use_pallas,
        )

        fm = affinity_ops.FilteredMatches(
            kept=out.kept,
            est_valid=out.est_valid, est_P1=out.est_P1, est_P2=out.est_P2,
            est_d1=out.est_d1, est_d2=out.est_d2,
            # per-view max score (filterMatches line3D.cc:1592-1603); the
            # step already applied the cuts — kept for diagnostics
            max_score=jnp.max(jnp.where(out.match_valid, out.score3d, 0.0),
                              axis=(1, 2)),
        )
        tview = jnp.broadcast_to(
            jnp.repeat(d_nbr, k, axis=1)[:, None, :], out.tgt_seg.shape)
        aff = affinity_ops.AffinityDense(
            weight=out.aff_weight, edge_valid=out.aff_valid,
            tgt_view=tview, tgt_seg=out.tgt_seg,
        )
        r1, r2 = geo.segment_rays(d_RtKinv[:, None], d_segs)
        median_depth = np.asarray(out.median_depth)

        self._last_state = dict(
            cam_ids=cam_ids, cams=cams, translation=translation,
            cb=cb, segs=segs, mask=mask, neighbor_ids=neighbor_ids,
            r1=r1, r2=r2, t_seg=out.tgt_seg, aff=aff,
            fm=fm, median_depth=median_depth,
            med_scene_depth=med_scene_depth, fixed_reg=fixed_reg,
            score3d=out.score3d,
        )

    def _match_images_blocked(self, cam_ids, cams, translation, cb, segs,
                              mask, neighbor_ids, pair_valid, F, k,
                              use_pallas, med_scene_depth, fixed_reg,
                              view_block=None):
        """Blocked matching for scenes too large for the fused step: source
        views run through ``_match_score_filter`` in fixed-size blocks
        (device memory O(block*S*M)), kept matches are compacted to a flat
        host edge list, and affinity evaluates edge-wise over the global
        estimate tables (SURVEY.md §7.2's single-host scaling analog of the
        reference's 3072-row GPU buffer loop)."""
        import functools

        from ..ops import geometry as geo_ops
        from .step import _match_score_filter

        cfg = self.config
        V, S = mask.shape
        N = neighbor_ids.shape[1]
        M = N * k
        Vb = cfg.view_block if view_block is None else view_block

        d_segs = jnp.asarray(segs)
        d_mask = jnp.asarray(mask)
        d_RtKinv = jnp.asarray(cb.RtKinv)
        d_C = jnp.asarray(cb.C)
        d_kreg = jnp.asarray(cb.k_reg)

        msf = jax.jit(functools.partial(
            _match_score_filter,
            epipolar_overlap=cfg.epipolar_overlap, knn=k,
            two_sig_a_sqr=cfg.two_sig_a_sqr,
            min_similarity=cfg.min_similarity_3d,
            check_orientation=cfg.check_match_orientation,
            min_best_score=cfg.min_best_score_3d,
            min_best_score_perc=cfg.min_best_score_perc,
            pair_chunk=max(cfg.pair_chunk, 1),
            use_pallas_matching=use_pallas,
            use_pallas_scoring=use_pallas,
        ))

        est_P1 = np.zeros((V, S, 3), np.float32)
        est_P2 = np.zeros((V, S, 3), np.float32)
        est_d1 = np.zeros((V, S), np.float32)
        est_d2 = np.zeros((V, S), np.float32)
        est_valid = np.zeros((V, S), bool)
        median_depth = np.full(V, EPS, np.float32)
        edge_sv, edge_ss, edge_tv, edge_ts = [], [], [], []

        n_blocks = -(-V // Vb)
        for b in range(n_blocks):
            lo = b * Vb
            rows = np.arange(lo, min(lo + Vb, V), dtype=np.int32)
            # pad the last block by repeating the first row with pairs off
            padn = Vb - len(rows)
            rows_p = np.concatenate([rows, np.zeros(padn, np.int32)])
            nbr_b = neighbor_ids[rows_p]
            pv_b = pair_valid[rows_p].copy()
            if padn:
                pv_b[len(rows):] = False
            out = msf(
                d_segs, d_mask, d_RtKinv, d_C, d_kreg,
                jnp.asarray(nbr_b), jnp.asarray(F[rows_p]),
                jnp.asarray(pv_b), src_rows=jnp.asarray(rows_p))

            nreal = len(rows)
            est_P1[rows] = np.asarray(out["fm"].est_P1)[:nreal]
            est_P2[rows] = np.asarray(out["fm"].est_P2)[:nreal]
            est_d1[rows] = np.asarray(out["fm"].est_d1)[:nreal]
            est_d2[rows] = np.asarray(out["fm"].est_d2)[:nreal]
            est_valid[rows] = np.asarray(out["fm"].est_valid)[:nreal]
            median_depth[rows] = np.asarray(out["median_depth"])[:nreal]

            n_kept = int(jnp.sum(out["fm"].kept))
            if n_kept == 0:
                continue
            cap = affinity_ops.compaction_capacity(n_kept)
            idx, okm, ts = affinity_ops.compact_kept(
                out["fm"].kept, out["t_seg"], cap)
            idx, ts = idx[okm], ts[okm]
            lv = idx // (S * M)
            ss = (idx // M) % S
            slot = idx % M
            keep = lv < nreal
            lv, ss, slot, ts = lv[keep], ss[keep], slot[keep], ts[keep]
            edge_sv.append(rows_p[lv])
            edge_ss.append(ss.astype(np.int64))
            edge_tv.append(nbr_b[lv, slot // k].astype(np.int64))
            edge_ts.append(ts.astype(np.int64))

        meds = np.sort(median_depth[median_depth > EPS])
        med_scene = float(meds[len(meds) // 2]) if len(meds) else 0.0

        if edge_sv:
            sv = np.concatenate(edge_sv).astype(np.int32)
            ss = np.concatenate(edge_ss).astype(np.int32)
            tv = np.concatenate(edge_tv).astype(np.int32)
            ts = np.concatenate(edge_ts).astype(np.int32)
            E = len(sv)
            cap = affinity_ops.compaction_capacity(E)
            padE = cap - E
            padz = lambda x: np.concatenate([x, np.zeros(padE, x.dtype)])
            w, valid = affinity_ops.affinity_edges_flat(
                jnp.asarray(est_P1), jnp.asarray(est_P2),
                jnp.asarray(est_d1), jnp.asarray(est_d2),
                jnp.asarray(est_valid),
                jnp.asarray(padz(sv)), jnp.asarray(padz(ss)),
                jnp.asarray(padz(tv)), jnp.asarray(padz(ts)),
                jnp.asarray(np.concatenate(
                    [np.ones(E, bool), np.zeros(padE, bool)])),
                d_kreg, jnp.asarray(median_depth),
                med_scene, cfg.two_sig_a_sqr, cfg.min_affinity,
            )
            w = np.asarray(w)[:E]
            valid = np.asarray(valid)[:E]
            gid_a = sv[valid].astype(np.int64) * S + ss[valid]
            gid_b = tv[valid].astype(np.int64) * S + ts[valid]
            ww = w[valid]
        else:
            gid_a = np.zeros(0, np.int64)
            gid_b = np.zeros(0, np.int64)
            ww = np.zeros(0, np.float32)

        fm = affinity_ops.FilteredMatches(
            kept=None,
            est_valid=est_valid, est_P1=est_P1, est_P2=est_P2,
            est_d1=est_d1, est_d2=est_d2, max_score=None,
        )
        r1, r2 = geo_ops.segment_rays(d_RtKinv[:, None], d_segs)

        self._last_state = dict(
            cam_ids=cam_ids, cams=cams, translation=translation,
            cb=cb, segs=segs, mask=mask, neighbor_ids=neighbor_ids,
            r1=r1, r2=r2, fm=fm, median_depth=median_depth,
            med_scene_depth=med_scene_depth, fixed_reg=fixed_reg,
            edges_flat=(gid_a, gid_b, ww),
        )

    def reconstruct_3d_lines(self) -> list[FinalLine3D]:
        cfg = self.config
        st = self._last_state
        if not st:
            raise RuntimeError("call match_images() first")
        cam_ids, cb, fm = st["cam_ids"], st["cb"], st["fm"]
        V, S = st["mask"].shape
        visibility = max(cfg.visibility_t, 3)

        # median scene depth over views (line3D.cc:1758-1774)
        meds = np.sort(st["median_depth"][st["median_depth"] > EPS])
        med_scene_depth_lines = float(meds[len(meds) // 2]) if len(meds) else 0.0

        if "edges_flat" in st:
            # blocked large-scene path delivered edges directly
            gid_a, gid_b, ww = st["edges_flat"]
        else:
            # affinity weights were produced by the fused device step
            aff = st["aff"]

            # optional per-segment relative score cut (Config.match_rel_cut):
            # a kept match only yields an affinity edge when its score is at
            # least rel * the segment's best score.  The reference's 10%-cut
            # is per view (filterMatches line3D.cc:1607-1612) and cannot
            # remove the weak cross-line tail of strong segments, which is
            # what bridges close parallel bundles (tools/diag_tail_ratio.py).
            # The edge survives if EITHER directed instance passes (dedup
            # below keeps one).  Device-side: O(V*S*M) elementwise, no big
            # host transfer.
            if cfg.match_rel_cut > 0 and "score3d" in st:
                mask = _rel_cut_mask(aff.edge_valid, st["score3d"], fm.kept,
                                     jnp.float32(cfg.match_rel_cut))
                aff = aff._replace(
                    edge_valid=mask,
                    weight=jnp.where(mask, aff.weight, 0.0))

            # --- edge extraction: device-side compaction, then host dedup
            # (line3D.cc:1881-1899).  Only O(E) bytes cross to the host.
            M = aff.weight.shape[2]
            n_edges = affinity_ops.count_edges(aff.edge_valid)
            cap = affinity_ops.compaction_capacity(n_edges)
            idx, okm, ww, tv_e, ts_e = affinity_ops.compact_edges(aff, cap)
            idx, ww, tv_e, ts_e = idx[okm], ww[okm], tv_e[okm], ts_e[okm]
            src_v = (idx // (S * M)).astype(np.int64)
            src_s = (idx // M) % S
            gid_a = src_v * S + src_s
            gid_b = tv_e.astype(np.int64) * S + ts_e

        # optional collinearity edges: same-view collinear segment pairs with
        # consistent 3D estimates (reference: line3D.cc:1904-1974)
        if cfg.collinearity_t > 0:
            from ..ops import collinearity as collin_ops

            collin = collin_ops.collinear_pairs(
                jnp.asarray(st["segs"]), jnp.asarray(st["mask"]),
                float(cfg.collinearity_t))
            cw, cedge = collin_ops.collinear_similarity(
                fm.est_P1, fm.est_P2, fm.est_d1, fm.est_d2, fm.est_valid,
                collin, jnp.asarray(cb.k_reg),
                jnp.asarray(st["median_depth"]),
                float(med_scene_depth_lines), cfg.min_affinity)
            cv_, cs1, cs2 = np.nonzero(np.asarray(cedge))
            keep_dir = cs1 < cs2          # undirected: keep one direction
            cv_, cs1, cs2 = cv_[keep_dir], cs1[keep_dir], cs2[keep_dir]
            gid_a = np.concatenate([gid_a, cv_ * S + cs1])
            gid_b = np.concatenate([gid_b, (cv_ * S + cs2).astype(np.int64)])
            ww = np.concatenate([ww, np.asarray(cw)[cv_, cs1, cs2]])

        lo = np.minimum(gid_a, gid_b)
        hi = np.maximum(gid_a, gid_b)
        _, first = np.unique(lo * (V * S) + hi, return_index=True)
        lo, hi, ww = lo[first], hi[first], ww[first]

        if len(ww) == 0:
            self.lines3d = []
            return self.lines3d

        # local node ids for nodes that appear in edges
        nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
        li = inv[: len(lo)].astype(np.int32)
        lj = inv[len(lo) :].astype(np.int32)

        # optional replicator-dynamics diffusion sharpens the affinities
        # before clustering (reference: performRDD line3D.cc:2026-2076)
        if cfg.perform_rdd:
            from ..ops import rdd as rdd_ops

            ww = rdd_ops.rdd_edges(li, lj, ww.astype(np.float32), len(nodes),
                                   iterations=cfg.rdd_max_iter)

        # both directions, as the reference pushes symmetric entries
        ei = np.concatenate([li, lj])
        ej = np.concatenate([lj, li])
        ew = np.concatenate([ww, ww]).astype(np.float32)

        if cfg.cluster_strong_min > 0 and "score3d" in st:
            best_sc = np.asarray(jnp.max(
                jnp.where(fm.kept, st["score3d"], 0.0), axis=-1))
            strong_node = best_sc[(nodes // S).astype(np.int64),
                                  (nodes % S).astype(np.int64)] \
                >= cfg.cluster_strong_min
            labels = clustering_ops.cluster_edges_anchored(
                ei, ej, ew, len(nodes), strong_node, cfg.felzenszwalb_c)
        else:
            labels = clustering_ops.cluster_edges(
                ei, ej, ew, len(nodes), cfg.felzenszwalb_c)

        # --- group nodes into clusters with >= visibility distinct cameras ---
        node_view = (nodes // S).astype(np.int32)
        node_seg = (nodes % S).astype(np.int32)
        uniq_labels, label_inv = np.unique(labels, return_inverse=True)
        n_clusters = len(uniq_labels)
        # distinct cams per cluster
        pairs = np.unique(np.stack([label_inv, node_view], 1), axis=0)
        cams_per_cluster = np.bincount(pairs[:, 0], minlength=n_clusters)
        keep_cluster = cams_per_cluster >= visibility
        cluster_remap = np.cumsum(keep_cluster) - 1
        member_ok = keep_cluster[label_inv]

        mc = cluster_remap[label_inv[member_ok]].astype(np.int32)   # member cluster
        mv = node_view[member_ok]
        ms = node_seg[member_ok]
        C = int(keep_cluster.sum())
        if self._cluster_records is not None:
            # opt-in diagnostics: record the visibility-dropped clusters
            # (tools/diag_lost_clusters.py)
            for lab in np.where(~keep_cluster)[0]:
                mem = nodes[label_inv == lab]
                self._cluster_records.append(
                    {"outcome": "visibility", "nodes": mem.copy()})
        if C == 0:
            self.lines3d = []
            return self.lines3d

        # --- device: batched line fit from member hypothesis endpoints ---
        estP1 = np.asarray(fm.est_P1)
        estP2 = np.asarray(fm.est_P2)
        pts = np.concatenate([estP1[mv, ms], estP2[mv, ms]], axis=0)
        pt_cluster = np.concatenate([mc, mc])
        lines = fitting_ops.fit_lines_np(pts, pt_cluster, C)
        lineP1 = np.asarray(lines.P1)
        lineP2 = np.asarray(lines.P2)
        line_dir = lineP2 - lineP1
        line_dir /= np.maximum(np.linalg.norm(line_dir, axis=-1, keepdims=True), EPS)

        # split clusters whose member hypotheses are bimodal across the
        # fitted line (close parallel structure lines merged by noisy
        # estimates; see tools/diag_bridge_geometry.py) — the reference's
        # sharper estimates keep these apart in the graph itself
        if cfg.split_bimodal_t > 0:
            m_score = None
            if cfg.split_strong_min > 0 and "score3d" in st:
                best = np.asarray(jnp.max(
                    jnp.where(fm.kept, st["score3d"], 0.0), axis=-1))
                m_score = best[mv, ms]
            mc, C, lineP1, lineP2, line_dir = self._split_bimodal_clusters(
                mc, mv, ms, C, lineP1, line_dir, estP1, estP2, st,
                visibility, cfg.split_bimodal_t, m_score=m_score,
                strong_min=cfg.split_strong_min)

        # optional bundling of the cluster lines (reference: optimization.cc)
        if cfg.optimize:
            lineP1, lineP2, line_dir = self._optimize_lines(
                lineP1, lineP2, mc, mv, ms, C, st)

        # --- device: project member segments onto their cluster lines ---
        r1 = np.asarray(st["r1"])
        r2 = np.asarray(st["r2"])
        s1, s2, ok = fitting_ops.project_members_onto_lines_np(
            lineP1[mc], line_dir[mc], cb.C[mv], r1[mv, ms], r2[mv, ms],
        )

        # --- host: interval sweep (line3D.cc:2342-2452), flat arrays ---
        iv_c, iv_sa, iv_sb = sweep_ops.sweep_all_flat(
            mc, s1, s2, ok, mv, C, visibility)

        # reference view per cluster = camera of longest member 2D segment
        # (line3D.cc:2183-2189); per-cluster argmax via lexsort (first member
        # wins ties, matching the sequential strict-> scan)
        seg2d = st["segs"]
        lens2d = np.hypot(
            seg2d[mv, ms, 2] - seg2d[mv, ms, 0], seg2d[mv, ms, 3] - seg2d[mv, ms, 1]
        )
        ref_view = np.zeros(C, np.int32)
        o_rv = np.lexsort((-np.arange(len(mc)), lens2d, mc))
        ref_view[mc[o_rv]] = mv[o_rv]  # last write per cluster = argmax

        # --- assemble + tiny-segment filter (line3D.cc:2302-2339), batched
        # (reference OpenMP's this loop, line3D.cc:2278-2299; here the
        # projections and interval->3D math are single numpy ops) ---
        translation = st["translation"]
        cams = st["cams"]
        lines_out: list[FinalLine3D] = []
        order = np.argsort(mc, kind="stable")
        bounds = np.searchsorted(mc[order], np.arange(C + 1))

        # interval endpoints back to original world coordinates (untranslate,
        # line3D.cc:539-545), all intervals at once
        d_iv = line_dir[iv_c]
        Pa = lineP1[iv_c] + iv_sa[:, None] * d_iv + translation
        Pb = lineP1[iv_c] + iv_sb[:, None] * d_iv + translation

        # tiny filter: projected length in each cluster's reference view
        rv = ref_view[iv_c]
        Rs = np.stack([cam.R for cam in cams])
        ts_ = np.stack([cam.t for cam in cams])
        Ks = np.stack([cam.K for cam in cams])
        diags = np.array([cam.diagonal for cam in cams])

        def _proj(P: np.ndarray) -> np.ndarray:
            q = np.einsum("nij,nj->ni", Rs[rv], np.asarray(P, np.float64))
            q += ts_[rv]
            q = q / q[:, 2:3]
            uv = np.einsum("nij,nj->ni", Ks[rv], q)
            return uv[:, :2] / uv[:, 2:3]

        if len(iv_c):
            lens_uv = np.linalg.norm(_proj(Pa) - _proj(Pb), axis=-1)
        else:
            lens_uv = np.zeros(0)
        iv_keep = lens_uv > diags[rv] * cfg.min_line_length_factor

        # residual rows for every member at once: [camID segID p q]
        res_all = np.column_stack([
            np.asarray(cam_ids, np.float64)[mv], ms.astype(np.float64),
            seg2d[mv, ms].astype(np.float64)])

        seg_rows = np.concatenate([Pa, Pb], axis=1)[iv_keep]
        kc = iv_c[iv_keep]          # already ascending (sweep order)
        kbounds = np.searchsorted(kc, np.arange(C + 1))
        swept_counts = np.bincount(iv_c, minlength=C)
        kept_counts = np.bincount(kc, minlength=C)
        emit = kept_counts > 0
        # exclusive prefix = len(lines_out) at the time each cluster is seen
        line_idx = np.cumsum(emit) - emit

        if self._cluster_records is not None:
            for c in range(C):
                members = order[bounds[c]: bounds[c + 1]]
                outcome = ("emitted" if emit[c]
                           else "tiny" if swept_counts[c] else "sweep-empty")
                self._cluster_records.append({
                    "outcome": outcome,
                    "nodes": (mv[members].astype(np.int64) * S + ms[members]),
                    "line_idx": int(line_idx[c])})

        for c in np.flatnonzero(emit):
            members = order[bounds[c]: bounds[c + 1]]
            lines_out.append(FinalLine3D(
                seg_rows[kbounds[c]: kbounds[c + 1]], res_all[members]))

        self.lines3d = lines_out
        return lines_out

    # ------------------------------------------------------------------
    def _split_bimodal_clusters(self, mc, mv, ms, C, lineP1, line_dir,
                                estP1, estP2, st, visibility, gap_t,
                                max_depth: int = 2, m_score=None,
                                strong_min: float = 0.0):
        """Split clusters whose members are bimodal in signed perpendicular
        offset from the fitted 3D line (in sigma = k * depth units, the
        affinity's pixel-equivalent scale).

        Close parallel structure lines (median separation ~3.8 px on the
        golden testdata) merge when triangulation noise smears the best
        hypotheses toward each other; the merged cluster's members still
        carry the side information in their perpendicular offsets.  A
        cluster is split at the largest inter-member gap when that gap is
        >= ``gap_t`` sigma and BOTH sides retain >= ``visibility`` distinct
        cameras (a failed side would be dropped by the reference's
        visibility filter anyway, so we keep the cluster whole instead).
        No reference counterpart: this compensates estimate-noise relative
        to the reference (tools/diag_smear_cases.py), not a new feature.

        ``strong_min`` > 0 restricts the split DECISION (principal axis,
        Otsu gates, visibility) to members whose best match score is at
        least that value — score ~ number of confirming cameras, so 3.0
        means 3-camera-confirmed estimates.  Merged bundles carry a fog of
        1-2-camera members with large depth errors (tools/
        diag_bridge_classes.py) that previously dominated the PCA axis and
        masked the lateral core separation; strong members expose it.
        Weak members are then assigned to the nearer mode.
        """
        from ..ops import fitting as fitting_ops

        k_reg = np.asarray(st["cb"].k_reg)
        cam_C = np.asarray(st["cb"].C)
        med_d = np.asarray(st["median_depth"])

        pm = 0.5 * (estP1[mv, ms] + estP2[mv, ms])         # (m, 3) midpoints
        depth = np.linalg.norm(pm - cam_C[mv], axis=1)
        sigma = np.maximum(k_reg[mv] * np.minimum(depth, med_d[mv]), EPS)

        order = np.argsort(mc, kind="stable")
        bounds = np.searchsorted(mc[order], np.arange(C + 1))

        new_mc = mc.copy()
        lineP2 = lineP1 + 2.0 * line_dir       # fit convention: cog +- dir
        next_id = C
        dbg = {"small": 0, "delta": 0, "ashman": 0, "vis": 0, "split": 0}
        stack = [(c, order[bounds[c]: bounds[c + 1]], 0) for c in range(C)]
        while stack:
            c, idx, depth_lvl = stack.pop()
            if len(idx) < 4 or depth_lvl >= max_depth:
                dbg["small"] += depth_lvl == 0
                continue
            if strong_min > 0 and m_score is not None:
                strong = idx[m_score[idx] >= strong_min]
                if len(strong) < 4:
                    dbg["small"] += depth_lvl == 0
                    continue
            else:
                strong = idx
            d = line_dir[c]
            w = pm[strong] - lineP1[c]
            perp = w - (w @ d)[:, None] * d[None, :]
            # principal perpendicular axis of the (strong) offsets
            cov = perp.T @ perp
            _, vecs = np.linalg.eigh(cov)
            u = vecs[:, -1]
            w_all = pm[idx] - lineP1[c]
            perp_all = w_all - (w_all @ d)[:, None] * d[None, :]
            s_all = (perp_all @ u) / sigma[idx]
            s = (perp @ u) / sigma[strong]
            o2 = np.argsort(s)
            ss = s[o2]
            n = len(ss)
            # Otsu-style 2-means: split maximizing between-class variance;
            # accept when the mode-mean separation >= gap_t sigma (a
            # unimodal Gaussian yields ~1.6 std < gap_t, so pure noise
            # does not split)
            csum = np.cumsum(ss)
            csq = np.cumsum(ss * ss)
            kk = np.arange(1, n)
            mean_lo = csum[:-1] / kk
            mean_hi = (csum[-1] - csum[:-1]) / (n - kk)
            delta = mean_hi - mean_lo
            bcv = kk * (n - kk) * delta * delta
            g = int(np.argmax(bcv))
            split_t = 0.5 * (mean_lo[g] + mean_hi[g])
            if strong_min > 0 and m_score is not None:
                # assign ALL members (incl. weak) by the strong-mode midpoint
                lo_all = idx[s_all <= split_t]
                hi_all = idx[s_all > split_t]
            else:
                # legacy mode (no strong gating): rank split at the Otsu cut
                # so every member lands on its own side — the midpoint can
                # fall outside (ss[g], ss[g+1]) for asymmetric modes and
                # would silently reassign members vs the round-2 tuning
                lo_all = strong[o2[: g + 1]]
                hi_all = strong[o2[g + 1:]]
            rec = None
            if self._split_records is not None and delta[g] >= 0.5:
                lo_r, hi_r = lo_all, hi_all
                var_lo_r = max(csq[g] / (g + 1) - mean_lo[g] ** 2, 0.0)
                var_hi_r = max((csq[-1] - csq[g]) / (n - g - 1)
                               - mean_hi[g] ** 2, 0.0)
                rec = {"delta": float(delta[g]),
                       "D": float(delta[g] / max(np.sqrt(
                           0.5 * (var_lo_r + var_hi_r)), EPS)),
                       "n": n, "lvl": depth_lvl,
                       "lo": (mv[lo_r].copy(), ms[lo_r].copy()),
                       "hi": (mv[hi_r].copy(), ms[hi_r].copy()),
                       "applied": False}
                self._split_records.append(rec)
            if delta[g] < gap_t:
                dbg["delta"] += 1
                continue
            # Ashman's D: the modes must also be separated relative to
            # their within-mode spread (D >= 2 ~ clean bimodality); a
            # smeared unimodal cluster can reach delta ~1.6 std but its
            # within-mode variance stays high, failing this gate
            # cancellation can drive the variances a hair negative for
            # near-identical offsets; clamp so D stays finite (NaN would
            # silently pass the gate)
            var_lo = max(csq[g] / (g + 1) - mean_lo[g] ** 2, 0.0)
            var_hi = max((csq[-1] - csq[g]) / (n - g - 1)
                         - mean_hi[g] ** 2, 0.0)
            D = delta[g] / max(np.sqrt(0.5 * (var_lo + var_hi)), EPS)
            if D < 2.0:
                dbg["ashman"] += 1
                continue
            lo, hi = lo_all, hi_all
            # visibility gate on STRONG members per side when gating is on:
            # a mode is only real if >= visibility cameras confirm it well
            vis_lo = strong[s <= split_t] if strong_min > 0 else lo
            vis_hi = strong[s > split_t] if strong_min > 0 else hi
            if (len(np.unique(mv[vis_lo])) < visibility
                    or len(np.unique(mv[vis_hi])) < visibility
                    or not len(lo) or not len(hi)):
                dbg["vis"] += 1
                continue
            dbg["split"] += 1
            if rec is not None:
                rec["applied"] = True
            # split: high side becomes a new cluster; refit both
            new_mc[hi] = next_id
            for part in (lo, hi):
                pts_p = np.concatenate([estP1[mv[part], ms[part]],
                                        estP2[mv[part], ms[part]]], axis=0)
                lf = fitting_ops.fit_lines_np(
                    pts_p, np.zeros(len(pts_p), np.int32), 1)
                P1p, P2p = np.asarray(lf.P1)[0], np.asarray(lf.P2)[0]
                dp = P2p - P1p
                dp /= max(np.linalg.norm(dp), EPS)
                cid = c if part is lo else next_id
                if cid == next_id:
                    lineP1 = np.concatenate([lineP1, P1p[None]], axis=0)
                    lineP2 = np.concatenate([lineP2, P2p[None]], axis=0)
                    line_dir = np.concatenate([line_dir, dp[None]], axis=0)
                else:
                    lineP1[cid] = P1p
                    lineP2[cid] = P2p
                    line_dir[cid] = dp
                stack.append((cid, part, depth_lvl + 1))
            next_id += 1

        if os.environ.get("L3D_SPLIT_DEBUG"):
            print(f"[L3D-TPU] bimodal split: {dbg}", flush=True)
        return new_mc, next_id, lineP1, lineP2, line_dir

    # ------------------------------------------------------------------
    def _optimize_lines(self, lineP1, lineP2, mc, mv, ms, C, st):
        """Bundle the cluster lines (Ceres-equivalent batched LM).
        Implemented in ops/bundling.py; reference: optimization.cc:8-303."""
        from ..ops import bundling as bundling_ops

        return bundling_ops.optimize_cluster_lines(
            lineP1, lineP2, mc, mv, ms, C, st, self.config)

    # ------------------------------------------------------------------
    def _visual_neighbors(self, cam_ids, cams, N) -> dict[int, list[int]]:
        """Worldpoint-overlap neighbor selection with baseline-diversity
        re-ranking (reference: findVisualNeighborsFromWPs line3D.cc:578-699),
        or fixed lists when provided (line3D.cc:230-246).

        All pairwise quantities are vectorized (the overlap counts as one
        sparse view x worldpoint matmul, the geometry as batched numpy) so
        setup stays sub-quadratic-ish at thousands of views; only the final
        per-view top-N rerank — O(candidates) each — runs in Python.  Ties
        in the score sort break by ascending target index (deterministic)."""
        out: dict[int, list[int]] = {}
        V = len(cam_ids)
        have_wps = all(self._views[c].worldpoints is not None for c in cam_ids)
        todo = [i for i, c in enumerate(cam_ids)
                if c not in self._fixed_neighbors]
        for c in cam_ids:
            if c in self._fixed_neighbors:
                out[c] = [n for n in self._fixed_neighbors[c]
                          if n in self._views]
        if not todo:
            return out

        C = np.stack([cam.C for cam in cams])                    # (V, 3)

        if not have_wps:
            # geometric fallback: nearest cameras by center distance
            # (chunked so the distance matrix never exceeds ~chunk*V)
            todo_set = set(todo)
            for start in range(0, V, 512):
                idx = np.arange(start, min(start + 512, V))
                d = np.linalg.norm(C[idx, None, :] - C[None, :, :], axis=2)
                d[np.arange(len(idx)), idx] = np.inf
                order = np.argsort(d, axis=1, kind="stable")[:, :N]
                for r, i in enumerate(idx):
                    if i in todo_set:
                        out[cam_ids[i]] = [cam_ids[j] for j in order[r]
                                           if np.isfinite(d[r, j])]
            return out

        # ---- worldpoint-overlap counts: one sparse matmul ----
        import scipy.sparse as sp

        wp_index: dict = {}
        rows, cols = [], []
        for i, c in enumerate(cam_ids):
            for wp in self._views[c].worldpoints:
                cols.append(wp_index.setdefault(wp, len(wp_index)))
                rows.append(i)
        nwp = np.array([len(self._views[c].worldpoints) for c in cam_ids],
                       np.float64)
        A = sp.csr_matrix(
            (np.ones(len(rows), np.int64), (rows, cols)),
            shape=(V, max(len(wp_index), 1)))
        common = sp.triu(A @ A.T, k=1).tocoo()   # symmetric; keep i < j once
        i_ = np.concatenate([common.row, common.col])
        j_ = np.concatenate([common.col, common.row])
        n_ = np.concatenate([common.data, common.data]).astype(np.float64)

        # ---- batched candidate filters/scores (line3D.cc:620-636) ----
        axes = np.stack([cam.optical_axis() for cam in cams])    # (V, 3)
        R = np.stack([cam.R for cam in cams])
        t = np.stack([cam.t for cam in cams])
        dot = np.clip(np.sum(axes[i_] * axes[j_], axis=1), -1.0, 1.0)
        keep = (np.arccos(dot) < 1.571) & (n_ > 4)
        i_, j_, n_ = i_[keep], j_[keep], n_[keep]

        score = 2.0 * n_ / (nwp[i_] + nwp[j_])
        Ct = np.einsum("pab,pb->pa", R[i_], C[j_]) + t[i_]
        dist_score = np.abs(Ct[:, 0]) + np.abs(Ct[:, 1])
        baseline_ok = np.linalg.norm(C[i_] - C[j_], axis=1) > 0.1

        # sort all candidates by (row, -score, target) and slice per row
        order = np.lexsort((j_, -score, i_))
        i_, j_ = i_[order], j_[order]
        score, dist_score = score[order], dist_score[order]
        baseline_ok = baseline_ok[order]
        starts = np.searchsorted(i_, np.arange(V + 1))

        # ---- per-view top-N with baseline-diversity rerank ----
        for ci in todo:
            lo, hi = starts[ci], starts[ci + 1]
            cand = list(zip(score[lo:hi], dist_score[lo:hi],
                            j_[lo:hi], baseline_ok[lo:hi]))
            if len(cand) > N:
                score_t = 0.80 * cand[0][0]
                big = [x for x in cand if x[0] > score_t]
                big.sort(key=lambda x: -x[1])
                merged = big[: N // 2] + cand
            else:
                merged = cand
            used: list[int] = []
            for _, _, vj, bok in merged:
                if len(used) >= N:
                    break
                v2_id = cam_ids[vj]
                if v2_id not in used and bok:
                    used.append(v2_id)
            out[cam_ids[ci]] = used
        return out

    # ------------------------------------------------------------------
    # output writers (reference: line3D.cc:2465-2711)
    # ------------------------------------------------------------------
    def save_txt(self, path: str) -> None:
        save_txt(path, self.lines3d)

    def save_stl(self, path: str) -> None:
        save_stl(path, self.lines3d)

    def save_obj(self, path: str) -> None:
        save_obj(path, self.lines3d)

    def save_bin(self, path: str, fmt: str = "boost") -> None:
        """Save the final model as ``.bin``.

        ``fmt="boost"`` (default) writes the reference's boost binary
        archive of ``std::vector<FinalLine3D>`` (save3DLinesAsBIN
        line3D.cc:2690-2711) so downstream Line3D++ tooling can consume
        the file directly; ``fmt="npz"`` writes the compressed numpy
        archive (carries the 2D residual endpoint coordinates, which the
        boost format omits)."""
        if fmt == "boost":
            from ..utils.ref_bin import save_bin_boost
            save_bin_boost(path, self.lines3d)
        elif fmt == "npz":
            save_bin(path, self.lines3d)
        else:
            raise ValueError(f"unknown bin format {fmt!r}")
