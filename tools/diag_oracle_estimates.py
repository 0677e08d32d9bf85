"""Oracle-estimate ceiling experiment (VERDICT r3 next-step #1).

Question: if our per-segment best-hypothesis 3D estimates were PERFECTLY
sharp — lying exactly on the reference's final 3D lines — would the merged
parallel bundles split, and what count-F1 would the unchanged downstream
(affinity > 0.5, union-find c=3, fit, sweep) deliver?

Method: map every estimated segment to its golden line via the golden TXT's
2D residuals (reference README.md:272-277), project its hypothesis endpoints
onto that golden line ("oracle"), blend est' = est + a*(oracle - est) for
a in {0, 0.25, 0.5, 0.75, 1.0}, recompute the dense affinity with the SAME
code path (ops/affinity.affinity_dense), rerun reconstruction, and score.

Also reports, at a=0: the perpendicular-error distribution of our estimates
vs their golden lines, split by whether the segment sits in a merged
cluster, and the cross-line vs same-line edge survival under the oracle.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_oracle_estimates.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import jax.numpy as jnp

import line3dpp_tpu as l3d
from line3dpp_tpu.ops import affinity as affinity_ops
from line3dpp_tpu.utils.golden import (line_match_metrics, parse_lines3d_txt,
                                       scene_scale, stack_golden_segments)
from tools.diag_cluster_split import (CAMS, CACHE, GOLDEN, IMG_DIR,
                                      map_nodes_to_golden)


def golden_line_geometry(gold_lines, translation):
    """(n_g, 3) point + (n_g, 3) unit dir of each golden infinite line, in
    the pipeline's centered frame."""
    A = np.zeros((len(gold_lines), 3))
    D = np.zeros((len(gold_lines), 3))
    for gi, g in enumerate(gold_lines):
        segs = g.segments3d                       # (n, 6) world coords
        lens = np.linalg.norm(segs[:, 3:] - segs[:, :3], axis=1)
        s = segs[np.argmax(lens)]
        d = s[3:] - s[:3]
        D[gi] = d / max(np.linalg.norm(d), 1e-12)
        A[gi] = s[:3] - translation
    return A, D


def main():
    from PIL import Image

    cams_j = json.load(open(CAMS))
    cfg = l3d.Config()
    pipe = l3d.Line3D(cfg)
    for cam_id in sorted(cams_j, key=int):
        c = cams_j[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    print("matched", flush=True)

    st = pipe._last_state
    cfg = pipe.config
    fm0 = st["fm"]
    aff0 = st["aff"]
    cb = st["cb"]
    V, S = st["mask"].shape
    cam_ids = sorted(pipe._views)
    gold_lines = parse_lines3d_txt(GOLDEN)
    gold = stack_golden_segments(gold_lines)
    tol = 0.01 * scene_scale(gold)

    est_valid = np.asarray(fm0.est_valid)
    nodes = np.where(est_valid.reshape(-1))[0]
    node_gold, node_cov = map_nodes_to_golden(st, nodes, cam_ids, gold_lines)
    mapped = node_gold >= 0
    print(f"estimated segments: {len(nodes)}, mapped to a golden line: "
          f"{mapped.sum()} ({mapped.mean()*100:.0f}%)", flush=True)

    A, D = golden_line_geometry(gold_lines, st["translation"])

    # oracle endpoint projections for mapped nodes
    estP1 = np.asarray(fm0.est_P1).reshape(-1, 3).copy()
    estP2 = np.asarray(fm0.est_P2).reshape(-1, 3).copy()
    nm = nodes[mapped]
    gi = node_gold[mapped]
    for P in (estP1, estP2):
        w = P[nm] - A[gi]
        t = np.einsum("ij,ij->i", w, D[gi])
        proj = A[gi] + t[:, None] * D[gi]
        if P is estP1:
            perr1 = np.linalg.norm(P[nm] - proj, axis=1)
        else:
            perr2 = np.linalg.norm(P[nm] - proj, axis=1)

    perr = 0.5 * (perr1 + perr2)
    k_reg = np.asarray(cb.k_reg)
    camC = np.asarray(cb.C)
    depths = np.linalg.norm(
        0.5 * (estP1[nm] + estP2[nm]) - camC[nm // S], axis=1)
    sigma = k_reg[nm // S] * depths
    print(f"\nper-segment estimate perpendicular error to assigned golden "
          f"line (tol={tol:.4f}):")
    for q in (50, 75, 90, 95, 99):
        print(f"  p{q}: {np.percentile(perr, q):.4f}  "
              f"(in sigma units: {np.percentile(perr / sigma, q):.2f})")

    # ---- blend sweep ----
    meds = np.sort(st["median_depth"][st["median_depth"] > 1e-12])
    med_scene = float(meds[len(meds) // 2]) if len(meds) else 0.0

    def oracle_tables(alpha):
        P1 = np.asarray(fm0.est_P1).reshape(-1, 3).copy()
        P2 = np.asarray(fm0.est_P2).reshape(-1, 3).copy()
        for P in (P1, P2):
            w = P[nm] - A[gi]
            t = np.einsum("ij,ij->i", w, D[gi])
            proj = A[gi] + t[:, None] * D[gi]
            P[nm] = P[nm] + alpha * (proj - P[nm])
        d1 = np.linalg.norm(P1 - camC[np.arange(V * S) // S], axis=1)
        d2 = np.linalg.norm(P2 - camC[np.arange(V * S) // S], axis=1)
        return (P1.reshape(V, S, 3).astype(np.float32),
                P2.reshape(V, S, 3).astype(np.float32),
                d1.reshape(V, S).astype(np.float32),
                d2.reshape(V, S).astype(np.float32))

    results = {}
    for alpha in (0.0, 0.25, 0.5, 0.75, 1.0):
        P1, P2, d1, d2 = oracle_tables(alpha)
        fm2 = fm0._replace(est_P1=jnp.asarray(P1), est_P2=jnp.asarray(P2),
                           est_d1=jnp.asarray(d1), est_d2=jnp.asarray(d2))
        aff2 = affinity_ops.affinity_dense(
            fm2, aff0.tgt_seg, jnp.asarray(st["neighbor_ids"]),
            jnp.asarray(cb.k_reg), jnp.asarray(st["median_depth"]),
            med_scene, cfg.two_sig_a_sqr, cfg.min_affinity)
        st["fm"] = fm2
        st["aff"] = aff2
        lines = pipe.reconstruct_3d_lines()
        lm = line_match_metrics([l.segments3d for l in lines],
                                [g.segments3d for g in gold_lines], tol=tol)
        n_edges = int(np.asarray(aff2.edge_valid).sum())
        results[alpha] = (len(lines), lm, n_edges)
        print(f"alpha={alpha:<5} lines={len(lines):<5} edges={n_edges:<7} "
              f"count_f1={lm['count_f1']:.4f} "
              f"(r={lm['count_recall']:.3f} p={lm['count_precision']:.3f})",
              flush=True)

    # restore
    st["fm"] = fm0
    st["aff"] = aff0

    print("\n| alpha | lines | edges | count_f1 | count_recall | "
          "count_precision |")
    print("|---|---|---|---|---|---|")
    for alpha, (n, lm, e) in results.items():
        print(f"| {alpha} | {n} | {e} | {lm['count_f1']:.4f} | "
              f"{lm['count_recall']:.4f} | {lm['count_precision']:.4f} |")


if __name__ == "__main__":
    main()
