"""Detection-level reachability of golden lines (follow-up to
diag_oracle_graph: removing ALL cross-line edges does not split the merged
bundles, so the count gap is not a clustering failure — this asks whether
our 2D DETECTIONS even contain the per-view support to reconstruct each
golden line as a separate 3D line).

For every golden line: in how many distinct views is at least one of its 2D
residuals (the reference's own member detections, golden TXT
README.md:272-277) covered by one of OUR detected segments (>=60% of the
residual's length within 4 px)?  A golden with < visibility_t (3) supported
views is UNREACHABLE for any clustering — the ceiling of count_recall given
our detector output.  Cross-tabbed against the maximum-matching outcome of
the actual reconstruction.

Also reports EXCLUSIVE support: a residual only counts if its covering
segment is not the covering segment of another golden's residual in the
same view (two parallel-close goldens sharing one detected 2D segment
cannot both be reconstructed).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_golden_support.py
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

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import (line_match_assignment,
                                       parse_lines3d_txt, scene_scale,
                                       stack_golden_segments)
from tools.diag_cluster_split import CAMS, CACHE, GOLDEN, IMG_DIR


def residual_coverage(res, ours, tol2d=4.0, nsamp=9):
    """cov[e, n]: fraction of golden residual e's samples within tol2d of
    OUR segment n.  res: (E, 4), ours: (n, 4)."""
    ts = np.linspace(0.0, 1.0, nsamp)
    p = (res[:, None, :2] * (1 - ts[:, None])[None]
         + res[:, None, 2:] * ts[:, None][None])          # (E, nsamp, 2)
    a = ours[:, :2]
    d = ours[:, 2:] - a
    len2 = np.maximum((d * d).sum(-1), 1e-12)
    w = p[:, :, None, :] - a[None, None]                  # (E, ns, n, 2)
    t = np.clip((w * d[None, None]).sum(-1) / len2[None, None], 0, 1)
    cl = a[None, None] + t[..., None] * d[None, None]
    dist = np.linalg.norm(p[:, :, None, :] - cl, axis=-1)  # (E, ns, n)
    return (dist < tol2d).mean(axis=1)                     # (E, n)


def main():
    from PIL import Image
    from collections import Counter

    cams_j = json.load(open(CAMS))
    pipe = l3d.Line3D(l3d.Config())
    for cam_id in sorted(cams_j, key=int):
        c = cams_j[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    gold_lines = parse_lines3d_txt(GOLDEN)
    cam_ids = sorted(pipe._views)
    cam_pos = {c: i for i, c in enumerate(cam_ids)}

    # group golden residuals per camera
    res_by_cam: dict[int, list] = {}
    for gi, g in enumerate(gold_lines):
        for r in g.residuals:
            res_by_cam.setdefault(int(r[0]), []).append((gi, r[2:6]))

    n_g = len(gold_lines)
    support = np.zeros((n_g, len(cam_ids)), bool)
    support_ex = np.zeros((n_g, len(cam_ids)), bool)
    for cam_id in cam_ids:
        rows = res_by_cam.get(int(cam_id), [])
        if not rows:
            continue
        res = np.array([r[1] for r in rows], float)
        gis = np.array([r[0] for r in rows])
        ours = np.asarray(pipe._views[cam_id].segments, float)
        cov = residual_coverage(res, ours)                 # (E, n)
        covered = cov >= 0.6
        best_seg = np.where(covered.any(1), cov.argmax(1), -1)
        v = cam_pos[cam_id]
        for e in range(len(res)):
            if best_seg[e] < 0:
                continue
            support[gis[e], v] = True
        # exclusive: our segment s belongs to the golden whose residual it
        # covers best; other goldens lose that segment
        owner = {}
        best_cov = {}
        for e in range(len(res)):
            s = best_seg[e]
            if s < 0:
                continue
            if cov[e, s] > best_cov.get(s, -1):
                best_cov[s] = cov[e, s]
                owner[s] = gis[e]
        for e in range(len(res)):
            s = best_seg[e]
            if s >= 0 and owner.get(s) == gis[e]:
                support_ex[gis[e], v] = True

    nsup = support.sum(1)
    nsup_ex = support_ex.sum(1)
    print("golden lines:", n_g)
    print("views-with-support histogram (any):",
          dict(sorted(Counter(np.minimum(nsup, 5)).items())),
          "(5 = >=5)")
    print("unreachable (any-support < 3):", int((nsup < 3).sum()))
    print("unreachable (exclusive-support < 3):", int((nsup_ex < 3).sum()))

    # actual reconstruction outcome
    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    gold = stack_golden_segments(gold_lines)
    tol = 0.01 * scene_scale(gold)
    assign = line_match_assignment(
        [l.segments3d for l in lines], [g.segments3d for g in gold_lines],
        tol=tol)
    matched = np.zeros(n_g, bool)
    matched[list(assign.keys())] = True
    print(f"\nreconstructed {len(lines)} lines; matched goldens: "
          f"{matched.sum()}/{n_g}")

    for name, sup in (("any", nsup), ("exclusive", nsup_ex)):
        tab = {}
        for m in (False, True):
            sel = matched == m
            tab[("matched" if m else "unmatched")] = {
                "<3 views": int((sup[sel] < 3).sum()),
                ">=3 views": int((sup[sel] >= 3).sum()),
            }
        print(f"\n{name}-support vs outcome: {tab}")
        reach = (sup >= 3)
        print(f"  ceiling count_recall ({name}): {reach.mean():.4f} "
              f"({int(reach.sum())}/{n_g})")


if __name__ == "__main__":
    main()
