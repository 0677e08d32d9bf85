"""Second-scene acceptance check: a rendered synthetic facade, scored
against known ground-truth 3D lines, across the config axes that were
tuned on the golden testdata.

Purpose (VERDICT r2 #5): prove the testdata-tuned thresholds —
``split_bimodal_t`` (cluster bimodal splitting) and ``match_symmetrization``
(ordered back-edges) — are properties of the geometry, not overfits to the
bundled testdata.  The scene deliberately contains the failure mode those
knobs target: nested window frames project to CLOSE PARALLEL line pairs
(separation below the 1%-scene-scale tolerance ball) next to isolated
long edges.

Unlike tools/drive_synthetic.py (which injects perfect 2D segments), this
runs the FULL pipeline: images are rendered (filled dark quads on a noisy,
shaded background, 2x supersampled), LSD detection runs for real, and the
reconstruction is scored with the same maximum 1-1 line matching used
against the reference golden (utils/golden.line_match_metrics).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/validate_scene2.py [--cpu] [--quick]
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_l3d")

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy
from line3dpp_tpu.utils.golden import (line_match_metrics, scene_scale,
                                       segment_set_metrics)

W, H = 1024, 768
SS = 2                     # supersampling factor


# ---------------------------------------------------------------------------
# scene: a facade (z = 10 plane) with nested window frames + long edges
# ---------------------------------------------------------------------------
def build_scene():
    """Returns (filled_quads, gt_segments): dark quads in world space (each
    a (4, 3) corner array, drawn filled) and the ground-truth 3D boundary
    segments (n, 6) they produce."""
    quads = []
    gt = []

    def rect_quad(cx, cy, hw, hh, z=10.0):
        return np.array([[cx - hw, cy - hh, z], [cx + hw, cy - hh, z],
                         [cx + hw, cy + hh, z], [cx - hw, cy + hh, z]])

    def rect_edges(q):
        return [np.concatenate([q[i], q[(i + 1) % 4]]) for i in range(4)]

    # window frames: dark RING (outer minus inner) -> both boundaries are
    # ground-truth lines; ring width 0.08 world units ~ separation below
    # the 1%-scene-scale tol ball (the parallel-close bundle probe)
    ring = 0.08
    for gx in range(4):
        for gy in range(2):
            cx = -3.0 + 2.0 * gx
            cy = -1.1 + 2.2 * gy
            outer = rect_quad(cx, cy, 0.55, 0.75)
            inner = rect_quad(cx, cy, 0.55 - ring, 0.75 - ring)
            # render: dark outer quad with a light inner quad on top
            quads.append(("dark", outer))
            quads.append(("light", inner))
            gt += rect_edges(outer) + rect_edges(inner)

    # long horizontal bars (roof + base) and one diagonal brace
    roof = rect_quad(0.0, 2.35, 4.2, 0.12)
    base = rect_quad(0.0, -2.35, 4.2, 0.12)
    quads += [("dark", roof), ("dark", base)]
    gt += rect_edges(roof) + rect_edges(base)

    # diagonal brace in the horizontal band BETWEEN the window rows (no
    # crossings: a crossing fragments edges in 2D and the granularity
    # noise would confound the split/symmetrization comparison)
    th = np.deg2rad(4.0)
    dvec = np.array([np.cos(th), np.sin(th), 0.0])
    perp = np.array([-np.sin(th), np.cos(th), 0.0]) * 0.07
    c0 = np.array([-3.6, -0.22, 10.0])
    brace = np.stack([c0 - perp, c0 + 7.0 * dvec - perp,
                      c0 + 7.0 * dvec + perp, c0 + perp])
    quads.append(("dark", brace))
    gt.append(np.concatenate([brace[0], brace[1]]))
    gt.append(np.concatenate([brace[3], brace[2]]))

    return quads, np.stack(gt)


def make_cameras(V=10, seed=11):
    rng = np.random.default_rng(seed)
    K = np.array([[900.0, 0, W / 2], [0, 900.0, H / 2], [0, 0, 1]])
    cams = []
    for i in range(V):
        # slanted track: baseline has both x and y components so neither
        # horizontal nor vertical facade edges are epipolar-degenerate.
        # The track SPAN is V-independent (t in [0, 9] regardless of V):
        # at V=6 the old 0.55*i stepping covered only the left half of
        # the facade and --quick reconstructed almost nothing (7 lines /
        # recall 0.004, round-5 finding); V=10 reproduces the documented
        # SECOND_SCENE.md geometry exactly.
        t = 9.0 * i / max(V - 1, 1)
        C = np.array([-2.7 + 0.55 * t, -0.9 + 0.22 * t + rng.normal() * 0.1,
                      rng.normal() * 0.25])
        yaw = -0.05 * (t - 5.0) + rng.normal() * 0.01
        pitch = 0.02 * (t - 5.0) + rng.normal() * 0.01
        R = rotation_from_rpy(pitch, yaw, rng.normal() * 0.01)
        cams.append(l3d.Camera(K, R, -R @ C, W, H))
    return cams


def render(cam, quads, seed):
    """Rasterize filled quads with 2x supersampling onto a noisy, shaded
    background; returns a uint8 grayscale image."""
    rng = np.random.default_rng(seed)
    ws, hs = W * SS, H * SS
    Ks = cam.K.copy()
    Ks[:2] *= SS
    scam = l3d.Camera(Ks, cam.R, cam.t, ws, hs)

    xx, yy = np.meshgrid(np.arange(ws) + 0.5, np.arange(hs) + 0.5)
    # smooth illumination gradient + texture noise
    img = (205.0 - 18.0 * (xx / ws) - 10.0 * (yy / hs)
           + rng.normal(scale=3.5, size=(hs, ws)))

    for kind, q in quads:
        pts = scam.project(q)                            # (4, 2)
        inside = np.ones((hs, ws), bool)
        for i in range(4):
            a, b = pts[i], pts[(i + 1) % 4]
            cross = ((b[0] - a[0]) * (yy - a[1])
                     - (b[1] - a[1]) * (xx - a[0]))
            inside &= cross > 0
        if kind == "dark":
            img[inside] = 52.0 + rng.normal(scale=2.5, size=int(inside.sum()))
        else:
            img[inside] = (205.0 - 18.0 * (xx / ws) - 10.0 * (yy / hs)
                           + rng.normal(scale=3.5, size=(hs, ws)))[inside]

    img = img.reshape(H, SS, W, SS).mean(axis=(1, 3))
    return np.clip(img, 0, 255).astype(np.uint8)


def run_config(images, cams, split_t, sym, optimize=False):
    cfg = l3d.Config(num_neighbors=6, optimize=optimize,
                     split_bimodal_t=split_t, match_symmetrization=sym)
    pipe = l3d.Line3D(cfg)
    # the segment cache is keyed (cam_id, WxH, max_segs) like the
    # reference's (line3D.cc:296-309) — NOT by pose — so a fixed dir
    # poisons runs after any camera/geometry change (round-5 finding:
    # --quick silently scored stale V=10 detections at recall 0.004).
    # Key the dir on the full camera geometry instead.
    import hashlib
    geo = hashlib.sha256(
        np.concatenate([np.ravel(a) for c in cams
                        for a in (c.K, c.R, c.t)]).tobytes()).hexdigest()[:12]
    pipe.add_images([(i, cam, img) for i, (cam, img)
                     in enumerate(zip(cams, images))],
                    cache_dir=f"/tmp/scene2_cache_{geo}")  # share detections
    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    return lines


def main():
    quick = "--quick" in sys.argv
    quads, gt = build_scene()
    cams = make_cameras(V=6 if quick else 10)
    t0 = time.time()
    images = [render(c, quads, seed=100 + i) for i, c in enumerate(cams)]
    print(f"rendered {len(images)} views in {time.time() - t0:.1f}s "
          f"({len(gt)} ground-truth lines)", flush=True)

    tol = 0.01 * scene_scale(gt)
    gold_lines = [gt[i:i + 1] for i in range(len(gt))]

    configs = [(0.0, "ordered"), (1.1, "ordered"),
               (0.0, "full"), (1.1, "full")]
    rows = []
    for split_t, sym in configs:
        t0 = time.time()
        lines = run_config(images, cams, split_t, sym)
        pred_segs = (np.concatenate([l.segments3d for l in lines])
                     if lines else np.zeros((0, 6)))
        pred_lines = [l.segments3d for l in lines]
        sm = segment_set_metrics(pred_segs, gt, tol=tol)
        lm = line_match_metrics(pred_lines, gold_lines, tol=tol)
        rows.append((split_t, sym, len(lines), sm, lm, time.time() - t0))
        print(f"split={split_t:<4} sym={sym:<8} lines={len(lines):<4} "
              f"recall={sm['recall']:.3f} precision={sm['precision']:.3f} "
              f"count_f1={lm['count_f1']:.3f}  ({rows[-1][5]:.0f}s)",
              flush=True)

    print("\n| split_bimodal_t | symmetrization | lines | recall | "
          "precision | count_f1 |")
    print("|---|---|---|---|---|---|")
    for split_t, sym, n, sm, lm, _ in rows:
        print(f"| {split_t} | {sym} | {n} | {sm['recall']:.3f} | "
              f"{sm['precision']:.3f} | {lm['count_f1']:.3f} |")
    return rows


if __name__ == "__main__":
    main()
