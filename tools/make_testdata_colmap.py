"""Synthesize a COLMAP text model for the bundled testdata (VERDICT r3 #8).

The upstream `vsfm_result.nvm` is missing from the mounted testdata
(SURVEY.md §6), so the golden e2e runs with the *geometric* neighbor
fallback and the worldpoint-overlap neighbor path
(findVisualNeighborsFromWPs, line3D.cc:578-699) was never exercised
end-to-end.  This tool writes `testdata/colmap_model/{cameras,images,
points3D}.txt` from the resected cameras + worldpoints sampled along the
golden 3D lines, with projection-based track visibility — a realistic
sparse SfM model over the real 26 images that drives io/colmap.py AND the
worldpoint neighbor selection in CI (tests/test_colmap_worldpoints_e2e.py).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/make_testdata_colmap.py
"""
from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import parse_lines3d_txt

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG_DIR = "/root/reference/testdata"
GOLDEN = os.path.join(
    IMG_DIR, "Line3D++_ref",
    "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__vis_3.txt")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")
OUT = os.path.join(REPO, "testdata", "colmap_model")


def rotation_to_quaternion(R: np.ndarray) -> np.ndarray:
    """(w, x, y, z) of a rotation matrix (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                         (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    i = int(np.argmax(np.diag(R)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(R[i, i] - R[j, j] - R[k, k] + 1.0) * 2
    q = np.zeros(4)
    q[0] = (R[k, j] - R[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (R[j, i] + R[i, j]) / s
    q[1 + k] = (R[k, i] + R[i, k]) / s
    return q


def main():
    rng = np.random.default_rng(7)
    cams_j = json.load(open(CAMS))
    cams = {}
    for cam_id in sorted(cams_j, key=int):
        c = cams_j[cam_id]
        cams[int(cam_id)] = (l3d.Camera(
            np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
            c["width"], c["height"]), c["image"])

    # worldpoints: samples along the golden 3D segments (structure points a
    # real SfM run would triangulate on this scene), each remembering its
    # source golden line so its track can use that line's REAL covisibility
    # (the residual camera set the reference recorded for the line) instead
    # of frustum-only visibility — frustum tracks ignore occlusion and give
    # neighbor rankings ~5/10 off the true covisibility ranking
    gold = parse_lines3d_txt(GOLDEN)
    pts, src = [], []
    for gi, g in enumerate(gold):
        for s in g.segments3d:
            L = np.linalg.norm(s[3:] - s[:3])
            n = max(2, min(4, int(L / 0.2)))
            t = np.linspace(0.05, 0.95, n)
            pts.append(s[:3] + t[:, None] * (s[3:] - s[:3]))
            src.append(np.full(n, gi))
    X = np.concatenate(pts)
    src = np.concatenate(src)
    # subsample to a realistic sparse-model size
    sel = rng.permutation(len(X))[:6000]
    X, src = X[sel], src[sel]
    seen_cams = [np.unique(g.residuals[:, 0]).astype(int) for g in gold]

    # track = the source line's observing cameras, gated by the frustum and
    # thinned slightly to mimic matching dropout in real SfM tracks
    tracks = {i: [] for i in range(len(X))}      # wp -> [(img_id, p2d_idx)]
    obs = {cid: [] for cid in cams}              # img -> [(x, y, wp_id)]
    for cid, (cam, _) in cams.items():
        Xc = (cam.R @ X.T).T + cam.t
        z = Xc[:, 2]
        uv = (cam.K @ Xc.T).T
        uv = uv[:, :2] / np.maximum(uv[:, 2:3], 1e-9)
        ok = ((z > 0.1) & (uv[:, 0] >= 10) & (uv[:, 0] < cam.width - 10)
              & (uv[:, 1] >= 10) & (uv[:, 1] < cam.height - 10))
        ok &= np.array([cid in seen_cams[g] for g in src])
        ok &= rng.random(len(X)) < 0.85
        for wp in np.where(ok)[0]:
            tracks[int(wp)].append((cid, len(obs[cid])))
            obs[cid].append((uv[wp, 0], uv[wp, 1], int(wp)))

    kept = {wp for wp, t in tracks.items() if len(t) >= 3}
    print(f"{len(X)} candidate worldpoints, {len(kept)} with >=3-view tracks")

    os.makedirs(OUT, exist_ok=True)
    with open(os.path.join(OUT, "cameras.txt"), "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        for cid, (cam, _) in cams.items():
            f.write(f"{cid + 1} PINHOLE {cam.width} {cam.height} "
                    f"{cam.K[0, 0]:.6f} {cam.K[1, 1]:.6f} "
                    f"{cam.K[0, 2]:.6f} {cam.K[1, 2]:.6f}\n")

    with open(os.path.join(OUT, "images.txt"), "w") as f:
        f.write("# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID "
                "NAME / POINTS2D[] as (X, Y, POINT3D_ID)\n")
        for cid, (cam, name) in cams.items():
            q = rotation_to_quaternion(cam.R)
            f.write(f"{cid + 1} " + " ".join(f"{v:.9f}" for v in q) + " "
                    + " ".join(f"{v:.9f}" for v in cam.t)
                    + f" {cid + 1} {name}\n")
            row = [f"{x:.2f} {y:.2f} {wp + 1 if wp in kept else -1}"
                   for (x, y, wp) in obs[cid]]
            f.write(" ".join(row) + "\n")

    with open(os.path.join(OUT, "points3D.txt"), "w") as f:
        f.write("# 3D point list: POINT3D_ID X Y Z R G B ERROR "
                "TRACK[] as (IMAGE_ID, POINT2D_IDX)\n")
        for wp in sorted(kept):
            tr = " ".join(f"{cid + 1} {p2d}" for cid, p2d in tracks[wp])
            f.write(f"{wp + 1} "
                    + " ".join(f"{v:.9f}" for v in X[wp])
                    + f" 128 128 128 0.5 {tr}\n")

    track_lens = [len(tracks[wp]) for wp in kept]
    print(f"wrote {OUT}: {len(cams)} images, {len(kept)} points3D, "
          f"median track length {int(np.median(track_lens))}")


if __name__ == "__main__":
    main()
