"""Recover the testdata camera poses from the golden reconstruction.

The reference's testdata ships golden 3D line models plus the images, but the
VisualSfM pose file ``vsfm_result.nvm`` is absent from the mounted copy
(reference: .MISSING_LARGE_BLOBS:2, SURVEY.md §6).  The golden TXT however
contains, per 3D line, its world-space segments AND the observing cameras'
2D segments — thousands of 2D-line <-> 3D-line correspondences per camera.

Each correspondence gives two linear constraints on the 3x4 projection
matrix M:  the projected endpoints of the 3D segment lie on the observed 2D
line l:   l^T (M P~) = 0  and  l^T (M Q~) = 0.   A DLT over all
correspondences recovers M per camera; RQ decomposition splits K, R, t.

Output: testdata/cameras_testdata.json (committed), used by the e2e golden
tests.  Usage:  python tools/resect_testdata_cameras.py

NOTE on camID -> image mapping: the golden file's camera ids follow the NVM
registration order, NOT filename order — golden cams 0-4 are images
img000057/59/58/56/55 respectively (established by matching each camera's
residual 2D segments against per-image line detections; identity for 5-25).
The committed JSON carries the corrected mapping.  Resection itself is
unaffected (it never reads pixels; sizes are identical across images).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from line3dpp_tpu.camera import decompose_projection_matrix  # noqa: E402
from line3dpp_tpu.utils.golden import parse_lines3d_txt  # noqa: E402

GOLDEN = (
    "/root/reference/testdata/Line3D++_ref/"
    "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__OPTIMIZED__vis_3.txt"
)
OUT = os.path.join(os.path.dirname(__file__), "..", "testdata", "cameras_testdata.json")


def gather_correspondences(path: str):
    """Per camera: list of (2D line l (3,), 3D points P,Q used as on-line)."""
    lines = parse_lines3d_txt(path)
    per_cam: dict[int, list] = {}
    for gl in lines:
        # use every 3D sub-segment endpoint of the line as an on-line point
        pts3d = np.concatenate([gl.segments3d[:, :3], gl.segments3d[:, 3:]], axis=0)
        for cam_id, _seg_id, p1x, p1y, q1x, q1y in gl.residuals:
            p = np.array([p1x, p1y, 1.0])
            q = np.array([q1x, q1y, 1.0])
            l = np.cross(p, q)
            n = np.linalg.norm(l[:2])
            if n < 1e-9:
                continue
            per_cam.setdefault(int(cam_id), []).append((l / n, pts3d))
    return per_cam


def resect_camera(corrs, img_w, img_h):
    """DLT for M from line-point incidences, with Hartley normalization."""
    rows = []
    # normalize 2D: shift to image center, scale by ~f guess
    T = np.array(
        [
            [2.0 / img_w, 0, -1.0],
            [0, 2.0 / img_w, -img_h / img_w],
            [0, 0, 1.0],
        ]
    )
    Tinv_T = np.linalg.inv(T).T

    pts_all = np.concatenate([P for _, P in corrs], axis=0)
    c3 = pts_all.mean(0)
    s3 = np.sqrt(3.0) / max(np.std(pts_all - c3), 1e-9)
    U = np.eye(4)
    U[:3, :3] *= s3
    U[:3, 3] = -s3 * c3

    for l, P in corrs:
        ln = Tinv_T @ l             # line in normalized coords
        ln = ln / np.linalg.norm(ln[:2])
        Ph = np.hstack([P, np.ones((len(P), 1))]) @ U.T   # normalized 3D
        # each point: ln^T M' X = 0 -> kron constraint on vec(M')
        for X in Ph:
            rows.append(np.kron(ln, X))
    A = np.asarray(rows)
    _, _, Vt = np.linalg.svd(A, full_matrices=False)
    Mn = Vt[-1].reshape(3, 4)
    M = np.linalg.inv(T) @ Mn @ U   # denormalize

    K, R, t = decompose_projection_matrix(M)
    # ensure points are in front of the camera (positive depth)
    test = R @ pts_all.mean(0) + t
    if test[2] < 0:
        # flip: P and -P are equivalent in DLT
        K2, R2, t2 = decompose_projection_matrix(-M)
        K, R, t = K2, R2, t2
    K = K / K[2, 2]
    return K, R, t, A


def reprojection_error(K, R, t, corrs):
    """RMS distance (px) of projected 3D points to their observed 2D lines."""
    errs = []
    for l, P in corrs:
        q = (P @ R.T + t) @ K.T
        uv = q[:, :2] / q[:, 2:3]
        d = np.abs(uv @ l[:2] + l[2])
        errs.append(d)
    e = np.concatenate(errs)
    return float(np.sqrt((e**2).mean())), float(np.median(e))


def main():
    from PIL import Image

    img_dir = "/root/reference/testdata"
    sizes = {}
    for i in range(26):
        name = f"img{55 + i:06d}.jpg"
        with Image.open(os.path.join(img_dir, name)) as im:
            sizes[i] = (im.width, im.height, name)

    per_cam = gather_correspondences(GOLDEN)
    out = {}
    for cam_id in sorted(per_cam):
        w, h, name = sizes[cam_id]
        K, R, t, _ = resect_camera(per_cam[cam_id], w, h)
        rms, med = reprojection_error(K, R, t, per_cam[cam_id])
        print(
            f"cam {cam_id:2d} ({name}): {len(per_cam[cam_id]):4d} line corrs, "
            f"f=({K[0,0]:.1f},{K[1,1]:.1f}) pp=({K[0,2]:.1f},{K[1,2]:.1f}) "
            f"skew={K[0,1]:.3f}  line-reproj rms={rms:.3f}px med={med:.3f}px"
        )
        out[str(cam_id)] = {
            "image": name,
            "width": w,
            "height": h,
            "K": K.tolist(),
            "R": R.tolist(),
            "t": t.tolist(),
            "n_corrs": len(per_cam[cam_id]),
            "line_reproj_rms_px": rms,
        }

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
