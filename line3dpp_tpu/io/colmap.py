"""COLMAP sparse-model reader (reference executable: main_colmap.cpp).

Reads the text export `cameras.txt` / `images.txt` / `points3D.txt`.
Supported camera models (main_colmap.cpp:173-220): SIMPLE_PINHOLE, PINHOLE,
SIMPLE_RADIAL, RADIAL, OPENCV, FULL_OPENCV.  Worldpoint depths come from
points3D tracks (main_colmap.cpp:391-407); image->camera indirection is
preserved.
"""

from __future__ import annotations

import os

import numpy as np

from ..camera import rotation_from_quaternion
from .types import SfMView

_MODELS = {
    "SIMPLE_PINHOLE": ("f", "cx", "cy"),
    "PINHOLE": ("fx", "fy", "cx", "cy"),
    "SIMPLE_RADIAL": ("f", "cx", "cy", "k1"),
    "RADIAL": ("f", "cx", "cy", "k1", "k2"),
    "OPENCV": ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2"),
    "FULL_OPENCV": ("fx", "fy", "cx", "cy", "k1", "k2", "p1", "p2",
                    "k3", "k4", "k5", "k6"),
}


def _data_lines(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                yield line


def read_colmap(model_dir: str, image_dir: str) -> list[SfMView]:
    cameras = {}
    for line in _data_lines(os.path.join(model_dir, "cameras.txt")):
        parts = line.split()
        cam_id, model = int(parts[0]), parts[1]
        w, h = int(parts[2]), int(parts[3])
        if model not in _MODELS:
            raise ValueError(f"unsupported COLMAP camera model {model}")
        names = _MODELS[model]
        vals = dict(zip(names, map(float, parts[4 : 4 + len(names)])))
        fx = vals.get("fx", vals.get("f"))
        fy = vals.get("fy", vals.get("f"))
        K = np.array([[fx, 0, vals["cx"]], [0, fy, vals["cy"]], [0, 0, 1.0]])
        dist = np.array([vals.get("k1", 0.0), vals.get("k2", 0.0),
                         vals.get("k3", 0.0), vals.get("p1", 0.0),
                         vals.get("p2", 0.0)])
        cameras[cam_id] = (K, dist, w, h)

    views: dict[int, SfMView] = {}
    lines = list(_data_lines(os.path.join(model_dir, "images.txt")))
    # images.txt alternates pose line / observation line
    for i in range(0, len(lines), 2):
        parts = lines[i].split()
        img_id = int(parts[0])
        q = list(map(float, parts[1:5]))
        t = np.array(list(map(float, parts[5:8])))
        cam_id = int(parts[8])
        name = parts[9]
        K, dist, w, h = cameras[cam_id]
        views[img_id] = SfMView(
            cam_id=img_id, K=K.copy(), R=rotation_from_quaternion(q), t=t,
            image_path=os.path.join(image_dir, name), width=w, height=h,
            distortion=dist.copy(), worldpoints=[],
        )

    depths: dict[int, list[float]] = {i: [] for i in views}
    p3d = os.path.join(model_dir, "points3D.txt")
    if os.path.exists(p3d):
        for line in _data_lines(p3d):
            parts = line.split()
            wp_id = int(parts[0])
            X = np.array(list(map(float, parts[1:4])))
            track = parts[8:]
            for j in range(0, len(track), 2):
                img_id = int(track[j])
                if img_id in views:
                    v = views[img_id]
                    v.worldpoints.append(wp_id)
                    depths[img_id].append(float(v.R[2] @ X + v.t[2]))

    out = []
    for img_id in sorted(views):
        v = views[img_id]
        if depths[img_id]:
            v.median_depth = float(np.median(depths[img_id]))
        out.append(v)
    return out
