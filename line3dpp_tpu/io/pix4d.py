"""Pix4D `1_initial/params/` reader (reference executable: main_pix4d.cpp).

Reads `<project>_calibrated_camera_parameters.txt`.  Per-image record
(main_pix4d.cpp:207-280):

    filename width height
    K row 0 / K row 1 / K row 2
    radial distortion (3 values)
    tangential distortion (2 values)
    camera center C (1 row; the reference converts t = -R C)
    R row 0 / R row 1 / R row 2

Worldpoint overlap would come from the tracks/bingo files
(main_pix4d.cpp:285-380); when absent the pipeline falls back to geometric
neighbor selection.
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

    raw = [l.strip() for l in open(path)]
    # skip any leading header/comment block: records start at the first line
    # whose first token looks like an image filename
    def is_image_line(l: str) -> bool:
        if not l:
            return False
        head = l.split()[0].lower()
        return head.endswith((".jpg", ".jpeg", ".png", ".tif", ".tiff"))

    i = 0
    while i < len(raw) and not is_image_line(raw[i]):
        i += 1

    views: list[SfMView] = []
    cam_id = 0
    while i < len(raw) and is_image_line(raw[i]):
        header = raw[i].split(); i += 1
        name = header[0]
        w = int(float(header[1])) if len(header) >= 3 else -1
        h = int(float(header[2])) if len(header) >= 3 else -1

        K = np.array([list(map(float, raw[i + r].split())) for r in range(3)])
        i += 3
        radial = list(map(float, raw[i].split())); i += 1
        tangential = list(map(float, raw[i].split())); i += 1
        C = np.array(list(map(float, raw[i].split()))); i += 1
        R = np.array([list(map(float, raw[i + r].split())) for r in range(3)])
        i += 3

        t = -R @ C                      # main_pix4d.cpp:270
        dist = np.zeros(5)
        dist[:3] = (radial + [0.0, 0.0, 0.0])[:3]
        dist[3:5] = (tangential + [0.0, 0.0])[:2]
        views.append(SfMView(
            cam_id=cam_id, K=K, R=R, t=t,
            image_path=os.path.join(image_dir, name), width=w, height=h,
            distortion=dist, worldpoints=None,
        ))
        cam_id += 1
        # tolerate blank separator lines between records
        while i < len(raw) and not raw[i]:
            i += 1
    return views
