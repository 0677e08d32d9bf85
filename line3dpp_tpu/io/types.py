"""Common SfM view record returned by every reader."""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SfMView:
    """One posed image as read from an SfM result.

    Mirrors the data each reference executable assembles before calling
    addImage (e.g. main_vsfm.cpp:252-310): intrinsics, pose, image path,
    radial/tangential distortion, observed worldpoint ids, and the median
    scene depth of those worldpoints.
    """

    cam_id: int
    K: np.ndarray                 # (3,3)
    R: np.ndarray                 # (3,3) world->cam
    t: np.ndarray                 # (3,)
    image_path: str
    width: int = -1               # -1: read from the image file
    height: int = -1
    distortion: np.ndarray | None = None   # (k1,k2,k3,p1,p2) or None
    worldpoints: list[int] | None = None
    median_depth: float = 1.0
