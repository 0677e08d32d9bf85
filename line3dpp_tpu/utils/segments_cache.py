"""On-disk cache of detected 2D segments.

Mirrors the reference's boost-serialized per-image segment caches
(`L3D++_data/segments_L3D++_<cam>_<WxH>_<max>.bin`, reference:
line3D.cc:296-309, 362-366) with `.npz` files keyed identically so re-runs
skip detection entirely (README.md:248-250).
"""

from __future__ import annotations

import os

import numpy as np


def _path(cache_dir: str, cam_id: int, shape, max_segments: int,
          max_width: int = -1) -> str:
    h, w = shape[0], shape[1]
    # the detection width is part of the key (the reference embeds the
    # processed image size in its cache filename, line3D.cc:296-309) —
    # otherwise a -w run silently reuses detections from another resolution
    wtag = "FULL" if max_width <= 0 or max_width >= w else str(max_width)
    return os.path.join(
        cache_dir,
        f"segments_L3DTPU_{cam_id}_{w}x{h}_W{wtag}_{max_segments}.npz")


def load(cache_dir: str, cam_id: int, shape, max_segments: int,
         max_width: int = -1) -> np.ndarray | None:
    p = _path(cache_dir, cam_id, shape, max_segments, max_width)
    if not os.path.exists(p):
        return None
    try:
        return np.load(p)["segments"]
    except Exception:
        return None


def store(cache_dir: str, cam_id: int, shape, max_segments: int,
          segments: np.ndarray, max_width: int = -1) -> None:
    os.makedirs(cache_dir, exist_ok=True)
    np.savez_compressed(
        _path(cache_dir, cam_id, shape, max_segments, max_width),
        segments=np.asarray(segments, dtype=np.float64),
    )
