"""Batched 3D-line bundle adjustment (Ceres-equivalent).

The reference bundles clustered 3D lines with a Ceres solver over a Cayley
line parametrization, holding cameras and intrinsics constant
(reference: optimization.cc:8-303, optimization.h:40-170).  Because cameras
are constant, every line's 4 parameters are independent — the problem is
block-diagonal and maps to a batched Levenberg-Marquardt over [C, 4] on TPU
(SURVEY.md §7.1), no Schur complement required.

This module currently provides the interface; the full batched LM lands with
milestone M3 (SURVEY.md §7.3).  Until then it returns the SVD-fit lines
unchanged (equivalent to running the reference without Ceres).
"""

from __future__ import annotations

import numpy as np


def optimize_cluster_lines(lineP1, lineP2, mc, mv, ms, C, st, config):
    """Refine cluster lines by minimizing 2D endpoint-to-projected-line
    reprojection error.  Returns (P1, P2, unit_dir) arrays of shape (C, 3)."""
    line_dir = lineP2 - lineP1
    line_dir = line_dir / np.maximum(
        np.linalg.norm(line_dir, axis=-1, keepdims=True), 1e-12
    )
    return lineP1, lineP2, line_dir
