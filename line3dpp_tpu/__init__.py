"""line3dpp_tpu — a TPU-native line-based Multi-View Stereo framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of Line3D++
(line-based 3D scene abstraction from oriented image sets): LSD line
detection, epipolar line matching, 3D hypothesis scoring, affinity
clustering, line bundling, and STL/OBJ/TXT/BIN model output — built for
TPU meshes instead of a single CUDA device.
"""

from .config import Config
from .camera import Camera, rotation_from_rpy, rotation_from_quaternion, \
    decompose_projection_matrix, fundamental_matrix
from .models.pipeline import Line3D
from .utils.writers import FinalLine3D, load_bin
from .utils.ref_bin import load_reference_bin


def undistort_image(image, K, distortion):
    """Brown-model undistortion (reference: Line3D::undistortImage,
    line3D.cc:83-109)."""
    from .ops.undistort import undistort_image as _u

    return _u(image, K, distortion)


def detect_line_segments(image, max_width: int = -1):
    """Standalone 2D line-segment detection (reference:
    Line3D::detectLineSegments, line3D.cc:249-372)."""
    from .ops.lsd import detect

    return detect(image, max_width=max_width)


__version__ = "0.1.0"
__all__ = [
    "Config", "Camera", "Line3D", "FinalLine3D", "load_bin",
    "load_reference_bin",
    "rotation_from_rpy", "rotation_from_quaternion",
    "decompose_projection_matrix", "fundamental_matrix",
    "undistort_image", "detect_line_segments",
]
