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
from .utils.writers import FinalLine3D

__version__ = "0.1.0"
__all__ = [
    "Config", "Camera", "Line3D", "FinalLine3D",
    "rotation_from_rpy", "rotation_from_quaternion",
    "decompose_projection_matrix", "fundamental_matrix",
]
