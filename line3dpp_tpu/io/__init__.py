"""SfM result readers (the L6 interface layer of the reference,
SURVEY.md §2.2): VisualSfM NVM, COLMAP, bundler, mavmap, Pix4D, OpenMVG."""

from .types import SfMView
from .nvm import read_nvm
from .colmap import read_colmap
from .bundler import read_bundler
from .mavmap import read_mavmap
from .pix4d import read_pix4d
from .openmvg import read_openmvg

__all__ = [
    "SfMView", "read_nvm", "read_colmap", "read_bundler", "read_mavmap",
    "read_pix4d", "read_openmvg",
]
