"""Reader for reference Line3D++ ``.bin`` result files.

The reference saves its final model as a boost *binary archive* of
``std::vector<L3DPP::FinalLine3D>`` (save3DLinesAsBIN line3D.cc:2690-2711,
serializeToFile serialization.h:38-46).  This module parses that format
natively (no boost required) so existing Line3D++ results can be loaded
for migration or used as a second golden oracle.

Wire format (little-endian, reverse-engineered from the shipped golden
.bin files and the serialize() member functions in segment3D.h:99-177 /
commons.h:126-130; validated byte-exactly against the golden .txt):

* header: u64 signature length, ``serialization::archive``, u16 library
  version (10), four u8 type sizes (sizeof int/long/float/double);
* the first time each class TYPE occurs, a 5-byte class-info block is
  written: u8 tracking flag + u32 class version (tracked objects — only
  the top-level vector here — additionally carry a u32 object id);
* every collection instance: u64 element count + u32 item version;
* ``Segment3D``: f32 length, u8 valid, 3x f64 P1, 3x f64 P2, 3x f64 dir;
* ``Segment2D``: u32 camID, u32 segID;
* ``LineCluster3D``: Segment3D + list<Segment2D> + u32 reference view;
* ``FinalLine3D``: list<Segment3D> + LineCluster3D.

The reference stores residuals as (camID, segID) only — 2D endpoint
coordinates are resolved from live views at save-TXT time — so imported
residual rows carry zeros in the coordinate columns.
"""

from __future__ import annotations

import struct

import numpy as np

from .writers import FinalLine3D

_SIGNATURE = b"serialization::archive"


class _Reader:
    def __init__(self, data: bytes):
        self.d = data
        self.o = 0
        self.seen: set = set()

    def take(self, fmt: str):
        vals = struct.unpack_from("<" + fmt, self.d, self.o)
        self.o += struct.calcsize("<" + fmt)
        return vals if len(vals) > 1 else vals[0]

    def class_info(self, tag: str):
        """Consume the first-occurrence class-info block for type ``tag``."""
        if tag in self.seen:
            return
        self.seen.add(tag)
        tracking = self.take("B")
        if tracking:
            self.take("I")          # object id
        self.take("I")              # class version

    def collection_header(self, tag: str) -> int:
        self.class_info(tag)
        count = self.take("Q")
        self.take("I")              # item version
        return count

    def segment3d(self):
        self.class_info("Segment3D")
        _length = self.take("f")
        _valid = self.take("B")
        vals = self.take("9d")
        return np.array(vals[0:6])  # [P1 | P2]; dir is redundant

    def segment2d(self):
        self.class_info("Segment2D")
        cam = self.take("I")
        seg = self.take("I")
        return cam, seg


def load_reference_bin(path: str) -> list[FinalLine3D]:
    """Parse a reference Line3D++ result ``.bin`` into FinalLine3D records."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)

    siglen = r.take("Q")
    sig = data[r.o:r.o + siglen]
    if sig != _SIGNATURE:
        raise ValueError(f"{path}: not a boost serialization archive")
    r.o += siglen
    libver = r.take("H")
    if libver < 8:
        raise ValueError(f"{path}: unsupported archive library version "
                         f"{libver}")
    sizes = r.take("4B")
    if tuple(sizes) != (4, 8, 4, 8):
        raise ValueError(f"{path}: unexpected primitive sizes {sizes}")

    n_lines = r.collection_header("vector<FinalLine3D>")
    out = []
    for _ in range(n_lines):
        r.class_info("FinalLine3D")
        n_seg = r.collection_header("list<Segment3D>")
        segs = np.stack([r.segment3d() for _ in range(n_seg)]) \
            if n_seg else np.zeros((0, 6))
        r.class_info("LineCluster3D")
        _cluster_line = r.segment3d()
        n_res = r.collection_header("list<Segment2D>")
        res = np.zeros((n_res, 6))
        for i in range(n_res):
            cam, seg = r.segment2d()
            res[i, 0] = cam
            res[i, 1] = seg
        _ref_view = r.take("I")
        out.append(FinalLine3D(segments3d=segs, residuals=res))
    if r.o != len(data):
        raise ValueError(f"{path}: {len(data) - r.o} trailing bytes "
                         "after the last record — layout mismatch")
    return out
