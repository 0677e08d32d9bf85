"""Output-writer format pins: TXT / STL / OBJ / BIN.

Two layers (VERDICT r4 weak #6 — formats were only exercised via e2e
probes, so a byte-format regression would surface as a silent golden
metric change):

1. golden-snippet unit tests — tiny hand-built models against exact
   expected strings (TXT record layout: reference README.md:272-277;
   STL facet block: line3D.cc:2465-2527; OBJ v/l: line3D.cc:2579-2628);
2. byte-exact regeneration — rebuild each format from the reference's
   own shipped outputs and require equality with the shipped files
   (save_stl/save_obj from the golden .bin, save_txt from the parsed
   golden .txt); any formatting drift fails on the first byte.
"""

import os

import numpy as np
import pytest

from line3dpp_tpu.utils import ref_bin, writers
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from line3dpp_tpu.utils.writers import FinalLine3D

_GOLD = ("/root/reference/testdata/Line3D++_ref/Line3D++__W_FULL__N_10__"
         "sigmaP_2.5__sigmaA_10__epiOverlap_0.25__kNN_10__vis_3")

_needs_golden = pytest.mark.skipif(
    not os.path.exists(_GOLD + ".bin"),
    reason="reference golden outputs not mounted")


def _tiny_model():
    return [
        FinalLine3D(
            segments3d=np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0],
                                 [4.0, 5.0, 6.0, 7.5, 8.25, -9.125]]),
            residuals=np.array([[0, 7, 10.5, 20.0, 30.0, 40.0],
                                [2, 9, 11.0, 21.0, 31.0, 41.0]]),
        ),
        FinalLine3D(
            segments3d=np.array([[0.125, 0.0, -1.0, 2.0, 0.0, 0.5]]),
            residuals=np.zeros((0, 6)),
        ),
    ]


def test_txt_record_layout(tmp_path):
    """`n  P Q ...  m  camID segID p q ...` per row (README.md:272-277)."""
    p = str(tmp_path / "o.txt")
    writers.save_txt(p, _tiny_model())
    rows = open(p).read().splitlines()
    assert rows == [
        "2 1 2 3 4 5 6 4 5 6 7.5 8.25 -9.125 2 0 7 10.5 20 30 40 "
        "2 9 11 21 31 41 ",
        "1 0.125 0 -1 2 0 0.5 0 ",
    ]


def test_stl_facet_block(tmp_path):
    """Degenerate (v1, v2, v1) facet per 3D segment (line3D.cc:2465-2527)."""
    p = str(tmp_path / "o.stl")
    writers.save_stl(p, _tiny_model()[1:])
    assert open(p).read() == (
        "solid lineModel\n"
        " facet normal 1.0e+000 0.0e+000 0.0e+000\n"
        "  outer loop\n"
        "   vertex 1.250000e-01 0.000000e+00 -1.000000e+00\n"
        "   vertex 2.000000e+00 0.000000e+00 5.000000e-01\n"
        "   vertex 1.250000e-01 0.000000e+00 -1.000000e+00\n"
        "  endloop\n"
        " endfacet\n"
        "endsolid lineModel\n"
    )


def test_obj_vertex_line_records(tmp_path):
    """v-pair per segment, then 1-based l records (line3D.cc:2579-2628)."""
    p = str(tmp_path / "o.obj")
    writers.save_obj(p, _tiny_model())
    assert open(p).read().splitlines() == [
        "v 1 2 3", "v 4 5 6",
        "v 4 5 6", "v 7.5 8.25 -9.125",
        "v 0.125 0 -1", "v 2 0 0.5",
        "l 1 2", "l 3 4", "l 5 6",
    ]


def test_bin_npz_roundtrip(tmp_path):
    p = str(tmp_path / "o.bin")
    model = _tiny_model()
    writers.save_bin(p, model)
    back = writers.load_bin(p)
    assert len(back) == len(model)
    for a, b in zip(model, back):
        np.testing.assert_array_equal(a.segments3d, b.segments3d)
        np.testing.assert_array_equal(a.residuals, b.residuals)


def test_bin_boost_roundtrip(tmp_path):
    """save_bin_boost inverts load_reference_bin (serialization.h:38-58);
    the boost format stores residuals as (camID, segID) only."""
    p = str(tmp_path / "o.bin")
    model = _tiny_model()
    ref_bin.save_bin_boost(p, model)
    back = writers.load_bin(p)        # auto-detects the boost archive
    assert len(back) == len(model)
    for a, b in zip(model, back):
        np.testing.assert_allclose(a.segments3d, b.segments3d,
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(a.residuals[:, :2], b.residuals[:, :2])


@_needs_golden
def test_stl_obj_byte_exact_vs_golden(tmp_path):
    """Regenerating STL/OBJ from the reference's own .bin must reproduce
    the reference's shipped .stl/.obj byte-for-byte."""
    lines = ref_bin.load_reference_bin(_GOLD + ".bin")
    for ext, save in (("stl", writers.save_stl), ("obj", writers.save_obj)):
        p = str(tmp_path / ("g." + ext))
        save(p, lines)
        assert open(p).read() == open(_GOLD + "." + ext).read(), ext


@_needs_golden
def test_txt_byte_exact_vs_golden(tmp_path):
    """save_txt(parse(golden .txt)) must reproduce the golden byte-for-byte
    (pins the %.6g-style number formatting and the trailing-space rows)."""
    gl = parse_lines3d_txt(_GOLD + ".txt")
    model = [FinalLine3D(segments3d=g.segments3d, residuals=g.residuals)
             for g in gl]
    p = str(tmp_path / "g.txt")
    writers.save_txt(p, model)
    assert open(p).read() == open(_GOLD + ".txt").read()


@_needs_golden
def test_boost_bin_roundtrip_vs_golden(tmp_path):
    """Full-scale round-trip over the 2489-line golden model."""
    lines = ref_bin.load_reference_bin(_GOLD + ".bin")
    p = str(tmp_path / "g.bin")
    ref_bin.save_bin_boost(p, lines)
    back = ref_bin.load_reference_bin(p)
    assert len(back) == len(lines)
    for a, b in zip(lines, back):
        np.testing.assert_allclose(a.segments3d, b.segments3d,
                                   rtol=0, atol=0)
        np.testing.assert_array_equal(a.residuals[:, :2], b.residuals[:, :2])
