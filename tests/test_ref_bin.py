"""Reference .bin (boost archive) importer vs the shipped golden files.

The golden .bin and .txt encode the same model (save3DLinesAsBIN /
save3DLinesAsTXT, line3D.cc:2631-2711), so the imported segments must
match the parsed TXT line for line.
"""

import os

import numpy as np
import pytest

from line3dpp_tpu.utils import segments_cache
from line3dpp_tpu.utils.golden import parse_lines3d_txt
from line3dpp_tpu.utils.ref_bin import (
    load_reference_bin,
    load_reference_segments_bin,
    save_reference_segments_bin,
)

GOLD = "/root/reference/testdata/Line3D++_ref"
BASE = ("Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
        "__kNN_10{}_vis_3")


@pytest.mark.parametrize("variant", ["_", "__OPTIMIZED_"])
def test_bin_matches_txt(variant):
    stem = BASE.format(variant)
    bin_path = os.path.join(GOLD, stem + ".bin")
    txt_path = os.path.join(GOLD, stem + ".txt")
    if not os.path.exists(bin_path):
        pytest.skip("reference testdata not mounted")

    got = load_reference_bin(bin_path)
    want = parse_lines3d_txt(txt_path)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert len(g.segments3d) == len(w.segments3d)
        # txt stores ~6 significant digits
        np.testing.assert_allclose(g.segments3d, w.segments3d,
                                   rtol=1e-4, atol=1e-4)
        assert len(g.residuals) == len(w.residuals)
        np.testing.assert_array_equal(g.residuals[:, :2],
                                      w.residuals[:, :2])


def test_segment_cache_roundtrip(tmp_path):
    """Per-image segment caches (DataArray<float4> boost archives,
    line3D.cc:296-309, dataArray.h:352-374): write -> read must be exact,
    including the odd-count pitch-padding case (dataArray.h:110-118)."""
    rng = np.random.default_rng(7)
    for n in (0, 1, 2, 7, 3000):
        segs = rng.uniform(0, 3072, (n, 4))
        p = str(tmp_path / f"segments_L3D++_5_3072x2304_3000.bin")
        save_reference_segments_bin(p, segs)
        got = load_reference_segments_bin(p)
        assert got.shape == (n, 4)
        np.testing.assert_array_equal(got, segs.astype(np.float32))


def test_segment_cache_from_committed_detections(tmp_path):
    """Round-trip this repo's committed TPU-path detections through the
    reference wire format (the export-back-to-Line3D++ migration path)."""
    npz = "testdata/L3D_cache/segments_L3DTPU_0_3072x2304_WFULL_3000.npz"
    if not os.path.exists(npz):
        pytest.skip("committed segment cache not present")
    segs = np.load(npz)["segments"]
    p = str(tmp_path / "segments_L3D++_0_3072x2304_3000.bin")
    save_reference_segments_bin(p, segs)
    got = load_reference_segments_bin(p)
    np.testing.assert_array_equal(got, segs.astype(np.float32))


def test_segments_cache_imports_reference_workspace(tmp_path):
    """segments_cache.load falls back to an existing Line3D++ workspace's
    boost caches, matching the reference's processed-size filename
    (max-dimension downscale rule, line3D.cc:271-293)."""
    rng = np.random.default_rng(3)
    segs = rng.uniform(0, 3072, (40, 4))

    # full-resolution cache for camera 7 at 3072x2304
    save_reference_segments_bin(
        str(tmp_path / "segments_L3D++_7_3072x2304_3000.bin"), segs)
    got = segments_cache.load(str(tmp_path), 7, (2304, 3072), 3000, -1)
    np.testing.assert_array_equal(got, segs.astype(np.float32))

    # downscaled cache: max_image_width=1000 on a 3072x2304 image ->
    # s = 1000/3072, processed size 1000x750
    save_reference_segments_bin(
        str(tmp_path / "segments_L3D++_8_1000x750_3000.bin"), segs[:10])
    got = segments_cache.load(str(tmp_path), 8, (2304, 3072), 3000, 1000)
    assert got is not None and len(got) == 10

    # wrong processed size must NOT match
    assert segments_cache.load(str(tmp_path), 8, (2304, 3072), 3000, 500) is None

    # absent camera -> None
    assert segments_cache.load(str(tmp_path), 9, (2304, 3072), 3000, -1) is None
