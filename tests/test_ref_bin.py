"""Reference .bin (boost archive) importer vs the shipped golden files.

The golden .bin and .txt encode the same model (save3DLinesAsBIN /
save3DLinesAsTXT, line3D.cc:2631-2711), so the imported segments must
match the parsed TXT line for line.
"""

import os

import numpy as np
import pytest

from line3dpp_tpu.utils.golden import parse_lines3d_txt
from line3dpp_tpu.utils.ref_bin import load_reference_bin

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
