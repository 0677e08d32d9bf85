"""Worldpoint-neighbor end-to-end run over a real second SfM model
(VERDICT r3 #8).

The golden testdata e2e uses the GEOMETRIC neighbor fallback (the upstream
vsfm_result.nvm is missing), so the worldpoint-overlap neighbor path
(findVisualNeighborsFromWPs, line3D.cc:578-699) was never driven end-to-end.
`testdata/colmap_model/` (tools/make_testdata_colmap.py) is a synthesized
COLMAP text model over the same 26 real images: resected poses + ~5k
worldpoints sampled along the golden 3D structure with projection-based
tracks.  This slow test parses it with io/colmap.py, runs the FULL pipeline
with worldpoint-overlap neighbor selection, and scores against the golden.
"""

import os

import numpy as np
import pytest

import line3dpp_tpu as l3d
from line3dpp_tpu.io import read_colmap
from line3dpp_tpu.utils.golden import (
    line_match_metrics, parse_lines3d_txt, scene_scale, segment_set_metrics,
    stack_golden_segments,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG_DIR = "/root/reference/testdata"
GOLDEN = os.path.join(
    IMG_DIR, "Line3D++_ref",
    "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__vis_3.txt")
MODEL = os.path.join(REPO, "testdata", "colmap_model")
CACHE = os.path.join(REPO, "testdata", "L3D_cache")


@pytest.mark.slow
def test_colmap_worldpoint_neighbors_e2e():
    from PIL import Image

    if not os.path.exists(GOLDEN):
        pytest.skip("reference testdata not mounted")

    views = read_colmap(MODEL, IMG_DIR)
    assert len(views) == 26
    assert all(len(v.worldpoints) > 100 for v in views)
    assert all(v.median_depth and v.median_depth > 0 for v in views)

    pipe = l3d.Line3D(l3d.Config(optimize=False))
    for v in views:
        img = np.asarray(Image.open(v.image_path).convert("L"))
        cam = l3d.Camera(v.K, v.R, v.t, v.width, v.height,
                         median_depth=v.median_depth)
        # COLMAP image ids are 1-based; shift to the golden cache's 0-based
        # cam ids so the committed segment cache applies (detection is
        # identical either way — only the cache key contains the id)
        pipe.add_image(v.cam_id - 1, cam, img, worldpoints=v.worldpoints,
                       cache_dir=CACHE)

    # the worldpoint path must actually engage (no geometric fallback)
    assert all(pipe._views[c].worldpoints is not None for c in pipe._views)

    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) > 1000

    gold_lines = parse_lines3d_txt(GOLDEN)
    gold = stack_golden_segments(gold_lines)
    tol = 0.01 * scene_scale(gold)
    pred = np.concatenate([l.segments3d for l in lines])
    m = segment_set_metrics(pred, gold, tol=tol)
    cm = line_match_metrics([l.segments3d for l in lines],
                            [g.segments3d for g in gold_lines], tol=tol)
    assert m["recall"] > 0.95, (m, cm)
    assert m["precision"] > 0.95, (m, cm)
    assert cm["count_f1"] > 0.85, (m, cm)
