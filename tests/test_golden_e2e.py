"""Golden end-to-end reconstruction vs the reference's testdata output.

Slow test (deselected by default; run with ``-m slow``): drives the full
pipeline on the bundled 26-image testdata using the resected cameras
(tools/resect_testdata_cameras.py) and scores 3D recall/precision against
`testdata/Line3D++_ref` (SURVEY.md §4's golden-output strategy).  Uses the
on-disk segment cache when present; otherwise detects with the TPU LSD
(slow on CPU).
"""

import json
import os

import numpy as np
import pytest

import line3dpp_tpu as l3d
from line3dpp_tpu.utils.golden import (
    parse_lines3d_txt, scene_scale, segment_set_metrics, stack_golden_segments,
)

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG_DIR = "/root/reference/testdata"
GOLDEN = os.path.join(
    IMG_DIR, "Line3D++_ref",
    "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__vis_3.txt")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")
CACHE = os.path.join(REPO, "testdata", "L3D_cache")


@pytest.mark.slow
def test_golden_reconstruction():
    from PIL import Image

    if not os.path.exists(GOLDEN):
        pytest.skip("reference testdata not mounted")

    cams = json.load(open(CAMS))
    pipe = l3d.Line3D(l3d.Config(optimize=False))
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(
            Image.open(os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)

    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    assert len(lines) > 1000

    gold = stack_golden_segments(parse_lines3d_txt(GOLDEN))
    pred = np.concatenate([l.segments3d for l in lines])
    m = segment_set_metrics(pred, gold, tol=0.01 * scene_scale(gold))
    assert m["recall"] > 0.93, m
    assert m["precision"] > 0.94, m
