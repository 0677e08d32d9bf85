"""LSD detector tests.

Unit: synthetic images with known line segments must be recovered within
tolerance.  Statistical parity vs a reference detector (OpenCV LSD) runs on a
real testdata image and is marked slow (reference has no unit tests at all;
SURVEY.md §4 defines this strategy).
"""

import numpy as np
import pytest

from line3dpp_tpu.ops import lsd


def _draw_segment(img, p, q, value=200.0, thickness=1.0):
    """Rasterize a bright anti-aliased segment onto a dark image."""
    H, W = img.shape
    n = int(np.hypot(*(np.subtract(q, p))) * 3) + 1
    ts = np.linspace(0, 1, n)
    for t in ts:
        x = p[0] * (1 - t) + q[0] * t
        y = p[1] * (1 - t) + q[1] * t
        xi, yi = int(round(x)), int(round(y))
        r = int(np.ceil(thickness))
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                yy, xx = yi + dy, xi + dx
                if 0 <= yy < H and 0 <= xx < W:
                    d = np.hypot(xx - x, yy - y)
                    w = max(0.0, 1.0 - max(0.0, d - thickness + 1.0))
                    img[yy, xx] = max(img[yy, xx], value * w)
    return img


def _seg_distance(found, p, q, samples=7):
    """Max distance of true segment sample points to the closest found seg."""
    ts = np.linspace(0, 1, samples)[:, None]
    pts = np.array(p)[None] * (1 - ts) + np.array(q)[None] * ts
    a = found[:, :2]
    d = found[:, 2:] - a
    len2 = np.maximum((d * d).sum(-1), 1e-12)
    w = pts[:, None, :] - a[None]
    t = np.clip((w * d[None]).sum(-1) / len2[None], 0, 1)
    cl = a[None] + t[..., None] * d[None]
    return np.linalg.norm(pts[:, None] - cl, axis=-1).min(1).max()


def test_detects_synthetic_lines():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 8, size=(160, 200)).astype(np.float32)  # noise floor
    truth = [
        ((20.0, 30.0), (180.0, 35.0)),
        ((30.0, 140.0), (170.0, 60.0)),
        ((100.0, 20.0), (105.0, 150.0)),
    ]
    for p, q in truth:
        _draw_segment(img, p, q)

    segs = lsd.detect(img)
    assert len(segs) >= 3
    for p, q in truth:
        assert _seg_distance(segs, p, q) < 4.0, f"missed segment {p}->{q}"


def test_downscale_coords_match_original():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 8, size=(200, 300)).astype(np.float32)
    _draw_segment(img, (30.0, 50.0), (270.0, 60.0))
    segs = lsd.detect(img, max_width=150)
    assert len(segs) >= 1
    # coordinates must be reported at original resolution
    assert _seg_distance(segs, (30.0, 50.0), (270.0, 60.0)) < 8.0


@pytest.mark.slow
def test_statistical_parity_with_opencv():
    cv2 = pytest.importorskip("cv2")
    from PIL import Image

    img = np.asarray(
        Image.open("/root/reference/testdata/img000055.jpg").convert("L"))
    segs = lsd.detect(img)
    ref = cv2.createLineSegmentDetector().detect(img)[0].reshape(-1, 4)

    la = np.hypot(ref[:, 2] - ref[:, 0], ref[:, 3] - ref[:, 1])
    long_ref = ref[la >= 50].astype(np.float64)

    covered = 0
    for seg in long_ref:
        if _seg_distance(segs, seg[:2], seg[2:]) < 5.0:
            covered += 1
    assert covered / len(long_ref) > 0.85


def test_detect_batch_matches_per_image():
    # pipelined batch detection must be bitwise identical to per-image
    # detect() — only the dispatch order differs (ops/lsd.detect_batch)
    rng = np.random.default_rng(3)
    imgs = []
    for i in range(3):
        img = rng.uniform(0, 8, size=(160, 200)).astype(np.float32)
        _draw_segment(img, (20.0, 30.0 + 10 * i), (180.0, 35.0 + 10 * i))
        _draw_segment(img, (100.0, 20.0), (105.0, 150.0))
        imgs.append(img)
    batched = lsd.detect_batch(imgs, depth=2)
    for img, got in zip(imgs, batched):
        np.testing.assert_array_equal(got, lsd.detect(img))


def test_uint8_input_matches_f32():
    # u8 frames ride the uplink as-is and are cast on device
    # (ops/lsd._detect_prep): results must equal detecting float32(img)
    rng = np.random.default_rng(4)
    img8 = rng.integers(0, 9, size=(160, 200)).astype(np.uint8)
    imgf = img8.astype(np.float32)
    _draw_segment(imgf, (20.0, 40.0), (180.0, 45.0))
    img8 = np.maximum(img8, imgf.astype(np.uint8))
    np.testing.assert_array_equal(
        lsd.detect(img8), lsd.detect(img8.astype(np.float32)))


def test_rgb_uint8_luma_rounds():
    # RGB u8 -> luma must round, not floor (ops/lsd._detect_prep): the
    # rounded u8 luma plane and detection on it must match computing the
    # rounded luma by hand.
    rng = np.random.default_rng(6)
    rgb = rng.integers(0, 9, size=(160, 200, 3)).astype(np.uint8)
    gray = np.rint(rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)
    _draw_segment(gray, (20.0, 40.0), (180.0, 45.0))
    rgb = np.maximum(rgb, gray[..., None])
    gray = np.rint(rgb @ np.array([0.299, 0.587, 0.114])).astype(np.uint8)

    prepped, _ = lsd._detect_prep(rgb, max_width=0)
    np.testing.assert_array_equal(prepped, gray)
    np.testing.assert_array_equal(lsd.detect(rgb), lsd.detect(gray))


def test_shrunk_rounds_match_unshrunk():
    # rounds 2+ run on the compacted surviving actives (next_nc path);
    # the participating pixel set is identical to the unshrunk run, so
    # the accepted segments must match (same reduction tiling on CPU)
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 8, size=(160, 200)).astype(np.float32)
    for i in range(4):
        _draw_segment(img, (20.0, 25.0 + 30 * i), (180.0, 30.0 + 30 * i))
    d = jnp.asarray(img)
    a = lsd._detect_compact(d, 160, 200, False, shrink_scale=0.35)
    b = lsd._detect_compact(d, 160, 200, False, shrink_scale=0.0)
    sa = np.asarray(a[0])[np.asarray(a[1])]
    sb = np.asarray(b[0])[np.asarray(b[1])]
    assert len(sa) == len(sb) >= 4
    np.testing.assert_allclose(
        np.sort(sa, axis=0), np.sort(sb, axis=0), atol=1e-3)


def test_side_split_wiring():
    # side_split (lsd.cpp has no direct analog; our anti-fusion knob for
    # close-parallel pairs merged into one CC component) must not disturb
    # well-separated detections: a 2-px-apart parallel pair is already two
    # components (the inter-line gap pixels fall below the rho magnitude
    # threshold), so both paths return the same two long segments and the
    # hollow-band trigger stays silent.
    import jax.numpy as jnp

    rng = np.random.default_rng(7)
    img = rng.uniform(0, 8, size=(96, 200)).astype(np.float32)
    _draw_segment(img, (15.0, 40.0), (180.0, 44.0))
    _draw_segment(img, (15.0, 42.0), (180.0, 46.0))
    d = jnp.asarray(img)
    outs = {}
    for ss in (False, True):
        segs, ok, diag = lsd._lsd_core(d, 96, 200, side_split=ss)
        s = np.asarray(segs)[np.asarray(ok)]
        lens = np.hypot(s[:, 2] - s[:, 0], s[:, 3] - s[:, 1])
        outs[ss] = np.sort(s[lens > 60], axis=0)
        if ss:
            assert int(diag["n_split"]) == 0
    assert len(outs[True]) == len(outs[False]) == 2
    np.testing.assert_allclose(outs[True], outs[False], atol=1e-3)


def test_rescue_cascade_wiring():
    """The composed rect_improve cascade (lsd.cpp:1756-1873: p/2 retry +
    symmetric/one-sided width cuts, batched; ops/lsd.py `rescue`) must
    only ADD acceptances — segments accepted without it survive — and it
    must actually fire on a noisy scene (diag n_rescue > 0)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 8, size=(240, 400)).astype(np.float32)
    for p, q in [((15.0, 20.0), (380.0, 28.0)),
                 ((40.0, 200.0), (360.0, 60.0)),
                 ((30.0, 120.0), (370.0, 124.0))]:
        _draw_segment(img, p, q)
    d = jnp.asarray(img)
    segs0, ok0, diag0 = lsd._lsd_core(d, 240, 400)
    segs1, ok1, diag1 = lsd._lsd_core(d, 240, 400, rescue=True)
    assert int(diag0["n_rescue"]) == 0
    n0, n1 = int(np.asarray(ok0).sum()), int(np.asarray(ok1).sum())
    assert int(diag1["n_rescue"]) > 0
    assert n1 >= n0
    # round-1 acceptances are a strict superset: every base-accepted
    # round-1 segment appears identically with rescue on (later rounds
    # may legitimately differ through the band-limited consume)
    c_cap = ok0.shape[0] // 3
    a = np.asarray(segs0)[:c_cap][np.asarray(ok0)[:c_cap]]
    b = np.asarray(segs1)[:c_cap][np.asarray(ok1)[:c_cap]]
    bset = {tuple(np.round(r, 3)) for r in b}
    missing = [r for r in a if tuple(np.round(r, 3)) not in bset]
    assert not missing, missing
