"""Tile-local Pallas connected components vs the XLA hook+jump reference.

Both must produce identical labels (flat index of each component's minimum
pixel) on synthetic angle fields; the Pallas path additionally exercises
the cross-tile border merge (ops/lsd_cc.py).
"""

import math

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.ops import lsd, lsd_cc

TILE = (8, 128)


def _draw_line(angle, active, x0, y0, x1, y1, theta):
    n = int(max(abs(x1 - x0), abs(y1 - y0))) + 1
    xs = np.linspace(x0, x1, n).round().astype(int)
    ys = np.linspace(y0, y1, n).round().astype(int)
    H, W = angle.shape
    ok = (xs >= 0) & (xs < W) & (ys >= 0) & (ys < H)
    angle[ys[ok], xs[ok]] = theta
    active[ys[ok], xs[ok]] = True


def _labels_both_ways(angle, active, tol):
    lab_ref = np.asarray(lsd._connected_components(
        jnp.asarray(angle), jnp.asarray(active), jnp.float32(tol),
        n_iters=64))

    lab_t, conv = lsd_cc.cc_tiles(jnp.asarray(angle), jnp.asarray(active),
                                  jnp.float32(tol), tile=TILE, max_iters=512,
                                  interpret=True)
    assert int(conv[0, 0]) == 0, "a test tile failed to converge"
    T, _ = lsd_cc.merge_tile_labels(lab_t, jnp.asarray(angle),
                                    jnp.asarray(active), jnp.float32(tol),
                                    tile=TILE)
    lab_merged = np.asarray(jnp.where(
        lab_t == lsd_cc.INVALID, lsd_cc.INVALID,
        T[jnp.clip(lab_t, 0, T.shape[0] - 1)]))
    return lab_ref, lab_merged


def test_crosses_tile_borders():
    H, W = 16, 256          # 2x2 tiles of (8, 128)
    angle = np.full((H, W), 99.0, np.float32)
    active = np.zeros((H, W), bool)
    # long horizontal line crossing the vertical tile border
    _draw_line(angle, active, 10, 3, 245, 3, 0.3)
    # diagonal line crossing both borders
    _draw_line(angle, active, 60, 0, 75, 15, -0.8)
    # vertical line crossing the horizontal border
    _draw_line(angle, active, 200, 1, 200, 14, 1.4)
    # an isolated point
    angle[12, 30] = 2.0
    active[12, 30] = True

    lab_ref, lab_tile = _labels_both_ways(angle, active, math.radians(22.5))
    np.testing.assert_array_equal(lab_ref, lab_tile)

    # sanity: the crossing lines split into five multi-pixel components
    # (the horizontal line is cut where the diagonal and vertical cross it)
    roots = lab_tile[active]
    uniq, counts = np.unique(roots, return_counts=True)
    assert (counts > 5).sum() == 5


def test_link_cap_compaction():
    """Compacted border links (link_cap) must reproduce the uncompacted
    merge exactly while reporting the valid-link count; an overflowing cap
    is detectable via n_valid > cap (detect() then re-runs uncompacted)."""
    H, W = 16, 256
    angle = np.full((H, W), 99.0, np.float32)
    active = np.zeros((H, W), bool)
    _draw_line(angle, active, 10, 3, 245, 3, 0.3)
    _draw_line(angle, active, 200, 1, 200, 14, 1.4)
    tol = jnp.float32(math.radians(22.5))

    lab_t, _ = lsd_cc.cc_tiles(jnp.asarray(angle), jnp.asarray(active), tol,
                               tile=TILE, max_iters=512, interpret=True)
    T0, n0 = lsd_cc.merge_tile_labels(lab_t, jnp.asarray(angle),
                                      jnp.asarray(active), tol, tile=TILE)
    cap = lsd_cc.auto_link_cap((H, W), TILE)
    Tc, nc = lsd_cc.merge_tile_labels(lab_t, jnp.asarray(angle),
                                      jnp.asarray(active), tol, tile=TILE,
                                      link_cap=cap)
    assert int(n0) == int(nc) and int(nc) <= cap
    np.testing.assert_array_equal(np.asarray(T0), np.asarray(Tc))

    # overflow detection: a 1-link cap cannot hold all valid links
    _, n1 = lsd_cc.merge_tile_labels(lab_t, jnp.asarray(angle),
                                     jnp.asarray(active), tol, tile=TILE,
                                     link_cap=1)
    assert int(n1) > 1


def test_angle_tolerance_splits(rng):
    """Neighboring pixels with misaligned angles must stay separate
    components in both implementations."""
    H, W = 16, 256
    angle = rng.uniform(-math.pi, math.pi, (H, W)).astype(np.float32)
    active = rng.uniform(size=(H, W)) < 0.35
    lab_ref, lab_tile = _labels_both_ways(angle, active, 0.3)
    np.testing.assert_array_equal(lab_ref, lab_tile)


def test_dense_blob_merges(rng):
    """A dense same-angle blob spanning all four tiles becomes ONE
    component through the border merge."""
    H, W = 16, 256
    angle = np.full((H, W), 0.7, np.float32)
    active = np.ones((H, W), bool)
    lab_ref, lab_tile = _labels_both_ways(angle, active, 0.3)
    np.testing.assert_array_equal(lab_ref, lab_tile)
    assert np.unique(lab_tile).size == 1
