"""Pallas label-gather kernels (ops/lsd_gather.py) vs plain indexing."""

import numpy as np
import jax.numpy as jnp
import pytest

from line3dpp_tpu.ops import lsd_gather

INVALID = 1 << 30


def test_apply_merge_dense(rng):
    th, tw = 16, 256
    hp, wp = 2 * th, 2 * tw
    # labels: per dense tile, random in-tile flat roots; some INVALID
    lab = np.empty((hp, wp), np.int32)
    for i in range(hp // th):
        for j in range(wp // tw):
            ys = rng.integers(i * th, (i + 1) * th, (th, tw))
            xs = rng.integers(j * tw, (j + 1) * tw, (th, tw))
            lab[i * th:(i + 1) * th, j * tw:(j + 1) * tw] = ys * wp + xs
    inv = rng.uniform(size=(hp, wp)) < 0.3
    lab[inv] = INVALID
    T = rng.integers(0, 1 << 23, hp * wp).astype(np.int32)

    got = np.asarray(lsd_gather.apply_merge_dense(
        jnp.asarray(lab), jnp.asarray(T), (th, tw), INVALID,
        interpret=True))
    want = np.where(lab < INVALID, T[np.minimum(lab, hp * wp - 1)], INVALID)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("span", ["narrow", "wide", "overflow"])
def test_gather_sorted(rng, span):
    n_src = 128 * 8192                 # 1M source elements
    src = rng.integers(0, 1 << 23, n_src).astype(np.int32)
    n = 8 * 1024
    if span == "narrow":
        # sorted indices with small per-tile spans (one DMA chunk each —
        # the production shape)
        idx = np.sort(rng.choice(n_src // 16, n, replace=False)).astype(
            np.int32)
    elif span == "wide":
        # uniformly spread: multi-chunk tiles, still covered exactly
        idx = np.sort(rng.choice(n_src, n, replace=False)).astype(np.int32)
    else:
        # one tile spanning > MAX_CHUNKS windows: its tail entries
        # overflow and are poisoned
        idx = np.sort(np.concatenate(
            [np.arange(n - 8, dtype=np.int64),
             n_src - 8 + np.arange(8, dtype=np.int64)])).astype(np.int32)

    out, ovf = lsd_gather.gather_sorted(
        jnp.asarray(src), jnp.asarray(idx), win_rows=512, fill=-1,
        interpret=True)
    out, ovf = np.asarray(out), int(ovf)
    want = src[idx]
    covered = out != -1
    np.testing.assert_array_equal(out[covered], want[covered])
    assert ovf == int((~covered).sum())
    if span in ("narrow", "wide"):
        assert ovf == 0
        np.testing.assert_array_equal(out, want)
    else:
        assert ovf > 0


def test_gather_sorted_exactness_bound():
    # labels near the f32-exact ceiling round-trip exactly
    src = jnp.asarray(
        np.arange(lsd_gather.MAX_EXACT_LABEL - 128 * 64,
                  lsd_gather.MAX_EXACT_LABEL, dtype=np.int64)
        .astype(np.int32))
    idx = jnp.asarray(np.arange(1024, dtype=np.int32) * 8)
    out, ovf = lsd_gather.gather_sorted(src, idx, win_rows=64,
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(out),
                                  np.asarray(src)[np.asarray(idx)])
    assert int(ovf) == 0
