"""Replicator-dynamics diffusion (RDD) over the affinity matrix.

Optional sharpening of the sparse affinity matrix before clustering
(reference: performRDD line3D.cc:2026-2076, GPU-only kernels
K_sparseMat_row_normalization / K_sparseMat_diffusion_step
cudawrapper.cu:432-544):

    P <- row_normalize(W)
    repeat 10x:  P <- row_normalize(P ∘ (P @ W))
    W_out(i, j) <- min(P(i, j), P(j, i))

TPU-first design: the iteration is matmul-shaped, so instead of the
reference's per-edge row/column intersection kernels the compacted node set
becomes a dense [N, N] matrix and P @ W runs on the MXU in row chunks
(``lax.map`` bounds HBM).  The clusterable node set of a 26-image scene is
~10-30k, i.e. 0.4-3.6 GB dense — well inside a chip; RDD stays an optional
flag (off by default, as upstream) for larger scenes.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

EPS = 1e-12


@functools.partial(jax.jit, static_argnames=("iterations", "row_chunk"))
def rdd_dense(W: jnp.ndarray, iterations: int = 10, row_chunk: int = 2048):
    """Diffuse a dense symmetric affinity matrix; returns min-symmetrized P."""
    N = W.shape[0]
    pad = (-N) % row_chunk
    Wp = jnp.pad(W, ((0, pad), (0, pad)))
    Np = N + pad

    def row_normalize(M):
        return M / jnp.maximum(M.sum(axis=1, keepdims=True), EPS)

    P = row_normalize(Wp)

    def one_iter(P, _):
        chunks = P.reshape(Np // row_chunk, row_chunk, Np)

        def step(Pc):
            PW = jnp.matmul(Pc, Wp, precision=jax.lax.Precision.HIGHEST)
            return Pc * PW

        P = jax.lax.map(step, chunks).reshape(Np, Np)
        return row_normalize(P), None

    P, _ = jax.lax.scan(one_iter, P, None, length=iterations)
    P = jnp.minimum(P, P.T)
    return P[:N, :N]


def rdd_edges(
    ei: np.ndarray, ej: np.ndarray, ew: np.ndarray, num_nodes: int,
    iterations: int = 10,
) -> np.ndarray:
    """Run RDD given symmetric COO edges; returns diffused weights per edge.

    Matches the sparse-matrix flow of performRDD (line3D.cc:2039-2057): the
    dense matrix is built from the edge list, diffused, and sampled back at
    the same (i, j) positions.
    """
    W = np.zeros((num_nodes, num_nodes), np.float32)
    W[ei, ej] = ew
    W[ej, ei] = ew
    P = np.asarray(rdd_dense(jnp.asarray(W), iterations=iterations))
    return P[ei, ej]
