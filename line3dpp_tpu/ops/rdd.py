"""Replicator-dynamics diffusion (RDD) over the affinity matrix.

Optional sharpening of the sparse affinity matrix before clustering
(reference: performRDD line3D.cc:2026-2076, GPU-only kernels
K_sparseMat_row_normalization / K_sparseMat_diffusion_step
cudawrapper.cu:432-544):

    P <- row_normalize(W)
    repeat 10x:  P <- row_normalize(P ∘ (P @ W))
    W_out(i, j) <- min(P(i, j), P(j, i))

TPU-first design, two formulations sharing the same math:

* :func:`rdd_dense` — the affinity matrix as a dense [N, N] array, P @ W on
  the MXU in row chunks.  Simple and fast for small scenes, O(N^2) memory.
* :func:`rdd_sparse` — the default.  The reference diffuses a *sparse*
  matrix with per-edge sorted row/column intersection kernels
  (sparsematrix.h:32-78, cudawrapper.cu:480-544); the TPU equivalent is a
  **degree-padded CSR**: ``nbr[N, D]`` / ``w[N, D]`` slot tensors (invalid
  slots point at a zero sentinel row).  The sampled product
  ``(P @ W)(r, c)`` for every pattern position c=nbr[r, d] becomes, per
  row chunk, a gather of the neighbor rows' slot tables plus an
  equality-mask contraction

      out[r, d] = sum_{d2, s} P[r, d2] * W[k, s] * (nbr[k, s] == nbr[r, d]),
      k = nbr[r, d2]

  — static shapes, row-wise gathers, and a [D^2, D]-shaped batched matmul
  on the MXU instead of per-edge binary searches.  O(E * D) memory.
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


def _pow2_at_least(n: int, floor: int = 8) -> int:
    return max(floor, 1 << (max(n - 1, 1)).bit_length())


def build_padded_csr(ei, ej, ew, num_nodes: int):
    """Host-side: undirected COO edges (one direction each, no duplicates)
    -> degree-padded CSR of the symmetric matrix.

    Returns ``nbr [N, D] int32`` (pad slots = N, the sentinel row),
    ``w [N, D] f32``, ``slot_i/slot_j [E]`` (the slot of edge e in row
    ei[e] / ej[e]) and ``rev [N, D] int32`` (slot of the reverse edge in
    the neighbor's row, for min-symmetrization).  D = max degree rounded
    to the next power of two: the jitted core is specialized per D, and
    power-of-two buckets keep recompiles rare across runs.
    """
    ei = np.asarray(ei, np.int64)
    ej = np.asarray(ej, np.int64)
    ew = np.asarray(ew, np.float32)
    E = len(ei)
    src = np.concatenate([ei, ej])
    dst = np.concatenate([ej, ei])
    wsym = np.concatenate([ew, ew])
    deg = np.bincount(src, minlength=num_nodes)
    D = _pow2_at_least(int(deg.max()) if E else 1)

    order = np.argsort(src, kind="stable")
    slot_in_row = np.arange(2 * E) - np.repeat(
        np.concatenate([[0], np.cumsum(deg)[:-1]]), deg)
    nbr = np.full((num_nodes, D), num_nodes, np.int32)
    w = np.zeros((num_nodes, D), np.float32)
    rows = src[order]
    slots = slot_in_row
    nbr[rows, slots] = dst[order].astype(np.int32)
    w[rows, slots] = wsym[order]

    # slot of directed edge k in its row, in original edge order
    slot_of = np.empty(2 * E, np.int64)
    slot_of[order] = slots
    slot_i = slot_of[:E].astype(np.int32)          # edge e at (ei, slot_i)
    slot_j = slot_of[E:].astype(np.int32)          # reverse at (ej, slot_j)

    # rev[r, d]: slot of edge (nbr[r,d] -> r) in row nbr[r,d]
    rev = np.zeros((num_nodes, D), np.int32)
    rev[rows, slots] = slot_of[(order + E) % (2 * E)].astype(np.int32)
    return nbr, w, slot_i, slot_j, rev


@functools.partial(jax.jit, static_argnames=("iterations", "row_chunk"))
def rdd_sparse(nbr: jnp.ndarray, w: jnp.ndarray, rev: jnp.ndarray,
               iterations: int = 10, row_chunk: int = 256):
    """Diffuse a degree-padded-CSR symmetric matrix; returns the
    min-symmetrized diffused slot weights ``P [N, D]``.

    Same math as :func:`rdd_dense` / performRDD (line3D.cc:2026-2076),
    restricted to the sparsity pattern exactly as the reference's
    K_sparseMat_diffusion_step (cudawrapper.cu:480-544) — the product is
    only ever sampled at pattern positions, and row normalization runs
    over the pattern slots.
    """
    N, D = nbr.shape
    pad_rows = (-N) % row_chunk
    Np = N + pad_rows

    def pad_tables(x, fill):
        # row-chunk padding + sentinel row at index Np (zeros / N)
        return jnp.concatenate(
            [x, jnp.full((pad_rows + 1, D), fill, x.dtype)], axis=0)

    valid_n = nbr < N                                       # (N, D)
    nbr_t = pad_tables(jnp.where(valid_n, nbr, Np), Np)     # invalid -> sentinel
    rev_t = pad_tables(jnp.where(valid_n, rev, 0), 0)
    W_t = pad_tables(jnp.where(valid_n, w, 0.0), 0.0)       # (Np+1, D)
    valid = nbr_t[:Np] < N                                  # (Np, D)

    def row_normalize(P):
        return P / jnp.maximum(P.sum(axis=1, keepdims=True), EPS)

    def with_sentinel(P):
        return jnp.concatenate([P, jnp.zeros((1, D), P.dtype)], axis=0)

    def sampled_product(P_t):
        """M[r, d] = (P @ W)(r, nbr[r, d]) over the pattern."""
        def chunk_fn(start):
            rows = jax.lax.dynamic_slice(nbr_t, (start, 0), (row_chunk, D))
            P_c = jax.lax.dynamic_slice(P_t, (start, 0), (row_chunk, D))
            K = nbr_t[rows]                     # (B, D, D) neighbor rows' ids
            WK = W_t[rows]                      # (B, D, D) neighbor rows' w
            t = P_c[:, :, None] * WK            # (B, D, D) P(r,k) * W(k, s)
            eq = (K[:, :, :, None] == rows[:, None, None, :])
            return jax.lax.dot_general(
                t.reshape(row_chunk, D * D),
                eq.reshape(row_chunk, D * D, D).astype(jnp.float32),
                (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)          # (B, D)

        starts = jnp.arange(0, Np, row_chunk)
        return jax.lax.map(chunk_fn, starts).reshape(Np, D)

    P = row_normalize(jnp.where(valid, W_t[:Np], 0.0))

    def one_iter(P, _):
        M = sampled_product(with_sentinel(P))
        return row_normalize(P * jnp.where(valid, M, 0.0)), None

    P, _ = jax.lax.scan(one_iter, P, None, length=iterations)

    # min-symmetrize (line3D.cc:2039-2057): P(r,c) vs P(c,r) via the
    # precomputed reverse-slot map, in row chunks
    P_t = with_sentinel(P)

    def sym_chunk(start):
        rows = jax.lax.dynamic_slice(nbr_t, (start, 0), (row_chunk, D))
        revs = jax.lax.dynamic_slice(rev_t, (start, 0), (row_chunk, D))
        P_c = jax.lax.dynamic_slice(P_t, (start, 0), (row_chunk, D))
        P_rev = jnp.take_along_axis(P_t[rows], revs[:, :, None],
                                    axis=2)[..., 0]
        return jnp.minimum(P_c, P_rev)

    starts = jnp.arange(0, Np, row_chunk)
    P_sym = jax.lax.map(sym_chunk, starts).reshape(Np, D)
    return jnp.where(valid, P_sym, 0.0)[:N]


def rdd_edges(
    ei: np.ndarray, ej: np.ndarray, ew: np.ndarray, num_nodes: int,
    iterations: int = 10,
) -> np.ndarray:
    """Run RDD given undirected COO edges; returns diffused weights per edge.

    Matches the sparse-matrix flow of performRDD (line3D.cc:2039-2057):
    the symmetric sparse matrix is built from the edge list, diffused over
    its pattern only, min-symmetrized, and sampled back at the (i, j)
    positions.  Memory is O(E * max_degree) — no N x N densification.
    """
    ei = np.asarray(ei)
    ej = np.asarray(ej)
    ew = np.asarray(ew, np.float32)
    if len(ei) == 0:
        return ew
    # canonicalize: accept either one or both directions per undirected edge
    lo = np.minimum(ei, ej).astype(np.int64)
    hi = np.maximum(ei, ej).astype(np.int64)
    uniq, first, inv = np.unique(lo * num_nodes + hi, return_index=True,
                                 return_inverse=True)
    nbr, w, slot_i, _slot_j, rev = build_padded_csr(
        lo[first], hi[first], ew[first], num_nodes)
    D = nbr.shape[1]
    # the equality tensor materializes (chunk, D, D, D) f32 per map step;
    # bound it to ~128 MB
    row_chunk = int(max(8, min(256, (128 << 20) // max(D * D * D * 4, 1))))
    P = np.asarray(rdd_sparse(jnp.asarray(nbr), jnp.asarray(w),
                              jnp.asarray(rev), iterations=iterations,
                              row_chunk=row_chunk))
    # sample back at the callers' (possibly two-directional) edge order; the
    # matrix is min-symmetrized so both directions read the same value
    return P[lo[first], slot_i][inv]
