"""Pallas scoring kernel vs the XLA scoring path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.ops import scoring, scoring_pallas


def test_pallas_scoring_matches_xla(rng):
    V, S, N, k = 6, 40, 4, 5
    M = N * k

    def unit(shape):
        v = rng.normal(size=shape)
        return v / np.linalg.norm(v, axis=-1, keepdims=True)

    r1 = unit((V, S, 3)).astype(np.float32)
    r2 = unit((V, S, 3)).astype(np.float32)
    rmid = unit((V, S, 3)).astype(np.float32)
    C = rng.normal(size=(V, 3)).astype(np.float32)
    k_reg = rng.uniform(1e-3, 3e-3, V).astype(np.float32)
    nbr = np.stack([rng.permutation(V - 1)[:N] for _ in range(V)]).astype(np.int32)
    d1 = rng.uniform(1.0, 12.0, (V, S, M)).astype(np.float32)
    d2 = d1 + rng.normal(0, 0.4, (V, S, M)).astype(np.float32)
    valid = rng.uniform(size=(V, S, M)) > 0.25

    ref = scoring.score_matches(
        jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(rmid),
        jnp.asarray(C), jnp.asarray(k_reg), jnp.asarray(nbr),
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid),
        knn=k, two_sig_a_sqr=200.0, min_similarity=0.5,
        check_orientation=True, chunk=32)

    out = scoring_pallas.score_matches_pallas(
        jnp.asarray(r1), jnp.asarray(r2), jnp.asarray(rmid),
        jnp.asarray(C), jnp.asarray(k_reg), jnp.asarray(nbr),
        jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(valid),
        knn=k, two_sig_a_sqr=200.0, min_similarity=0.5,
        check_orientation=True, seg_tile=16, interpret=True)

    np.testing.assert_array_equal(np.asarray(out.valid), np.asarray(ref.valid))
    np.testing.assert_allclose(
        np.asarray(out.score3d), np.asarray(ref.score3d), rtol=2e-4, atol=2e-4)
