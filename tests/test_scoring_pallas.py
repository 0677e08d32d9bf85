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


def test_pick_seg_tile_vmem_law():
    """Regression pin for the round-5 scene2 VMEM OOM (tile=40, M=90 ->
    16.61 MB > 16 MB scoped limit): the tile choice must respect BOTH the
    historical N-scaled budget (tile=16 at M=160/N=16 measured 23.91 MB —
    the pure tile*M cap is NOT sufficient) and tile * M <= 3200 (the
    largest proven-fitting product; tile=32 at M=100 fits)."""
    from line3dpp_tpu.ops.scoring_pallas import pick_seg_tile

    # the exact failing shapes must pick smaller tiles than they did
    assert pick_seg_tile(9, 90, 10) <= 32       # was 40 (OOM)
    assert pick_seg_tile(16, 160, 10) <= 8      # 16 OOMs
    # proven-fitting shapes keep their tiles
    assert pick_seg_tile(10, 100, 10) == 32
    for N, knn in [(4, 4), (9, 10), (10, 10), (16, 10), (30, 10)]:
        M = N * knn
        t = pick_seg_tile(N, M, knn)
        assert t * M <= 3200 or t < 8
        assert t % 8 == 0
