"""One-hot MXU target-estimate gather (ops/affinity_pallas.py) vs the XLA
advanced-indexing gather it replaces — must be bit-exact, and the full
affinity_dense outputs must match between the two paths."""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.ops import affinity, affinity_pallas


def _case(rng, V=4, S=40, N=3, k=5):
    est_P1 = rng.normal(size=(V, S, 3)).astype(np.float32)
    est_P2 = est_P1 + rng.normal(size=(V, S, 3)).astype(np.float32)
    est_d1 = rng.uniform(1.0, 9.0, (V, S)).astype(np.float32)
    est_d2 = rng.uniform(1.0, 9.0, (V, S)).astype(np.float32)
    est_valid = rng.uniform(size=(V, S)) < 0.7
    nbr = np.stack([rng.permutation(V)[:N] for _ in range(V)]).astype(np.int32)
    tgt_seg = rng.integers(0, S, (V, S, N * k)).astype(np.int32)
    return est_P1, est_P2, est_d1, est_d2, est_valid, nbr, tgt_seg


def test_gather_matches_xla(rng):
    est_P1, est_P2, est_d1, est_d2, est_valid, nbr, tgt_seg = _case(rng)
    # regression: a VALID estimate with est_d1 == 0.0 exactly must stay
    # valid through the sign-encoded gather (validity decodes as d1 >= 0)
    est_valid[:, 0] = True
    est_d1[:, 0] = 0.0
    V, S, M = tgt_seg.shape
    k = M // nbr.shape[1]

    P1b, P2b, d1b, d2b, validb = affinity_pallas.gather_target_estimates(
        jnp.asarray(est_P1), jnp.asarray(est_P2), jnp.asarray(est_d1),
        jnp.asarray(est_d2), jnp.asarray(est_valid), jnp.asarray(nbr),
        jnp.asarray(tgt_seg), k, interpret=True)

    tview = np.repeat(nbr, k, axis=1)[:, None, :] * np.ones((V, S, M), int)
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(P1b[i]),
                                      est_P1[..., i][tview, tgt_seg])
        np.testing.assert_array_equal(np.asarray(P2b[i]),
                                      est_P2[..., i][tview, tgt_seg])
    want_valid = est_valid[tview, tgt_seg]
    np.testing.assert_array_equal(np.asarray(validb), want_valid)
    np.testing.assert_array_equal(np.asarray(d1b)[want_valid],
                                  est_d1[tview, tgt_seg][want_valid])
    np.testing.assert_array_equal(np.asarray(d2b), est_d2[tview, tgt_seg])


def test_affinity_dense_pallas_path(rng):
    """affinity_dense(use_pallas=True) == affinity_dense(use_pallas=False)
    wherever edges are valid (invalid targets' d1 differ by encoding but are
    masked)."""
    est_P1, est_P2, est_d1, est_d2, est_valid, nbr, tgt_seg = _case(rng)
    V, S, M = tgt_seg.shape
    k = M // nbr.shape[1]
    fm = affinity.FilteredMatches(
        kept=jnp.asarray(rng.uniform(size=(V, S, M)) < 0.6),
        est_valid=jnp.asarray(est_valid),
        est_P1=jnp.asarray(est_P1), est_P2=jnp.asarray(est_P2),
        est_d1=jnp.asarray(est_d1), est_d2=jnp.asarray(est_d2),
        max_score=jnp.ones((V,), jnp.float32),
    )
    k_reg = jnp.asarray(rng.uniform(0.001, 0.01, V).astype(np.float32))
    med = jnp.asarray(rng.uniform(3, 8, V).astype(np.float32))

    a = affinity.affinity_dense(fm, jnp.asarray(tgt_seg), jnp.asarray(nbr),
                                k_reg, med, 5.0, 200.0, 0.5)
    b = affinity.affinity_dense(fm, jnp.asarray(tgt_seg), jnp.asarray(nbr),
                                k_reg, med, 5.0, 200.0, 0.5,
                                use_pallas=True, pallas_interpret=True)
    np.testing.assert_array_equal(np.asarray(a.edge_valid),
                                  np.asarray(b.edge_valid))
    np.testing.assert_allclose(np.asarray(a.weight), np.asarray(b.weight),
                               rtol=1e-6, atol=1e-7)
    assert int(np.asarray(a.edge_valid).sum()) > 0


def test_gather_sharded_global_tables(rng):
    """Sharded case: local source views gather from GLOBAL estimate tables
    (more views than the local shard)."""
    est_P1, est_P2, est_d1, est_d2, est_valid, nbr, tgt_seg = _case(
        rng, V=6, S=30, N=2, k=4)
    # local shard = first 3 views' match tables; targets may be any view
    Vl = 3
    nbr_l = nbr[:Vl]
    tgt_l = tgt_seg[:Vl]
    k = tgt_seg.shape[2] // nbr.shape[1]

    P1b, P2b, d1b, d2b, validb = affinity_pallas.gather_target_estimates(
        jnp.asarray(est_P1), jnp.asarray(est_P2), jnp.asarray(est_d1),
        jnp.asarray(est_d2), jnp.asarray(est_valid), jnp.asarray(nbr_l),
        jnp.asarray(tgt_l), k, interpret=True)

    S, M = tgt_l.shape[1], tgt_l.shape[2]
    tview = np.repeat(nbr_l, k, axis=1)[:, None, :] * np.ones(
        (Vl, S, M), int)
    np.testing.assert_array_equal(np.asarray(P1b[0]),
                                  est_P1[..., 0][tview, tgt_l])
    np.testing.assert_array_equal(np.asarray(validb),
                                  est_valid[tview, tgt_l])
