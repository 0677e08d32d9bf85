"""The fused forward step and its view-sharded multi-chip variant must agree.

The sharded path is the TPU-native replacement for the reference's
single-GPU execution (SURVEY.md §2.3, §7.2); both are validated against the
single-device fused step, which in turn is covered by the golden/synthetic
end-to-end tests.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import CameraBatch, fundamental_matrix, rotation_from_rpy
from line3dpp_tpu.models.step import forward_step
from line3dpp_tpu.parallel import sharded


def _make_scene(V=8, n_lines=14, S=32, seed=3):
    rng = np.random.default_rng(seed)
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))

    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    cams = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.04 * i + 0.14, rng.normal() * 0.02)
        C = np.array([0.5 * i - 1.6, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))

    segs = np.zeros((V, S, 4), np.float32)
    mask = np.zeros((V, S), bool)
    for i, cam in enumerate(cams):
        sv = np.hstack([cam.project(P), cam.project(Q)])
        segs[i, : len(sv)] = sv
        mask[i, : len(sv)] = True

    from line3dpp_tpu.camera import median_center_translation

    translation = median_center_translation(cams)
    cb = CameraBatch.from_cameras(cams, sigma_p=2.5, translation=translation)
    N = 4
    neighbor_ids = np.zeros((V, N), np.int32)
    pair_valid = np.zeros((V, N), bool)
    F = np.zeros((V, N, 3, 3), np.float32)
    centered = [l3d.Camera(c.K, c.R, -c.R @ (c.C - translation), c.width, c.height)
                for c in cams]
    for i in range(V):
        nbrs = [j for j in range(V) if j != i]
        nbrs.sort(key=lambda j: np.linalg.norm(cams[i].C - cams[j].C))
        for g, j in enumerate(nbrs[:N]):
            neighbor_ids[i, g] = j
            pair_valid[i, g] = True
            F[i, g] = fundamental_matrix(centered[i], centered[j])
    return segs, mask, cb, neighbor_ids, F, pair_valid


STATIC = dict(epipolar_overlap=0.25, knn=4, two_sig_a_sqr=200.0,
              min_similarity=0.5, check_orientation=True,
              min_best_score=0.75, min_best_score_perc=0.10,
              min_affinity=0.5)


def test_fused_step_runs_and_finds_estimates():
    segs, mask, cb, nbr, F, pv = _make_scene()
    out = forward_step(
        jnp.asarray(segs), jnp.asarray(mask), jnp.asarray(cb.RtKinv),
        jnp.asarray(cb.C), jnp.asarray(cb.k_reg), jnp.asarray(nbr),
        jnp.asarray(F), jnp.asarray(pv), **STATIC,
    )
    est_valid = np.asarray(out.est_valid)
    assert est_valid.sum() > 0, "no 3D estimates found on a clean synthetic scene"
    aff = np.asarray(out.aff_valid)
    assert aff.sum() > 0, "no affinity edges on a clean synthetic scene"
    assert np.all(np.asarray(out.median_depth) > 0)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_step_matches_single_device():
    segs, mask, cb, nbr, F, pv = _make_scene()
    ref = forward_step(
        jnp.asarray(segs), jnp.asarray(mask), jnp.asarray(cb.RtKinv),
        jnp.asarray(cb.C), jnp.asarray(cb.k_reg), jnp.asarray(nbr),
        jnp.asarray(F), jnp.asarray(pv), **STATIC,
    )

    mesh = sharded.make_mesh(4)
    fn = sharded.sharded_forward_step(mesh, **STATIC)
    args = sharded.shard_inputs(mesh, segs, mask, cb.RtKinv, cb.C, cb.k_reg,
                                nbr, F, pv)
    out = fn(*args)

    # XLA fuses the component-wise math differently inside shard_map, so
    # scores match to f32 noise, not bit-exactly; the decisions must agree.
    np.testing.assert_array_equal(np.asarray(out.est_valid), np.asarray(ref.est_valid))
    np.testing.assert_allclose(
        np.asarray(out.score3d), np.asarray(ref.score3d), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.aff_weight), np.asarray(ref.aff_weight), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.est_P1), np.asarray(ref.est_P1), rtol=1e-3, atol=1e-3)


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multi-device mesh")
def test_sharded_step_with_pallas_matches_single_device():
    """shard_map x Pallas composition: the production multi-chip path runs
    the Pallas matching/scoring/affinity kernels INSIDE the shard_map (the
    all-gathered seg_all tables + global neighbor_ids feed the kernels).
    Interpret mode exercises the exact same indexing/layout on the CPU mesh
    that compiled kernels use on real chips."""
    segs, mask, cb, nbr, F, pv = _make_scene()
    ref = forward_step(
        jnp.asarray(segs), jnp.asarray(mask), jnp.asarray(cb.RtKinv),
        jnp.asarray(cb.C), jnp.asarray(cb.k_reg), jnp.asarray(nbr),
        jnp.asarray(F), jnp.asarray(pv),
        use_pallas_matching=True, use_pallas_scoring=True,
        pallas_interpret=True, **STATIC,
    )

    mesh = sharded.make_mesh(4)
    fn = sharded.sharded_forward_step(
        mesh, use_pallas=True, pallas_interpret=True, **STATIC)
    args = sharded.shard_inputs(mesh, segs, mask, cb.RtKinv, cb.C, cb.k_reg,
                                nbr, F, pv)
    out = fn(*args)

    np.testing.assert_array_equal(np.asarray(out.est_valid), np.asarray(ref.est_valid))
    np.testing.assert_array_equal(np.asarray(out.match_valid), np.asarray(ref.match_valid))
    np.testing.assert_allclose(
        np.asarray(out.score3d), np.asarray(ref.score3d), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.aff_weight), np.asarray(ref.aff_weight), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(out.est_P1), np.asarray(ref.est_P1), rtol=1e-3, atol=1e-3)
