"""Bundling (batched LM over Cayley line parameters) tests.

Validates the Ceres-replacement math (reference: optimization.cc:8-303):
round-trip of the Cayley/Plücker parametrization, and recovery of perturbed
3D lines from exact 2D observations.
"""

import numpy as np
import jax.numpy as jnp

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import CameraBatch, rotation_from_rpy
from line3dpp_tpu.ops import bundling


def test_cayley_plucker_roundtrip(rng):
    P1 = rng.normal(size=(20, 3)) * 3
    P2 = P1 + rng.normal(size=(20, 3))
    m, v = bundling.plucker_from_endpoints(jnp.asarray(P1), jnp.asarray(P2))
    s, w = bundling.params_from_plucker(m, v)
    m2, v2 = bundling.plucker_from_params(s, w)
    scale = np.sqrt(np.linalg.norm(np.asarray(m), axis=1) ** 2 + 1.0)
    np.testing.assert_allclose(np.asarray(m2) * scale[:, None], np.asarray(m),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(v2) * scale[:, None], np.asarray(v),
                               atol=1e-4)


def _scene(rng, n_lines=6, n_views=5):
    P1 = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    P2 = P1 + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))

    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    cams = []
    for i in range(n_views):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.05 * i + 0.12,
                              rng.normal() * 0.02)
        C = np.array([0.5 * i - 1.2, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))
    return P1, P2, cams


def test_lm_recovers_perturbed_lines(rng):
    n_lines, n_views = 6, 5
    P1, P2, cams = _scene(rng, n_lines, n_views)
    cb = CameraBatch.from_cameras(cams, sigma_p=2.5, translation=np.zeros(3))

    # every line observed in every view; segs2d indexed [view, line]
    segs = np.zeros((n_views, n_lines, 4), np.float32)
    for i, cam in enumerate(cams):
        segs[i] = np.hstack([cam.project(P1), cam.project(P2)])

    mc = np.tile(np.arange(n_lines, dtype=np.int32), n_views)
    mv = np.repeat(np.arange(n_views, dtype=np.int32), n_lines)
    ms = np.tile(np.arange(n_lines, dtype=np.int32), n_views)

    pert1 = P1 + rng.normal(size=P1.shape) * 0.02
    pert2 = P2 + rng.normal(size=P2.shape) * 0.02

    st = dict(cb=cb, segs=segs)
    newP1, newP2, ndir = bundling.optimize_cluster_lines(
        pert1.astype(np.float32), pert2.astype(np.float32),
        mc, mv, ms, n_lines, st, l3d.Config())

    # refined lines must reproject onto the observed 2D segments
    true_dir = (P2 - P1) / np.linalg.norm(P2 - P1, axis=1, keepdims=True)
    for c in range(n_lines):
        # line-to-line distance: angle + point-to-line
        cosang = abs(float(ndir[c] @ true_dir[c]))
        assert cosang > 0.9999, f"direction off for line {c}: {cosang}"
        w = newP1[c] - P1[c]
        perp = w - (w @ true_dir[c]) * true_dir[c]
        assert np.linalg.norm(perp) < 5e-3, f"offset {np.linalg.norm(perp)}"

    # and improve on the perturbed initialization
    def line_err(Ps, Qs):
        err = 0.0
        for c in range(n_lines):
            dd = (Qs[c] - Ps[c]) / np.linalg.norm(Qs[c] - Ps[c])
            w = Ps[c] - P1[c]
            err += np.linalg.norm(w - (w @ true_dir[c]) * true_dir[c])
            err += 1.0 - abs(dd @ true_dir[c])
        return err

    assert line_err(newP1, newP2) < 0.25 * line_err(pert1, pert2)
