"""Pallas matching kernel vs the XLA reference path (interpret mode on CPU).

The kernel is the fused equivalent of K_match_lines + host kNN
(cudawrapper.cu:186-253, 592-650); both paths must select the same matches.
"""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.camera import CameraBatch, fundamental_matrix, rotation_from_rpy
from line3dpp_tpu.ops import matching, matching_pallas
import line3dpp_tpu as l3d


def _scene(rng, V=4, n_lines=20, S=64):
    P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.6, size=(n_lines, 1))
    K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
    cams = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.02, -0.05 * i + 0.1,
                              rng.normal() * 0.02)
        Cc = np.array([0.5 * i - 1.0, rng.normal() * 0.05, rng.normal() * 0.05])
        cams.append(l3d.Camera(K, R, -R @ Cc, 1920, 1080))
    segs = np.zeros((V, S, 4), np.float32)
    mask = np.zeros((V, S), bool)
    for i, cam in enumerate(cams):
        sv = np.hstack([cam.project(P), cam.project(Q)])
        segs[i, : len(sv)] = sv
        mask[i, : len(sv)] = True
    cb = CameraBatch.from_cameras(cams, sigma_p=2.5, translation=np.zeros(3))
    pairs = [(i, j) for i in range(V) for j in range(V) if i != j]
    src = np.array([p[0] for p in pairs], np.int32)
    tgt = np.array([p[1] for p in pairs], np.int32)
    F = np.stack([fundamental_matrix(cams[a], cams[b]) for a, b in pairs])
    return segs, mask, cb, src, tgt, F.astype(np.float32)


def test_pallas_matches_xla_reference(rng):
    segs, mask, cb, src, tgt, F = _scene(rng)
    pv = np.ones(len(src), bool)
    knn = 6

    ref = matching.match_pairs_batched(
        jnp.asarray(segs), jnp.asarray(mask), jnp.asarray(cb.RtKinv),
        jnp.asarray(cb.C), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(F), jnp.asarray(pv), 0.25, knn)

    out = matching_pallas.match_pairs_pallas(
        jnp.asarray(segs), jnp.asarray(mask), jnp.asarray(cb.RtKinv),
        jnp.asarray(cb.C), jnp.asarray(src), jnp.asarray(tgt),
        jnp.asarray(F), jnp.asarray(pv),
        epipolar_overlap=0.25, knn=knn, row_tile=32, interpret=True)

    # (P, k, S) -> (P, S, k)
    t = lambda x: np.asarray(x).transpose(0, 2, 1)
    got_idx, got_ov, got_valid = t(out.tgt_seg), t(out.overlap), t(out.valid)
    got_d = [t(out.d_p1), t(out.d_p2), t(out.d_q1), t(out.d_q2)]
    ref_d = [np.asarray(ref.d_p1), np.asarray(ref.d_p2),
             np.asarray(ref.d_q1), np.asarray(ref.d_q2)]

    P, S, _ = got_idx.shape
    rv = np.asarray(ref.valid)
    ri = np.asarray(ref.tgt_seg)
    ro = np.asarray(ref.overlap)
    for p in range(P):
        for s in range(S):
            want = {int(ri[p, s, i]): ro[p, s, i]
                    for i in range(knn) if rv[p, s, i]}
            got = {int(got_idx[p, s, i]): got_ov[p, s, i]
                   for i in range(knn) if got_valid[p, s, i]}
            assert set(got) == set(want), f"pair {p} row {s}"
            for c in want:
                assert abs(got[c] - want[c]) < 1e-4
            # depths agree for the selected matches
            for i in range(knn):
                if not rv[p, s, i]:
                    continue
                c = int(ri[p, s, i])
                gi = [j for j in range(knn)
                      if got_valid[p, s, j] and int(got_idx[p, s, j]) == c][0]
                for rd, gd in zip(ref_d, got_d):
                    np.testing.assert_allclose(
                        gd[p, s, gi], rd[p, s, i], rtol=2e-3, atol=1e-4)
