"""Vectorized worldpoint-overlap neighbor selection vs the straightforward
per-view loop it replaced (reference: findVisualNeighborsFromWPs
line3D.cc:578-699).  The sparse-matmul overlap counts, axis-angle filter,
score/diversity rerank and baseline floor must reproduce the loop exactly
(ties broken by ascending target id in both)."""

import numpy as np
import pytest

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy


def _loop_reference(views, cams, cam_ids, N):
    """The pre-vectorization implementation, with the same deterministic
    (-score, target-index) candidate order."""
    id2idx = {c: i for i, c in enumerate(cam_ids)}
    out = {}
    wp2views = {}
    for c in cam_ids:
        for wp in views[c]:
            wp2views.setdefault(wp, []).append(c)
    for ci, c in enumerate(cam_ids):
        common = {}
        for wp in views[c]:
            for v2 in wp2views.get(wp, []):
                if v2 != c:
                    common[v2] = common.get(v2, 0) + 1
        cand = []
        v = cams[ci]
        nwp_c = len(views[c])
        for v2_id, n_common in common.items():
            v2 = cams[id2idx[v2_id]]
            axis_angle = float(np.arccos(np.clip(
                v.optical_axis() @ v2.optical_axis(), -1, 1)))
            if axis_angle < 1.571 and n_common > 4:
                score = 2.0 * n_common / (nwp_c + len(views[v2_id]))
                Ct = v.R @ v2.C + v.t
                cand.append((score, abs(Ct[0]) + abs(Ct[1]), v2_id))
        cand.sort(key=lambda x: (-x[0], id2idx[x[2]]))
        if len(cand) > N:
            score_t = 0.80 * cand[0][0]
            big = [x for x in cand if x[0] > score_t]
            big.sort(key=lambda x: -x[1])
            merged = big[: N // 2] + cand
        else:
            merged = cand
        used = []
        for _, _, v2_id in merged:
            if len(used) >= N:
                break
            v2 = cams[id2idx[v2_id]]
            if v2_id not in used and np.linalg.norm(v.C - v2.C) > 0.1:
                used.append(v2_id)
        out[c] = used
    return out


def _scene(rng, V=14, n_wp=160):
    cams, views = [], {}
    K = np.array([[1000.0, 0, 640], [0, 1000.0, 480], [0, 0, 1]])
    cam_ids = list(range(0, 2 * V, 2))  # non-contiguous ids
    for i, c in enumerate(cam_ids):
        R = rotation_from_rpy(rng.normal() * 0.1, rng.normal() * 0.3,
                              rng.normal() * 0.1)
        C = rng.normal(size=3) * np.array([3.0, 0.5, 0.5])
        cams.append(l3d.Camera(K, R, -R @ C, 1280, 960))
        nv = rng.integers(20, 60)
        views[c] = list(rng.choice(n_wp, size=nv, replace=False))
    return cams, views, cam_ids


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_loop(seed):
    rng = np.random.default_rng(seed)
    cams, views, cam_ids = _scene(rng)

    pipe = l3d.Line3D()
    for c, cam in zip(cam_ids, cams):
        pipe.add_view(c, cam, np.zeros((1, 4)), worldpoints=views[c])

    for N in (4, 10):
        got = pipe._visual_neighbors(cam_ids, cams, N)
        want = _loop_reference(views, cams, cam_ids, N)
        assert got == want


def test_identical_centers_excluded():
    """The 0.1 baseline floor must drop co-located cameras."""
    rng = np.random.default_rng(5)
    cams, views, cam_ids = _scene(rng, V=6)
    # make camera 1 co-located with camera 0 and sharing its worldpoints
    cams[1] = l3d.Camera(cams[0].K, cams[0].R, cams[0].t, 1280, 960)
    views[cam_ids[1]] = list(views[cam_ids[0]])

    pipe = l3d.Line3D()
    for c, cam in zip(cam_ids, cams):
        pipe.add_view(c, cam, np.zeros((1, 4)), worldpoints=views[c])
    got = pipe._visual_neighbors(cam_ids, cams, 4)
    assert cam_ids[1] not in got[cam_ids[0]]
    assert got == _loop_reference(views, cams, cam_ids, 4)


def test_geometric_fallback_matches_loop():
    rng = np.random.default_rng(9)
    cams, views, cam_ids = _scene(rng, V=12)

    pipe = l3d.Line3D()
    for c, cam in zip(cam_ids, cams):
        pipe.add_view(c, cam, np.zeros((1, 4)))  # no worldpoints

    got = pipe._visual_neighbors(cam_ids, cams, 5)
    for ci, c in enumerate(cam_ids):
        dists = sorted(
            (np.linalg.norm(cams[ci].C - cams[cj].C), cam_ids[cj])
            for cj in range(len(cam_ids)) if cj != ci)
        assert got[c] == [cid for _, cid in dists[:5]]
