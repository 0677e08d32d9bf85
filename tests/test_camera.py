import numpy as np
import pytest

from line3dpp_tpu.camera import (
    Camera,
    CameraBatch,
    decompose_projection_matrix,
    fundamental_matrix,
    median_center_translation,
    rotation_from_quaternion,
    rotation_from_rpy,
)


def random_camera(rng, f=1000.0, w=2000, h=1500):
    K = np.array([[f, 0, w / 2], [0, f, h / 2], [0, 0, 1.0]])
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0, 0.5)
    q = np.concatenate([[np.cos(ang / 2)], np.sin(ang / 2) * axis])
    R = rotation_from_quaternion(q)
    t = rng.normal(size=3)
    return Camera(K, R, t, w, h)


def test_rotation_from_quaternion_orthonormal(rng):
    q = rng.normal(size=4)
    R = rotation_from_quaternion(q)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_rotation_from_rpy_orthonormal(rng):
    R = rotation_from_rpy(0.3, -0.2, 1.1)
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)


def test_camera_center_and_rays(rng):
    cam = random_camera(rng)
    # camera center projects to undefined, but C + depth*ray(pp) lies on axis
    ray = cam.ray(cam.pp[:2])
    X = cam.C + 5.0 * ray
    uv = cam.project(X)
    assert np.allclose(uv, cam.pp[:2], atol=1e-6)


def test_project_unproject_roundtrip(rng):
    cam = random_camera(rng)
    p = np.array([345.0, 789.0])
    ray = cam.ray(p)
    X = cam.C + 3.7 * ray
    assert np.allclose(cam.project(X), p, atol=1e-6)


def test_decompose_projection_matrix(rng):
    cam = random_camera(rng)
    P = cam.K @ np.hstack([cam.R, cam.t[:, None]])
    P *= 2.37  # arbitrary scale
    K, R, t = decompose_projection_matrix(P)
    assert np.allclose(K / K[2, 2], cam.K, atol=1e-6)
    assert np.allclose(R, cam.R, atol=1e-9)
    assert np.allclose(t, cam.t, atol=1e-9)


def test_fundamental_matrix_epipolar_constraint(rng):
    cam1 = random_camera(rng)
    cam2 = random_camera(rng)
    F = fundamental_matrix(cam1, cam2)
    # points projecting from common 3D points satisfy x2^T F x1 = 0
    for _ in range(10):
        X = rng.normal(size=3) * 2 + np.array([0, 0, 8.0])
        x1 = np.append(cam1.project(X), 1.0)
        x2 = np.append(cam2.project(X), 1.0)
        assert abs(x2 @ F @ x1) < 1e-5 * np.linalg.norm(F) * 1e6


def test_spatial_regularizer_small_angle(rng):
    cam = random_camera(rng, f=1000.0)
    k = cam.spatial_regularizer(2.5)
    # sin(angle of 2.5px at f=1000) ~ 2.5/1000
    assert abs(k - 2.5e-3) < 1e-4


def test_median_center_translation(rng):
    cams = [random_camera(rng) for _ in range(9)]
    tr = median_center_translation(cams)
    centers = np.stack([c.C for c in cams])
    for i in range(3):
        vals = np.sort(centers[:, i])
        assert np.isclose(tr[i], vals[len(vals) // 2])


def test_camera_batch_centering(rng):
    cams = [random_camera(rng) for _ in range(5)]
    cb = CameraBatch.from_cameras(cams, sigma_p=2.5)
    tr = median_center_translation(cams)
    for i, cam in enumerate(cams):
        assert np.allclose(cb.C[i], (cam.C - tr).astype(np.float32), atol=1e-5)
        # centered t must be consistent: t = -R C_centered
        assert np.allclose(cb.t[i], (-cam.R @ (cam.C - tr)).astype(np.float32), atol=1e-5)


def test_fundamental_matrices_batch_matches_single(rng):
    from line3dpp_tpu.camera import fundamental_matrices

    cams = [random_camera(rng) for _ in range(6)]
    src = np.array([0, 1, 2, 3, 5, 0, 4])
    tgt = np.array([1, 0, 5, 4, 2, 3, 4])
    Fb = fundamental_matrices(cams, src, tgt)
    for p, (i, j) in enumerate(zip(src, tgt)):
        np.testing.assert_allclose(Fb[p], fundamental_matrix(cams[i], cams[j]),
                                   rtol=1e-12, atol=1e-14)
