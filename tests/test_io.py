"""SfM reader tests on synthetic files (formats per reference executables:
main_vsfm.cpp, main_colmap.cpp, main_bundler.cpp, main_openmvg.cpp)."""

import json
import os

import numpy as np
import pytest

from line3dpp_tpu import io as sfm_io
from line3dpp_tpu.camera import rotation_from_quaternion


def test_read_nvm(tmp_path):
    nvm = tmp_path / "result.nvm"
    nvm.write_text(
        "NVM_V3\n\n2\n"
        "img0.jpg 1000 1 0 0 0  1 2 3  0.05 0\n"
        "img1.jpg 1100 0.9238795 0 0.3826834 0  4 5 6  0 0\n"
        "\n2\n"
        "0 0 10  255 0 0  2  0 0 5 5  1 0 6 6\n"
        "1 1 12  0 255 0  1  0 1 7 7\n"
    )
    views = sfm_io.read_nvm(str(nvm))
    assert len(views) == 2
    v0 = views[0]
    assert v0.K[0, 0] == 1000
    np.testing.assert_allclose(v0.R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(v0.t, -np.array([1, 2, 3]), atol=1e-12)  # t=-RC
    assert v0.worldpoints == [0, 1]
    assert views[1].worldpoints == [0]
    assert v0.distortion[0] == -0.05
    # median depth of cam0: Euclidean distance to C=(1,2,3) of (0,0,10)
    # -> sqrt(54) and of (1,1,12) -> sqrt(82); median = mean of the two
    d = (np.sqrt(54) + np.sqrt(82)) / 2
    assert v0.median_depth == pytest.approx(d)


def test_read_colmap(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# comment\n"
        "1 PINHOLE 640 480 500 510 320 240\n"
        "2 SIMPLE_RADIAL 640 480 520 320 240 0.1\n"
    )
    q = [0.9238795, 0.0, 0.3826834, 0.0]
    (tmp_path / "images.txt").write_text(
        "# comment\n"
        f"7 {q[0]} {q[1]} {q[2]} {q[3]} 0.1 0.2 0.3 1 a.jpg\n"
        "1 1 -1\n"
        "8 1 0 0 0 0 0 1 2 b.jpg\n"
        "\n"
    )
    (tmp_path / "points3D.txt").write_text(
        "# comment\n"
        "5 0 0 10 255 255 255 0.5 7 1 8 1\n"
    )
    views = sfm_io.read_colmap(str(tmp_path), "/imgs")
    assert [v.cam_id for v in views] == [7, 8]
    np.testing.assert_allclose(views[0].R, rotation_from_quaternion(q), atol=1e-7)
    assert views[0].K[0, 0] == 500 and views[0].K[1, 1] == 510
    assert views[1].K[0, 0] == 520 and views[1].distortion[0] == 0.1
    assert views[0].worldpoints == [5] and views[1].worldpoints == [5]
    assert views[1].median_depth == pytest.approx(11.0)


def test_read_bundler(tmp_path):
    bundle = tmp_path / "bundle.rd.out"
    bundle.write_text(
        "# Bundle file v0.3\n"
        "1 1\n"
        "800 0.01 0.001\n"
        "1 0 0\n0 1 0\n0 0 1\n"
        "1 2 3\n"
        "0 0 -10\n255 255 255\n1 0 0 1.5 2.5\n"
    )
    for n in ["a.jpg"]:
        (tmp_path / n).write_bytes(b"")
    views = sfm_io.read_bundler(str(bundle), str(tmp_path))
    assert len(views) == 1
    v = views[0]
    # y/z rows are sign-flipped
    np.testing.assert_allclose(v.R, np.diag([1.0, -1.0, -1.0]))
    np.testing.assert_allclose(v.t, [1.0, -2.0, -3.0])
    assert v.K[0, 0] == 800
    assert v.worldpoints == [0]


def test_read_openmvg(tmp_path):
    data = {
        "root_path": "/imgs",
        "views": [{
            "key": 0,
            "value": {"ptr_wrapper": {"data": {
                "id_view": 0, "id_pose": 0, "id_intrinsic": 0,
                "filename": "a.jpg", "local_path": "", "width": 640,
                "height": 480,
            }}},
        }],
        "intrinsics": [{
            "key": 0,
            "value": {"ptr_wrapper": {"data": {
                "focal_length": 900.0, "principal_point": [320.0, 240.0],
                "width": 640, "height": 480, "disto_k1": [0.02],
            }}},
        }],
        "extrinsics": [{
            "key": 0,
            "value": {"rotation": np.eye(3).tolist(),
                      "center": [1.0, 0.0, 0.0]},
        }],
        "structure": [{
            "key": 11,
            "value": {"X": [0.0, 0.0, 9.0],
                      "observations": [{"key": 0, "value": {}}]},
        }],
    }
    p = tmp_path / "sfm_data.json"
    p.write_text(json.dumps(data))
    views = sfm_io.read_openmvg(str(p))
    assert len(views) == 1
    v = views[0]
    assert v.K[0, 0] == 900
    np.testing.assert_allclose(v.t, [-1.0, 0.0, 0.0])
    assert v.worldpoints == [11]
    # Euclidean distance of (0,0,9) to C=(1,0,0)
    assert v.median_depth == pytest.approx(np.sqrt(82))


def test_read_mavmap(tmp_path):
    data = tmp_path / "image-data-1.txt"
    # full rows carry per-camera intrinsics (main_mavmap.cpp:176-193)
    data.write_text(
        "# header\n"
        "img0, 0, 0, 0, 47.0, 15.0, 100, 0, 1, 2, 3, 0, PINHOLE, "
        "500, 510, 320, 240\n"
    )
    views = sfm_io.read_mavmap(str(data), str(tmp_path))
    assert len(views) == 1
    np.testing.assert_allclose(views[0].R, np.eye(3), atol=1e-12)
    np.testing.assert_allclose(views[0].t, [-1, -2, -3], atol=1e-12)
    assert views[0].K[0, 0] == 500 and views[0].K[1, 1] == 510

    # non-PINHOLE model rejected (main_mavmap.cpp:188-193)
    bad = tmp_path / "image-data-2.txt"
    bad.write_text("img0, 0, 0, 0, 0, 0, 0, 0, 1, 2, 3, 0, OPENCV, "
                   "500, 510, 320, 240\n")
    with pytest.raises(ValueError):
        sfm_io.read_mavmap(str(bad), str(tmp_path))

    # truncated rows fall back to the K override
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    short = tmp_path / "image-data-3.txt"
    short.write_text("img0, 0, 0, 0, 47.0, 15.0, 100, 0, 1, 2, 3\n")
    views = sfm_io.read_mavmap(str(short), str(tmp_path), K)
    assert views[0].K[0, 0] == 500

    from line3dpp_tpu.io.mavmap import sequential_neighbors

    nbrs = sequential_neighbors(5, window=4)
    assert nbrs[0] == [1, 2, 3, 4]
    assert set(nbrs[2]) == {0, 1, 3, 4}


def test_undistort_identity_and_shift():
    from line3dpp_tpu.ops.undistort import undistort_image

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, size=(48, 64)).astype(np.float32)
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    out = undistort_image(img, K, np.zeros(5))
    np.testing.assert_allclose(out, img, atol=1e-3)

    # small radial distortion must move off-center pixels, keep center fixed
    out2 = undistort_image(img, K, np.array([0.1, 0, 0, 0, 0]))
    assert abs(float(out2[24, 32]) - float(img[24, 32])) < 2.0
    assert not np.allclose(out2, img)


def test_read_colmap_binary(tmp_path):
    import struct

    from line3dpp_tpu.camera import rotation_from_quaternion as rq

    # cameras.bin: PINHOLE (id 1) and SIMPLE_RADIAL (id 2)
    with open(tmp_path / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", 500, 510, 320, 240))
        f.write(struct.pack("<iiQQ", 2, 2, 640, 480))
        f.write(struct.pack("<dddd", 520, 320, 240, 0.1))

    q = [0.9238795, 0.0, 0.3826834, 0.0]
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<i", 7))
        f.write(struct.pack("<dddd", *q))
        f.write(struct.pack("<ddd", 0.1, 0.2, 0.3))
        f.write(struct.pack("<i", 1))
        f.write(b"a.jpg\x00")
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ddq", 1.0, 1.0, -1))
        f.write(struct.pack("<i", 8))
        f.write(struct.pack("<dddd", 1, 0, 0, 0))
        f.write(struct.pack("<ddd", 0, 0, 1))
        f.write(struct.pack("<i", 2))
        f.write(b"b.jpg\x00")
        f.write(struct.pack("<Q", 0))

    with open(tmp_path / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<q", 5))
        f.write(struct.pack("<ddd", 0, 0, 10))
        f.write(struct.pack("<BBB", 255, 255, 255))
        f.write(struct.pack("<d", 0.5))
        f.write(struct.pack("<Q", 2))
        f.write(struct.pack("<ii", 7, 1))
        f.write(struct.pack("<ii", 8, 1))

    views = sfm_io.read_colmap(str(tmp_path), "/imgs")
    assert [v.cam_id for v in views] == [7, 8]
    np.testing.assert_allclose(views[0].R, rq(q), atol=1e-7)
    assert views[0].K[0, 0] == 500 and views[0].K[1, 1] == 510
    assert views[1].K[0, 0] == 520 and views[1].distortion[0] == 0.1
    assert views[0].worldpoints == [5] and views[1].worldpoints == [5]
    assert views[1].median_depth == pytest.approx(11.0)


def test_read_pix4d(tmp_path):
    # per-image record: name w h / K x3 / radial / tangential / C / R x3
    # (main_pix4d.cpp:207-280)
    p = tmp_path / "proj_calibrated_camera_parameters.txt"
    R = np.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    C = np.array([1.0, 2.0, 3.0])
    p.write_text(
        "Pix4D camera calibration file\n"
        "\n"
        "img0.jpg 640 480\n"
        "500 0 320\n"
        "0 510 240\n"
        "0 0 1\n"
        "0.01 0.002 0.0003\n"
        "0.0001 0.00002\n"
        f"{C[0]} {C[1]} {C[2]}\n"
        + "\n".join(" ".join(str(x) for x in row) for row in R) + "\n"
    )
    views = sfm_io.read_pix4d(str(tmp_path), "/imgs")
    assert len(views) == 1
    v = views[0]
    assert v.K[0, 0] == 500 and v.K[1, 1] == 510
    np.testing.assert_allclose(v.R, R)
    np.testing.assert_allclose(v.t, -R @ C)       # main_pix4d.cpp:270
    np.testing.assert_allclose(v.distortion, [0.01, 0.002, 0.0003,
                                              0.0001, 0.00002])
    assert v.width == 640 and v.height == 480


def test_read_colmap_empty_observation_line(tmp_path):
    (tmp_path / "cameras.txt").write_text("1 PINHOLE 640 480 500 510 320 240\n")
    # image 7 has an EMPTY observations line (zero keypoints) — must not
    # shift the parse of image 8
    (tmp_path / "images.txt").write_text(
        "7 1 0 0 0 0.1 0.2 0.3 1 a.jpg\n"
        "\n"
        "8 1 0 0 0 0 0 1 1 b.jpg\n"
        "1 1 -1\n"
    )
    views = sfm_io.read_colmap(str(tmp_path), "/imgs")
    assert [v.cam_id for v in views] == [7, 8]
    assert views[1].image_path.endswith("b.jpg")


def test_read_pix4d_tracks(tmp_path):
    # 3 cameras along x, one 3D point at (0, 0, 5) observed by all; the
    # tracks file (tp_pix4d format, main_pix4d.cpp:283-350) should yield
    # worldpoints + Euclidean median depths after DLT triangulation
    X = np.array([0.0, 0.0, 5.0])
    K = np.array([[100.0, 0, 50], [0, 100.0, 50], [0, 0, 1]])
    R = np.eye(3)
    recs, obs_lines = [], []
    for i in range(3):
        C = np.array([0.5 * i, 0.0, 0.0])
        t = -R @ C
        x_cam = R @ X + t
        uv = (K @ (x_cam / x_cam[2]))[:2]
        recs.append(
            f"img{i}.jpg 100 100\n100 0 50\n0 100 50\n0 0 1\n"
            f"0 0 0\n0 0\n{C[0]} {C[1]} {C[2]}\n1 0 0\n0 1 0\n0 0 1\n")
        obs_lines.append(f"img{i}\nfeatA {uv[0]} {uv[1]} 1.0\n")
    (tmp_path / "proj_calibrated_camera_parameters.txt").write_text(
        "header\n\n" + "".join(recs))
    (tmp_path / "proj_tp_pix4d.txt").write_text("".join(obs_lines))

    views = sfm_io.read_pix4d(str(tmp_path), "/imgs")
    assert len(views) == 3
    for i, v in enumerate(views):
        assert v.worldpoints == [0]
        expect = np.linalg.norm(X - np.array([0.5 * i, 0, 0]))
        assert v.median_depth == pytest.approx(expect, rel=1e-3)


def test_malformed_inputs_fail_loudly(tmp_path):
    """Truncated/garbage SfM files raise one clear ValueError naming the
    file (VERDICT round-1 item 7: readers must not index blindly)."""
    import pytest

    from line3dpp_tpu.io.nvm import read_nvm
    from line3dpp_tpu.io.bundler import read_bundler

    trunc = tmp_path / "trunc.nvm"
    trunc.write_text("NVM_V3\n\n5\nimg0.jpg 800 1 0 0 0")   # cut mid-camera
    with pytest.raises(ValueError, match="malformed NVM"):
        read_nvm(str(trunc))

    garbage = tmp_path / "bundle.rd.out"
    garbage.write_text("# Bundle file v0.3\n2 0\nnot_a_number 0 0\n")
    with pytest.raises(ValueError, match="malformed bundler"):
        read_bundler(str(garbage), str(tmp_path), [])
