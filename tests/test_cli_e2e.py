"""CLI end-to-end smoke test: synthetic images + NVM file -> reconstruction.

Exercises the full executable path of the reference's runLine3Dpp_vsfm
(main_vsfm.cpp): NVM parsing, image loading, LSD detection, pipeline, and
all four writers.
"""

import os

import numpy as np
import pytest

import line3dpp_tpu as l3d
from line3dpp_tpu.camera import rotation_from_rpy


def _render(cam, P, Q, W, H, rng):
    """Rasterize bright 3D line segments into a dark noisy image."""
    img = rng.uniform(0, 10, size=(H, W)).astype(np.float32)
    p = cam.project(P)
    q = cam.project(Q)
    for (x1, y1), (x2, y2) in zip(p, q):
        n = int(max(abs(x2 - x1), abs(y2 - y1)) * 2) + 2
        ts = np.linspace(0, 1, n)
        xs = np.clip((x1 * (1 - ts) + x2 * ts).round().astype(int), 0, W - 1)
        ys = np.clip((y1 * (1 - ts) + y2 * ts).round().astype(int), 0, H - 1)
        img[ys, xs] = 220.0
        img[np.clip(ys + 1, 0, H - 1), xs] = 200.0
    return img.astype(np.uint8)


def test_cli_vsfm_end_to_end(tmp_path, rng):
    from PIL import Image

    from line3dpp_tpu.cli.run import main as cli_main

    W, H = 320, 240
    f = 260.0
    n_lines = 8
    P = rng.uniform([-1.5, -1.0, 5], [1.5, 1.0, 8], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.8, 1.5, size=(n_lines, 1))

    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]])
    nvm_cams = []
    for i in range(5):
        R = rotation_from_rpy(0.0, -0.04 * i + 0.1, 0.0)
        C = np.array([0.4 * i - 0.8, 0.0, 0.0])
        cam = l3d.Camera(K, R, -R @ C, W, H)
        img = _render(cam, P, Q, W, H, rng)
        name = f"img{i:03d}.jpg"
        Image.fromarray(img).save(tmp_path / name, quality=95)
        # NVM: name focal qw qx qy qz cx cy cz r 0 (identity-ish quats)
        # quaternion from R (R is rotation about y): use trace formula
        qw = np.sqrt(max(1 + R[0, 0] + R[1, 1] + R[2, 2], 0)) / 2
        qx = (R[2, 1] - R[1, 2]) / (4 * qw)
        qy = (R[0, 2] - R[2, 0]) / (4 * qw)
        qz = (R[1, 0] - R[0, 1]) / (4 * qw)
        nvm_cams.append(
            f"{name} {f} {qw} {qx} {qy} {qz} {C[0]} {C[1]} {C[2]} 0 0")

    # worldpoints: every 3D endpoint observed in every view
    pts = np.vstack([P, Q])
    wp_lines = []
    for j, X in enumerate(pts):
        meas = " ".join(f"{i} {j} 0 0" for i in range(5))
        wp_lines.append(
            f"{X[0]} {X[1]} {X[2]} 255 255 255 5 {meas}")

    nvm = tmp_path / "result.nvm"
    nvm.write_text("NVM_V3\n\n5\n" + "\n".join(nvm_cams)
                   + f"\n\n{len(pts)}\n" + "\n".join(wp_lines) + "\n")

    out_dir = tmp_path / "out"
    cli_main(["vsfm", "-i", str(tmp_path), "-m", str(nvm),
              "-o", str(out_dir), "-n", "4", "-y", "200",
              "--no-optimize", "-v", "3", "--min_image_width", "100"])

    outs = os.listdir(out_dir)
    assert any(o.endswith(".txt") for o in outs)
    assert any(o.endswith(".stl") for o in outs)
    txt = next(o for o in outs if o.endswith(".txt"))
    content = (out_dir / txt).read_text().strip()
    assert len(content.splitlines()) >= 4, "too few reconstructed lines"
