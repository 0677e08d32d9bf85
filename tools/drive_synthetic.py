"""Drive the library end-to-end through its public API on a synthetic scene.

Usage: PYTHONPATH=... python tools/drive_synthetic.py [--cpu]
"""
import sys

import numpy as np

if "--cpu" in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")

import line3dpp_tpu as l3d

rng = np.random.default_rng(42)

# Build a synthetic house-of-lines scene: 12 3D segments seen by 6 cameras
P = rng.uniform([-2, -1.5, 6], [2, 1.5, 10], size=(12, 3))
d = rng.normal(size=(12, 3)); d /= np.linalg.norm(d, axis=1, keepdims=True)
Q = P + d * rng.uniform(0.8, 1.6, size=(12, 1))

K = np.array([[1200.0, 0, 960], [0, 1200.0, 540], [0, 0, 1]])
cams = []
for i in range(6):
    from line3dpp_tpu.camera import rotation_from_rpy
    R = rotation_from_rpy(rng.normal()*0.02, -0.06*i + 0.15, rng.normal()*0.02)
    C = np.array([0.6*i - 1.5, rng.normal()*0.05, rng.normal()*0.05])
    cams.append(l3d.Camera(K, R, -R @ C, 1920, 1080))

pipe = l3d.Line3D(l3d.Config(num_neighbors=5, max_line_segments=100, optimize=False))
for i, cam in enumerate(cams):
    segs = np.hstack([cam.project(P), cam.project(Q)])
    # add 5 random spurious segments per view
    junk = rng.uniform([0,0,0,0],[1920,1080,1920,1080],size=(5,4))
    allsegs = np.vstack([segs, junk])
    pipe.add_view(i, cam, allsegs)

pipe.match_images()
lines = pipe.reconstruct_3d_lines()
print(f"reconstructed {len(lines)} 3D lines")
pipe.save_txt("/tmp/out.txt")
pipe.save_stl("/tmp/out.stl")
pipe.save_obj("/tmp/out.obj")

# verify against ground truth
gt = np.hstack([P, Q])
pred = np.concatenate([l.segments3d for l in lines]) if lines else np.zeros((0,6))
from line3dpp_tpu.utils.golden import segment_set_metrics
m = segment_set_metrics(pred, gt, tol=0.05)
print("metrics vs ground truth:", m)
