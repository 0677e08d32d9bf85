"""Image undistortion (reference: Line3D::undistortImage line3D.cc:83-109).

The reference delegates to OpenCV's ``initUndistortRectifyMap`` + ``remap``
with 3 radial + 2 tangential coefficients; here the same Brown model runs as
a single JAX gather: build the undistorted->distorted coordinate map on
device and bilinearly sample the source image.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("H", "W"))
def _undistort_core(img, K, dist, H: int, W: int):
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    k1, k2, k3, p1, p2 = (dist[i] for i in range(5))

    u = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1)
    v = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0)
    x = (u - cx) / fx
    y = (v - cy) / fy

    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2 + k3 * r2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y

    us = xd * fx + cx
    vs = yd * fy + cy

    # bilinear sample with border clamp (cv::remap BORDER_CONSTANT-ish edges
    # are irrelevant for line detection; clamping avoids black fringes)
    u0 = jnp.clip(jnp.floor(us), 0, W - 2)
    v0 = jnp.clip(jnp.floor(vs), 0, H - 2)
    du = jnp.clip(us - u0, 0.0, 1.0)
    dv = jnp.clip(vs - v0, 0.0, 1.0)
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)

    g = lambda dy, dx: img[v0 + dy, u0 + dx]
    out = ((1 - du) * (1 - dv) * g(0, 0) + du * (1 - dv) * g(0, 1)
           + (1 - du) * dv * g(1, 0) + du * dv * g(1, 1))
    inside = (us >= 0) & (us <= W - 1) & (vs >= 0) & (vs <= H - 1)
    return jnp.where(inside, out, 0.0)


def undistort_image(image: np.ndarray, K: np.ndarray,
                    distortion: np.ndarray) -> np.ndarray:
    """Undistort a grayscale image; coefficients (k1, k2, k3, p1, p2)."""
    img = np.asarray(image, np.float32)
    H, W = img.shape
    d = np.zeros(5, np.float32)
    d[: len(np.ravel(distortion))] = np.ravel(distortion)[:5]
    if not np.any(np.abs(d) > 1e-12):
        return image
    out = _undistort_core(jnp.asarray(img), jnp.asarray(K, jnp.float32).reshape(3, 3),
                          jnp.asarray(d), H, W)
    return np.asarray(out).astype(image.dtype)
