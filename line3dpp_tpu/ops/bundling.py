"""Batched 3D-line bundle adjustment (Ceres-equivalent).

The reference bundles clustered 3D lines with a Ceres solver over a Cayley
line parametrization, holding cameras and intrinsics constant (reference:
optimization.cc:8-303, optimization.h:40-170; parametrization from Zhang &
Koch 2014).  Because cameras are constant, every line's 4 parameters are
independent — the problem is block-diagonal and maps to a **batched
Levenberg-Marquardt over [C, 4]** on TPU (SURVEY.md §7.1): per-observation
Jacobians by forward-mode autodiff, normal equations accumulated with
``segment_sum``, and a batched 4x4 solve per cluster per iteration.  No Schur
complement is needed; a distributed Schur path only becomes relevant if
cameras are ever freed.

Line representation: Plücker (m, v) with the orthonormal/Cayley
parametrization (s1, s2, s3, w):

    U = cayley(s)  in SO(3),   columns [m_hat, v_hat, m_hat x v_hat]
    (|m|, |v|) = (cos w, sin w)   — one angle fixes the scale split

Projection of the line into a camera (x = K(RX + t)):

    n_cam = R m + [t]x R v          (plane normal through center & line)
    l_img = K^-T n_cam              (2D image line coefficients)

Residual per observed 2D segment: the two endpoint-to-line distances,
amplified by exp(2 * angle(observed direction, projected line direction))
(reference: optimization.h:52-167), with Huber(2.0) IRLS weights
(optimization.h:50, optimization.cc:139).
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

EPS = 1e-12
HUBER_DELTA = 2.0


# ---------------------------------------------------------------------------
# Cayley <-> Plücker
# ---------------------------------------------------------------------------


def cayley_to_rotation(s):
    """U = (I - [s]x)(I + [s]x)^-1 — closed form, batched over leading dims."""
    s1, s2, s3 = s[..., 0], s[..., 1], s[..., 2]
    n = 1.0 + s1 * s1 + s2 * s2 + s3 * s3
    U = jnp.stack([
        jnp.stack([1 + s1 * s1 - s2 * s2 - s3 * s3,
                   2 * (s1 * s2 - s3), 2 * (s1 * s3 + s2)], -1),
        jnp.stack([2 * (s1 * s2 + s3),
                   1 - s1 * s1 + s2 * s2 - s3 * s3, 2 * (s2 * s3 - s1)], -1),
        jnp.stack([2 * (s1 * s3 - s2), 2 * (s2 * s3 + s1),
                   1 - s1 * s1 - s2 * s2 + s3 * s3], -1),
    ], -2)
    return U / n[..., None, None]


def rotation_to_cayley(U):
    """Inverse Cayley: s = vee((U - I)(U + I)^-1); batched."""
    I = jnp.eye(3, dtype=U.dtype)
    A = jnp.linalg.solve((U + I).swapaxes(-1, -2), (U - I).swapaxes(-1, -2))
    A = A.swapaxes(-1, -2)
    return jnp.stack([A[..., 2, 1], A[..., 0, 2], A[..., 1, 0]], -1)


def plucker_from_endpoints(P1, P2):
    """Plücker (m, v) of the line through P1, P2 (v unit, m = P x v)."""
    v = P2 - P1
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), EPS)
    m = jnp.cross(P1, v)
    return m, v


def params_from_plucker(m, v):
    """(s, w) orthonormal parameters of Plücker (m, v)."""
    nm = jnp.linalg.norm(m, axis=-1)
    nv = jnp.linalg.norm(v, axis=-1)
    m_hat = m / jnp.maximum(nm, EPS)[..., None]
    # if the line passes through the origin (m ~ 0), pick any normal to v
    alt = jnp.cross(v, jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0], v.dtype), v.shape))
    alt2 = jnp.cross(v, jnp.broadcast_to(
        jnp.asarray([0.0, 1.0, 0.0], v.dtype), v.shape))
    alt = jnp.where(
        (jnp.linalg.norm(alt, axis=-1, keepdims=True) > 1e-6), alt, alt2)
    alt = alt / jnp.maximum(jnp.linalg.norm(alt, -1, keepdims=True), EPS)
    m_hat = jnp.where((nm > 1e-9)[..., None], m_hat, alt)
    v_hat = v / jnp.maximum(nv, EPS)[..., None]
    u3 = jnp.cross(m_hat, v_hat)
    U = jnp.stack([m_hat, v_hat, u3], axis=-1)      # columns
    s = rotation_to_cayley(U)
    w = jnp.arctan2(nv, nm)
    return s, w


def plucker_from_params(s, w):
    U = cayley_to_rotation(s)
    m = jnp.cos(w)[..., None] * U[..., :, 0]
    v = jnp.sin(w)[..., None] * U[..., :, 1]
    return m, v


# ---------------------------------------------------------------------------
# residuals
# ---------------------------------------------------------------------------

def _obs_residual(params, KinvT, R, t, p1h, p2h, seg_dir):
    """Two endpoint-to-projected-line distances for one observation.

    params: (4,) = (s1, s2, s3, w); KinvT = K^-T (3,3); p*h homogeneous
    endpoint pixels; seg_dir: unit 2D direction of the observed segment.
    (reference: optimization.h:66-158)
    """
    s, w = params[:3], params[3]
    m, v = plucker_from_params(s, w)
    HI = jax.lax.Precision.HIGHEST
    mv3 = lambda A, x: jnp.einsum("ij,j->i", A, x, precision=HI)
    n_cam = mv3(R, m) + jnp.cross(t, mv3(R, v))
    l_img = mv3(KinvT, n_cam)
    norm = jnp.sqrt(l_img[0] ** 2 + l_img[1] ** 2)
    inv = 1.0 / jnp.maximum(norm, EPS)
    d1 = jnp.dot(l_img, p1h) * inv
    d2 = jnp.dot(l_img, p2h) * inv
    # angular weight: exp(2 * angle between observed segment and projected
    # line direction) amplifies misaligned fits (optimization.h:117-139).
    # The angle comes from the cross product (arcsin form): arccos(|dot|)
    # has a singular derivative exactly at alignment — the optimum — which
    # stalls LM; arcsin is smooth there.
    ldir = jnp.stack([-l_img[1], l_img[0]]) * inv
    sinang = jnp.abs(ldir[0] * seg_dir[1] - ldir[1] * seg_dir[0])
    ang = jnp.arcsin(jnp.clip(sinang, 0.0, 1.0 - 1e-6))
    wgt = jnp.exp(2.0 * ang)
    return jnp.stack([d1 * wgt, d2 * wgt])


_res_and_jac = jax.vmap(
    lambda p, KinvT, R, t, p1, p2, sd: (
        _obs_residual(p, KinvT, R, t, p1, p2, sd),
        jax.jacfwd(_obs_residual)(p, KinvT, R, t, p1, p2, sd),
    )
)
_res_only = jax.vmap(_obs_residual)


def _huber_w(r):
    """IRLS sqrt-weights for Huber loss (delta=2.0, optimization.cc:139)."""
    a = jnp.abs(r)
    return jnp.sqrt(jnp.where(a <= HUBER_DELTA, 1.0, HUBER_DELTA / jnp.maximum(a, EPS)))


@functools.partial(jax.jit, static_argnames=("num_clusters", "iterations"))
def lm_optimize(
    params0: jnp.ndarray,    # (C, 4) initial (s1, s2, s3, w)
    obs_cluster: jnp.ndarray,  # (O,) int32 cluster of each observation
    KinvT: jnp.ndarray,      # (O, 3, 3) per-observation camera K^-T
    R: jnp.ndarray,          # (O, 3, 3)
    t: jnp.ndarray,          # (O, 3)
    p1h: jnp.ndarray,        # (O, 3) observed endpoint 1 (homogeneous)
    p2h: jnp.ndarray,        # (O, 3)
    seg_dir: jnp.ndarray,    # (O, 2) observed segment unit direction
    num_clusters: int,
    iterations: int = 25,
) -> jnp.ndarray:
    """Batched LM over independent 4-parameter line problems."""
    C = num_clusters

    def cost_of(params):
        r = _res_only(params[obs_cluster], KinvT, R, t, p1h, p2h, seg_dir)
        hw = _huber_w(r)
        return jax.ops.segment_sum(jnp.sum((hw * r) ** 2, -1), obs_cluster, C)

    def body(state, _):
        params, lam = state
        r, J = _res_and_jac(params[obs_cluster], KinvT, R, t, p1h, p2h, seg_dir)
        hw = _huber_w(r)                        # (O, 2)
        rw = hw * r
        Jw = hw[..., None] * J                  # (O, 2, 4)

        JTJ = jax.ops.segment_sum(
            jnp.einsum("oki,okj->oij", Jw, Jw,
                       precision=jax.lax.Precision.HIGHEST),
            obs_cluster, C)                                       # (C,4,4)
        g = jax.ops.segment_sum(
            jnp.einsum("oki,ok->oi", Jw, rw,
                       precision=jax.lax.Precision.HIGHEST),
            obs_cluster, C)                                       # (C,4)

        diag = jnp.diagonal(JTJ, axis1=-2, axis2=-1)
        A = JTJ + (lam[:, None] * jnp.maximum(diag, 1e-8))[:, :, None] * jnp.eye(
            4, dtype=JTJ.dtype)
        delta = jnp.linalg.solve(A, g[..., None])[..., 0]          # (C,4)

        new_params = params - delta
        c_old = cost_of(params)
        c_new = cost_of(new_params)
        better = (c_new < c_old)[:, None]
        params = jnp.where(better, new_params, params)
        lam = jnp.where(better[:, 0], lam * 0.33, lam * 3.0)
        lam = jnp.clip(lam, 1e-9, 1e6)
        return (params, lam), None

    lam0 = jnp.full((C,), 1e-3, params0.dtype)
    (params, _), _ = jax.lax.scan(body, (params0, lam0), None, length=iterations)
    return params


@functools.partial(jax.jit, static_argnames=("num_clusters",))
def lm_cost(params, obs_cluster, KinvT, R, t, p1h, p2h, seg_dir,
            num_clusters: int):
    """Per-cluster robustified cost at ``params`` (ablation/diagnostics)."""
    r = _res_only(params[obs_cluster], KinvT, R, t, p1h, p2h, seg_dir)
    hw = _huber_w(r)
    return jax.ops.segment_sum(
        jnp.sum((hw * r) ** 2, -1), obs_cluster, num_clusters)


def optimize_cluster_lines(lineP1, lineP2, mc, mv, ms, C, st, config,
                           iterations: int | None = None,
                           _capture: dict | None = None):
    """Refine cluster lines by minimizing 2D endpoint-to-projected-line
    reprojection error; cameras constant (reference: optimization.cc:8-303).

    Returns (P1, P2, unit_dir) arrays of shape (C, 3) in the centered frame.

    ``iterations`` overrides the LM iteration count, default
    ``config.max_iter_optim`` = 250 to match the reference Ceres cap
    (commons.h:88).  Earlier rounds clamped to 50; the measured convergence
    ablation (tools/ablate_bundling_iters.py, PARITY.md row 17) showed 51 of
    2295 testdata clusters still improving past 50, so the clamp was lifted
    — the fixed-length scan costs ~2 extra seconds on CPU and less on TPU.
    ``_capture`` (diagnostics) receives the assembled LM inputs.
    """
    cb = st["cb"]
    segs2d = st["segs"]                          # (V, S, 4) original pixels

    # observations: one per cluster member
    obs_cluster = jnp.asarray(mc, dtype=jnp.int32)
    Ko = np.transpose(np.linalg.inv(cb.K[mv]), (0, 2, 1)).astype(np.float32)
    Ro = cb.R[mv].astype(np.float32)
    to = cb.t[mv].astype(np.float32)
    p = segs2d[mv, ms]                           # (O, 4)
    ones = np.ones((len(p), 1), np.float32)
    p1h = np.concatenate([p[:, 0:2], ones], 1)
    p2h = np.concatenate([p[:, 2:4], ones], 1)
    d2 = p[:, 2:4] - p[:, 0:2]
    d2 = d2 / np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), EPS)

    m0, v0 = plucker_from_endpoints(
        jnp.asarray(lineP1, jnp.float32), jnp.asarray(lineP2, jnp.float32))
    s0, w0 = params_from_plucker(m0, v0)
    params0 = jnp.concatenate([s0, w0[:, None]], axis=1)

    # pad cluster/observation counts to power-of-two buckets: they change
    # every run, and on remote-compile backends a fresh jit per shape costs
    # far more than the padded compute.  Padded observations point at a
    # dummy cluster; padded clusters never read back.
    O = len(p)
    Cpad = max(1 << (C).bit_length(), 64)
    Opad = max(1 << (O - 1).bit_length(), 256) if O else 256
    padO = Opad - O
    obs_cluster = jnp.concatenate(
        [obs_cluster, jnp.full((padO,), C, jnp.int32)])
    padA = lambda x: np.concatenate(
        [x, np.zeros((padO,) + x.shape[1:], x.dtype)]) if padO else x
    eyeK = np.zeros((padO, 3, 3), np.float32)
    eyeK[:, 0, 0] = eyeK[:, 1, 1] = eyeK[:, 2, 2] = 1.0
    Ko = np.concatenate([Ko, eyeK]) if padO else Ko
    Ro = np.concatenate([Ro, eyeK]) if padO else Ro
    to, p1h, p2h = padA(to), padA(p1h), padA(p2h)
    d2 = padA(d2.astype(np.float32))
    params0 = jnp.concatenate(
        [params0, jnp.zeros((Cpad - C, 4), params0.dtype)])

    if iterations is None:
        iterations = int(config.max_iter_optim)
    if _capture is not None:
        _capture.update(
            params0=np.asarray(params0), obs_cluster=np.asarray(obs_cluster),
            Ko=Ko, Ro=Ro, to=to, p1h=p1h, p2h=p2h, d2=d2, Cpad=Cpad, C=C)
    params = lm_optimize(
        params0, obs_cluster,
        jnp.asarray(Ko), jnp.asarray(Ro), jnp.asarray(to),
        jnp.asarray(p1h), jnp.asarray(p2h), jnp.asarray(d2),
        num_clusters=Cpad,
        iterations=int(iterations),
    )
    params = params[:C]

    m, v = plucker_from_params(params[:, :3], params[:, 3])
    m = np.asarray(m, np.float64)
    v = np.asarray(v, np.float64)
    vn = v / np.maximum(np.linalg.norm(v, axis=1, keepdims=True), EPS)
    # closest point of the new line to the origin: P0 = v x m / |v|^2
    P0 = np.cross(v, m) / np.maximum(
        np.sum(v * v, axis=1, keepdims=True), EPS)

    # endpoint recovery: project the old endpoints onto the refined line
    # (reference: optimization.cc:208-295)
    t1 = np.sum((lineP1 - P0) * vn, axis=1, keepdims=True)
    t2 = np.sum((lineP2 - P0) * vn, axis=1, keepdims=True)
    newP1 = P0 + t1 * vn
    newP2 = P0 + t2 * vn

    # guard: clusters whose refinement diverged keep the SVD fit
    finite = np.isfinite(newP1).all(1) & np.isfinite(newP2).all(1)
    span = np.linalg.norm(newP2 - newP1, axis=1) > EPS
    ok = finite & span
    newP1 = np.where(ok[:, None], newP1, lineP1)
    newP2 = np.where(ok[:, None], newP2, lineP2)

    dirs = newP2 - newP1
    dirs = dirs / np.maximum(np.linalg.norm(dirs, axis=1, keepdims=True), EPS)
    return newP1, newP2, dirs
