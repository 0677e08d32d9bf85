"""2D collinearity analysis (optional, ``collinearity_t > 0``).

Per image, segment pairs that do not overlap along their common direction and
whose four mutual endpoint-to-line distances all stay below a pixel threshold
are "collinear"; such pairs contribute extra affinity edges so broken 2D
detections of one physical line can end up in the same cluster (reference:
View::findCollinearSegments view.cc:212-264, K_collinearity
cudawrapper.cu:370-429, edge emission line3D.cc:1904-1974).

TPU-first design: the all-pairs test is a dense masked [S, S] computation per
view — elementwise VPU work batched with ``lax.map`` over views instead of
the reference's per-image char-matrix kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

EPS = 1e-12


def _point_line_dist2d(px, py, x1, y1, x2, y2):
    """Distance of (px, py) to the infinite 2D line through the two points."""
    dx = x2 - x1
    dy = y2 - y1
    L = jnp.sqrt(dx * dx + dy * dy)
    return jnp.abs(dy * px - dx * py + x2 * y1 - y2 * x1) / jnp.maximum(L, EPS)


def collinear_pairs_one(segments: jnp.ndarray, mask: jnp.ndarray,
                        t_px: float) -> jnp.ndarray:
    """(S, S) bool — collinear, non-overlapping segment pairs of one view."""
    S = segments.shape[0]
    x1, y1, x2, y2 = (segments[:, i] for i in range(4))

    # max mutual point-to-line distance (view.cc:228-244)
    d11 = _point_line_dist2d(x1[:, None], y1[:, None],
                             x1[None], y1[None], x2[None], y2[None])
    d12 = _point_line_dist2d(x2[:, None], y2[:, None],
                             x1[None], y1[None], x2[None], y2[None])
    d21 = _point_line_dist2d(x1[None], y1[None],
                             x1[:, None], y1[:, None], x2[:, None], y2[:, None])
    d22 = _point_line_dist2d(x2[None], y2[None],
                             x1[:, None], y1[:, None], x2[:, None], y2[:, None])
    dmax = jnp.maximum(jnp.maximum(d11, d12), jnp.maximum(d21, d22))

    # overlap test: project i's endpoints onto j's parametrization; the pair
    # only counts as collinear when the intervals do NOT overlap
    # (view.cc:218-226 requires disjoint segments)
    dxj = (x2 - x1)[None]
    dyj = (y2 - y1)[None]
    len2 = jnp.maximum(dxj * dxj + dyj * dyj, EPS)
    t1 = ((x1[:, None] - x1[None]) * dxj + (y1[:, None] - y1[None]) * dyj) / len2
    t2 = ((x2[:, None] - x1[None]) * dxj + (y2[:, None] - y1[None]) * dyj) / len2
    lo = jnp.minimum(t1, t2)
    hi = jnp.maximum(t1, t2)
    overlaps = (jnp.maximum(lo, 0.0) <= jnp.minimum(hi, 1.0))

    ok = (
        (dmax < t_px)
        & ~overlaps
        & mask[:, None]
        & mask[None, :]
        & ~jnp.eye(S, dtype=bool)
    )
    return ok


@functools.partial(jax.jit, static_argnames=("t_px",))
def collinear_pairs(segments: jnp.ndarray, mask: jnp.ndarray,
                    t_px: float) -> jnp.ndarray:
    """(V, S, S) bool collinearity over all views (lax.map bounds memory)."""
    return jax.lax.map(
        lambda a: collinear_pairs_one(a[0], a[1], t_px), (segments, mask))


def collinear_similarity(est_P1, est_P2, est_d1, est_d2, est_valid,
                         collin, k_reg, median_depth, med_scene_depth,
                         min_affinity):
    """3D similarity of same-view collinear pairs -> extra affinity edges.

    est_*: (V, S, ...) per-segment best-hypothesis data; collin: (V, S, S).
    Position-only similarity (the pair is collinear in 2D by construction;
    the reference's similarity() for collinear pairs skips the angle term,
    line3D.cc:1460-1465).  Returns (V, S, S) weights + validity.

    All 3-vectors are handled as separate x/y/z component (V, S, S) planes:
    a (V, S, S, 3) intermediate would lane-pad 3 -> 128 on TPU (see the
    layout rule in ops/matching.py / CLAUDE.md).
    """
    dv = [est_P2[..., i] - est_P1[..., i] for i in range(3)]    # 3x (V, S)
    lena = jnp.sqrt(sum(c * c for c in dv))
    dira = [c / jnp.maximum(lena, EPS) for c in dv]

    P1a = [est_P1[..., i][:, :, None] for i in range(3)]        # (V, S, 1)
    P2a = [est_P2[..., i][:, :, None] for i in range(3)]
    P1b = [est_P1[..., i][:, None, :] for i in range(3)]        # (V, 1, S)
    P2b = [est_P2[..., i][:, None, :] for i in range(3)]
    dir_a = [c[:, :, None] for c in dira]
    dir_b = [c[:, None, :] for c in dira]

    # d^2 = |w|^2 - (w . dir)^2, component-wise over the (V, S, S) pair grid
    def p2l(P, L0, Ld):
        w = [p - l0 for p, l0 in zip(P, L0)]
        w2 = sum(c * c for c in w)
        proj = sum(c * d for c, d in zip(w, Ld))
        return jnp.sqrt(jnp.maximum(w2 - proj * proj, 0.0))

    d11 = p2l(P1a, P1b, dir_b)
    d12 = p2l(P2a, P1b, dir_b)
    d21 = p2l(P1b, P1a, dir_a)
    d22 = p2l(P2b, P1a, dir_a)

    cut = jnp.minimum(median_depth, med_scene_depth) if med_scene_depth > EPS \
        else median_depth
    sig_a1 = jnp.minimum(est_d1, cut[:, None]) * k_reg[:, None]
    sig_a2 = jnp.minimum(est_d2, cut[:, None]) * k_reg[:, None]

    expf = lambda d, sig: jnp.exp(
        -d * d / jnp.maximum(2.0 * sig * sig, EPS))
    sim_a = jnp.minimum(expf(d11, sig_a1[:, :, None]),
                        expf(d12, sig_a2[:, :, None]))
    sim_b = jnp.minimum(expf(d21, sig_a1[:, None, :]),
                        expf(d22, sig_a2[:, None, :]))
    sim = jnp.minimum(sim_a, sim_b)

    ok = collin & est_valid[:, :, None] & est_valid[:, None, :]
    edge = ok & (sim > min_affinity)
    return jnp.where(edge, sim, 0.0), edge
