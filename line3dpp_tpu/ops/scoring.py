"""Match scoring — 3D hypothesis verification.

Every match of a segment is unprojected into a 3D segment hypothesis and
compared against every other match of the same segment coming from a
*different* target camera.  The per-camera maximum of
``min(sim_angle, sim_position)`` is summed into score3D, a soft count of how
many cameras confirm the hypothesis (reference: scoringCPU line3D.cc:1208-1294,
similarityForScoring line3D.cc:1417-1446, K_score_matches
cudawrapper.cu:256-367).

TPU-first design
----------------
Matches live in a dense [V, S, M] table where the M axis is grouped by
neighbor slot: slot m belongs to neighbor group ``m // k``.  All matches in a
group share one target camera, so the reference's per-camera max over a sorted
ragged range becomes a reshape + max over the k-sized trailing group — no
sorting, no segmented scan.  The [M, M] similarity tile per segment is pure
VPU work; the (V, S) axes are flattened and processed in fixed-size chunks via
``lax.map`` to bound VMEM/HBM pressure.

Also implements the upstream orientation filter (checkMatchOrientation,
line3D.cc:811-858) as a mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

EPS = 1e-12
PI_1_32 = 0.098174771    # reference: commons.h:99
PI_31_32 = 3.043417886   # reference: commons.h:100


class ScoredMatches(NamedTuple):
    score3d: jnp.ndarray    # (V, S, M) f32
    valid: jnp.ndarray      # (V, S, M) bool (post orientation filter)


def _score_chunk(
    r1, r2, rmid,            # (B, 3) rays per segment
    d1, d2, mvalid,          # (B, M) per-match depths / validity
    Cv, kv,                  # (B, 3), (B,) src camera center / regularizer
    tC, tk,                  # (B, N, 3), (B, N) tgt camera data per group
    *, knn: int, two_sig_a_sqr: float, min_similarity: float,
    check_orientation: bool,
):
    """All 3-vectors are kept as separate x/y/z (B, M) component arrays —
    a (B, M, 3) layout would be lane-padded 3 -> 128 on TPU (§OOM)."""
    B, M = d1.shape
    N = tC.shape[1]
    k = knn

    # hypothesis endpoints (view.cc:356-371): P = C + ray * depth
    P1c = [Cv[:, i:i + 1] + r1[:, i:i + 1] * d1 for i in range(3)]  # 3x (B, M)
    P2c = [Cv[:, i:i + 1] + r2[:, i:i + 1] * d2 for i in range(3)]
    dvc = [p2 - p1 for p1, p2 in zip(P1c, P2c)]
    length = jnp.sqrt(sum(c * c for c in dvc))
    inv_len = 1.0 / jnp.maximum(length, EPS)
    dirc = [c * inv_len for c in dvc]
    ok = mvalid & (length > EPS)

    if check_orientation:
        # ray-vs-hypothesis angle must lie in (pi/32, 31pi/32)
        # (line3D.cc:811-858 via segmentQualityAngle, view.cc:466-484)
        dot = jnp.clip(sum(rmid[:, i:i + 1] * dirc[i] for i in range(3)),
                       -1.0, 1.0)
        ang = jnp.arccos(dot)
        ok = ok & (ang > PI_1_32) & (ang < PI_31_32)

    # regularizers of the scored match (line3D.cc:1235-1248):
    # reg_i = 0.5*(2 (d_i k_src)^2 + 2 (|P_i - C_tgt| k_tgt)^2)
    tCc = [jnp.repeat(tC[:, :, i], k, axis=1) for i in range(3)]   # 3x (B, M)
    tkm = jnp.repeat(tk, k, axis=1)                                # (B, M)
    sig1 = d1 * kv[:, None]
    sig2 = d2 * kv[:, None]
    sig1t = jnp.sqrt(sum((p - c) ** 2 for p, c in zip(P1c, tCc))) * tkm
    sig2t = jnp.sqrt(sum((p - c) ** 2 for p, c in zip(P2c, tCc))) * tkm
    reg1 = sig1 * sig1 + sig1t * sig1t                         # == 0.5*(2a+2b)
    reg2 = sig2 * sig2 + sig2t * sig2t

    # pairwise similarity of matches (m, m2) of one segment
    # (line3D.cc:1417-1446): regs come from m, depth diffs vs m2.
    dot = jnp.clip(
        sum(c[:, :, None] * c[:, None, :] for c in dirc), -1.0, 1.0)
    ang_deg = jnp.degrees(jnp.arccos(dot))
    ang_deg = jnp.where(ang_deg > 90.0, 180.0 - ang_deg, ang_deg)
    sim_a = jnp.exp(-ang_deg * ang_deg / two_sig_a_sqr)

    dd1 = d1[:, :, None] - d1[:, None, :]
    dd2 = d2[:, :, None] - d2[:, None, :]
    sim_p = jnp.minimum(
        jnp.exp(-dd1 * dd1 / jnp.maximum(reg1[:, :, None], EPS)),
        jnp.exp(-dd2 * dd2 / jnp.maximum(reg2[:, :, None], EPS)),
    )
    sim = jnp.minimum(sim_a, sim_p)
    sim = jnp.where(sim > min_similarity, sim, 0.0)            # truncation
    sim = jnp.where(ok[:, :, None] & ok[:, None, :], sim, 0.0)

    # per-camera max then sum over *other* cameras: neighbor groups of k
    # share a camera -> reshape/max/sum replaces the reference's sorted-range
    # scan (line3D.cc:1250-1275, cudawrapper.cu:311-360).
    per_group = jnp.max(sim.reshape(B, M, N, k), axis=-1)      # (B, M, N)
    own_group = jnp.arange(M) // k                             # (M,)
    group_mask = own_group[:, None] != jnp.arange(N)[None, :]  # (M, N)
    score = jnp.sum(per_group * group_mask[None], axis=-1)
    return jnp.where(ok, score, 0.0), ok


def score_matches(
    r1: jnp.ndarray,            # (V, S, 3) endpoint-1 rays
    r2: jnp.ndarray,            # (V, S, 3) endpoint-2 rays
    rmid: jnp.ndarray,          # (V, S, 3) midpoint rays
    C: jnp.ndarray,             # (V, 3)
    k_reg: jnp.ndarray,         # (V,)
    neighbor_ids: jnp.ndarray,  # (V, N) int32
    d_p1: jnp.ndarray,          # (V, S, M)
    d_p2: jnp.ndarray,          # (V, S, M)
    valid: jnp.ndarray,         # (V, S, M) bool
    knn: int,
    two_sig_a_sqr: float,
    min_similarity: float = 0.5,
    check_orientation: bool = True,
    chunk: int = 1024,
    C_table: jnp.ndarray | None = None,
    k_table: jnp.ndarray | None = None,
) -> ScoredMatches:
    """When the view axis is sharded, ``C``/``k_reg``/``r*`` are the local
    shard while ``C_table``/``k_table`` are the replicated global tables used
    to resolve the (global) ``neighbor_ids``; they default to the local arrays
    in the unsharded case."""
    V, S, M = d_p1.shape
    N = neighbor_ids.shape[1]
    assert M == N * knn, "match slots must be neighbor-grouped: M == N*k"

    if C_table is None:
        C_table = C
    if k_table is None:
        k_table = k_reg
    tgt_C = C_table[neighbor_ids]       # (V, N, 3)
    tgt_k = k_table[neighbor_ids]       # (V, N)

    # flatten the (V, S) axes; broadcast per-view data per segment
    VS = V * S
    flat = lambda x: x.reshape(VS, *x.shape[2:])
    bview = lambda x: jnp.broadcast_to(x[:, None], (V, S) + x.shape[1:]).reshape(
        VS, *x.shape[1:]
    )

    args = (
        flat(r1), flat(r2), flat(rmid),
        flat(d_p1), flat(d_p2), flat(valid),
        bview(C), bview(k_reg), bview(tgt_C), bview(tgt_k),
    )

    # pad to a multiple of the chunk size
    pad = (-VS) % chunk
    if pad:
        args = tuple(jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1)) for a in args)

    n_chunks = (VS + pad) // chunk
    args = tuple(a.reshape(n_chunks, chunk, *a.shape[1:]) for a in args)

    fn = functools.partial(
        _score_chunk,
        knn=knn,
        two_sig_a_sqr=two_sig_a_sqr,
        min_similarity=min_similarity,
        check_orientation=check_orientation,
    )
    score, ok = jax.lax.map(lambda a: fn(*a), args)

    score = score.reshape(-1, M)[:VS].reshape(V, S, M)
    ok = ok.reshape(-1, M)[:VS].reshape(V, S, M)
    return ScoredMatches(score3d=score, valid=ok)
