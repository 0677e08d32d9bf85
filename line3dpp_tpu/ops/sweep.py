"""1D interval sweep: collinear 3D sub-segment extraction per cluster.

Each cluster member's 2D segment projects onto the cluster's 3D line as an
interval [s1, s2]; sweeping the interval endpoints from the border inward
emits 3D sub-segments wherever >= `visibility` *distinct cameras* have an open
interval (reference: findCollinearSegments(cluster) line3D.cc:2342-2452).

The sweep is irregular and tiny (SURVEY.md §7.1) — it runs on the host over
numpy arrays, vectorized over events within each cluster.
"""

from __future__ import annotations

import numpy as np


def sweep_cluster(
    s1: np.ndarray,        # (m,) projected endpoint-1 params along the line
    s2: np.ndarray,        # (m,) projected endpoint-2 params
    cams: np.ndarray,      # (m,) camera id per member
    visibility: int = 3,
    s_cog: float = 1.0,    # param of the cluster COG (line P1 = COG - dir)
) -> list[tuple[float, float]]:
    """Emit (s_start, s_end) line-parameter intervals with >= `visibility`
    distinct open cameras.  Mirrors the reference's event sweep ordered by
    distance-to-border (line3D.cc:2399-2449); on the 1D line that equals
    ordering by signed parameter from one end.
    """
    m = len(s1)
    if m < 3:                          # needs >= 6 points (line3D.cc:2396)
        return []

    # border = projected endpoint farthest from the cluster COG
    # (line3D.cc:2373-2391); sorting by distance-to-border equals sorting by
    # |param - border| since all points lie on the line.
    params = np.concatenate([s1, s2])
    border = params[np.argmax(np.abs(params - s_cog))]
    dist_to_border = np.abs(params - border)

    line_id = np.tile(np.arange(m), 2)
    cam_id = np.tile(np.asarray(cams), 2)
    order = np.argsort(dist_to_border, kind="stable")

    open_count: dict = {}
    open_lines: set = set()
    segments: list[tuple[float, float]] = []
    opened = False
    current_start = 0.0

    p_sorted = params[order]
    l_sorted = line_id[order]
    c_sorted = cam_id[order]

    for pos, lid, cam in zip(p_sorted.tolist(), l_sorted.tolist(), c_sorted.tolist()):
        if lid not in open_lines:
            open_lines.add(lid)
            open_count[cam] = open_count.get(cam, 0) + 1
        else:
            open_lines.discard(lid)
            open_count[cam] -= 1
            if open_count[cam] == 0:
                del open_count[cam]

        if opened and len(open_count) < visibility:
            segments.append((current_start, pos))
            opened = False
        elif not opened and len(open_count) >= visibility:
            current_start = pos
            opened = True

    return segments


def sweep_all(
    member_cluster: np.ndarray,   # (N,) cluster index per member
    s1: np.ndarray,               # (N,)
    s2: np.ndarray,               # (N,)
    member_ok: np.ndarray,        # (N,) projection validity
    cams: np.ndarray,             # (N,)
    num_clusters: int,
    visibility: int = 3,
) -> list[list[tuple[float, float]]]:
    """List-of-lists wrapper over :func:`sweep_all_flat` (kept for tests and
    diagnostics that index intervals per cluster)."""
    out: list[list[tuple[float, float]]] = [[] for _ in range(num_clusters)]
    iv_c, iv_sa, iv_sb = sweep_all_flat(
        member_cluster, s1, s2, member_ok, cams, num_clusters, visibility)
    for c, sa, sb in zip(iv_c.tolist(), iv_sa.tolist(), iv_sb.tolist()):
        out[c].append((sa, sb))
    return out


def sweep_all_flat(
    member_cluster: np.ndarray,   # (N,) cluster index per member
    s1: np.ndarray,               # (N,)
    s2: np.ndarray,               # (N,)
    member_ok: np.ndarray,        # (N,) projection validity
    cams: np.ndarray,             # (N,)
    num_clusters: int,
    visibility: int = 3,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sweep every cluster at once, fully vectorized; flat-array output.

    Event semantics match :func:`sweep_cluster`: per cluster, interval
    endpoints ordered by distance to the border point; the distinct-open-
    camera count rises by one when a camera's open-interval count goes
    0 -> 1 and falls on 1 -> 0; sub-segments are emitted while the count is
    >= ``visibility``.

    Returns (cluster_id, s_start, s_end) arrays — one row per emitted
    interval, grouped by ascending cluster — so the downstream assembly
    (pipeline reconstruct tail) stays array-shaped with no per-cluster
    Python loop (the reference's OpenMP'd computeFinal3Dsegments,
    line3D.cc:2278-2299).
    """
    empty = (np.zeros(0, np.int64), np.zeros(0, float), np.zeros(0, float))
    keep = np.asarray(member_ok, bool)
    if not keep.any():
        return empty
    mc = np.asarray(member_cluster)[keep]
    a = np.asarray(s1, np.float64)[keep]
    b = np.asarray(s2, np.float64)[keep]
    cam = np.asarray(cams)[keep]

    # clusters need >= 3 members (6 endpoints, line3D.cc:2396)
    counts = np.bincount(mc, minlength=num_clusters)
    ok_cluster = counts >= 3
    sel = ok_cluster[mc]
    if not sel.any():
        return empty
    mc, a, b, cam = mc[sel], a[sel], b[sel], cam[sel]
    m = len(mc)

    # border per cluster: projected endpoint farthest from the COG param
    # (s_cog = 1.0 by construction, line3D.cc:2373-2391)
    params = np.concatenate([a, b])                       # (2m,)
    ev_cluster = np.concatenate([mc, mc])
    ev_line = np.tile(np.arange(m), 2)
    ev_cam = np.concatenate([cam, cam])

    absdev = np.abs(params - 1.0)
    border = np.full(num_clusters, 0.0)
    # argmax |param-1| per cluster
    order0 = np.lexsort((absdev, ev_cluster))
    last_of = np.searchsorted(ev_cluster[order0],
                              np.arange(num_clusters + 1))[1:] - 1
    has = counts >= 3
    border[has] = params[order0[last_of[has]]]

    dist = np.abs(params - border[ev_cluster])

    # event order: by cluster, then distance-to-border (stable)
    order = np.lexsort((np.arange(2 * m), dist, ev_cluster))
    ec = ev_cluster[order]
    el = ev_line[order]
    ecam = ev_cam[order]
    epos = params[order]

    # open/close: the first event of each (cluster, line) pair IN SWEEP
    # ORDER opens (el/ec are already sweep-ordered, so the position key is
    # just arange)
    o2 = np.lexsort((np.arange(2 * m), el, ec))
    sign_sorted = np.empty(2 * m, np.int64)
    sign_sorted[0::2] = 1          # groups of exactly 2 events per line
    sign_sorted[1::2] = -1
    sign = np.empty(2 * m, np.int64)
    sign[o2] = sign_sorted

    # per (cluster, cam) running count -> distinct-camera deltas
    o3 = np.lexsort((np.arange(2 * m), ecam, ec))
    s3 = sign[o3]
    grp = np.flatnonzero(np.diff(ecam[o3], prepend=-9) |
                         np.diff(ec[o3], prepend=-9))
    run = np.cumsum(s3)
    base = np.zeros(2 * m, np.int64)
    base[grp] = np.concatenate([[0], run[grp[1:] - 1]])
    base = np.maximum.accumulate(base)
    cnt = run - base                                     # count after event
    delta3 = np.where((s3 > 0) & (cnt == 1), 1,
                      np.where((s3 < 0) & (cnt == 0), -1, 0))
    delta = np.empty(2 * m, np.int64)
    delta[o3] = delta3

    # distinct-open-cameras after each event, per cluster: global cumsum
    # minus the cumulative value just before the cluster's first event
    runall = np.cumsum(delta)
    cgrp = np.flatnonzero(np.diff(ec, prepend=-9))
    start_cum = np.concatenate([[0], runall])[cgrp]
    opencnt = runall - np.repeat(start_cum,
                                 np.diff(np.append(cgrp, 2 * m)))

    above = opencnt >= visibility
    prev = np.concatenate([[False], above[:-1]])
    prev[cgrp] = False
    starts = np.flatnonzero(above & ~prev)
    # an interval closes at the first event where `above` drops
    ends_mask = ~above & prev
    ends = np.flatnonzero(ends_mask)

    # starts/ends alternate within each cluster and sweep order is grouped
    # by cluster, so positional pairing is exact
    return (ec[starts].astype(np.int64),
            epos[starts].astype(float), epos[ends].astype(float))
