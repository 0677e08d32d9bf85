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
    """Sweep every cluster; returns per-cluster interval lists."""
    out: list[list[tuple[float, float]]] = [[] for _ in range(num_clusters)]
    order = np.argsort(member_cluster, kind="stable")
    mc = member_cluster[order]
    boundaries = np.searchsorted(mc, np.arange(num_clusters + 1))
    for c in range(num_clusters):
        sel = order[boundaries[c] : boundaries[c + 1]]
        sel = sel[member_ok[sel]]
        if len(sel) == 0:
            continue
        out[c] = sweep_cluster(s1[sel], s2[sel], cams[sel], visibility)
    return out
