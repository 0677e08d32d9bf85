"""Cluster-split diagnostic: why do predicted lines swallow 2+ golden lines?

Runs the pipeline up to clustering on CPU (warm segment cache), maps every
graph node (view, segment) to a golden 3D line via the golden file's 2D
residuals (camID + 2D endpoints, reference README.md:272-277), then inspects
the affinity edges that *bridge* two different golden lines inside one of our
clusters.  Reports, per bridge-edge class (same-view / cross-view,
collinear-disjoint / overlapping in 3D), the counts and affinity weights —
pinpointing which edge source over-merges vs the reference's graph
(NEXT.md item 1; VERDICT round-1 weak item 3).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/diag_cluster_split.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import line3dpp_tpu as l3d
from line3dpp_tpu.ops import affinity as affinity_ops
from line3dpp_tpu.ops import clustering as clustering_ops
from line3dpp_tpu.utils.golden import parse_lines3d_txt

REPO = os.path.join(os.path.dirname(__file__), "..")
IMG_DIR = "/root/reference/testdata"
GOLDEN = os.path.join(
    IMG_DIR, "Line3D++_ref",
    "Line3D++__W_FULL__N_10__sigmaP_2.5__sigmaA_10__epiOverlap_0.25"
    "__kNN_10__vis_3.txt")
CAMS = os.path.join(REPO, "testdata", "cameras_testdata.json")
CACHE = os.path.join(REPO, "testdata", "L3D_cache")


def build_graph(pipe):
    """Re-run the edge extraction of reconstruct_3d_lines (pipeline.py:404-470)
    and return nodes, edges, weights, labels."""
    cfg = pipe.config
    st = pipe._last_state
    V, S = st["mask"].shape
    aff = st["aff"]
    M = aff.weight.shape[2]
    n_edges = affinity_ops.count_edges(aff.edge_valid)
    cap = affinity_ops.compaction_capacity(n_edges)
    idx, okm, ww, tv_e, ts_e = affinity_ops.compact_edges(aff, cap)
    idx, ww, tv_e, ts_e = idx[okm], ww[okm], tv_e[okm], ts_e[okm]
    src_v = (idx // (S * M)).astype(np.int64)
    src_s = (idx // M) % S
    gid_a = src_v * S + src_s
    gid_b = tv_e.astype(np.int64) * S + ts_e
    lo = np.minimum(gid_a, gid_b)
    hi = np.maximum(gid_a, gid_b)
    _, first = np.unique(lo * (V * S) + hi, return_index=True)
    lo, hi, ww = lo[first], hi[first], ww[first]
    nodes, inv = np.unique(np.concatenate([lo, hi]), return_inverse=True)
    li = inv[: len(lo)].astype(np.int32)
    lj = inv[len(lo):].astype(np.int32)
    ei = np.concatenate([li, lj])
    ej = np.concatenate([lj, li])
    ew = np.concatenate([ww, ww]).astype(np.float32)
    labels = clustering_ops.cluster_edges(ei, ej, ew, len(nodes),
                                          cfg.felzenszwalb_c)
    return st, nodes, li, lj, np.asarray(ww), labels


def map_nodes_to_golden(st, nodes, cam_ids, gold_lines, tol2d=4.0):
    """Assign each node its best-covering golden line id (or -1)."""
    S = st["mask"].shape[1]
    segs = st["segs"]
    # per camera: residual segments (E,4) + their golden line ids
    res_by_cam: dict[int, list] = {}
    for gi, g in enumerate(gold_lines):
        for r in g.residuals:
            res_by_cam.setdefault(int(r[0]), []).append(
                (gi, r[2], r[3], r[4], r[5]))
    node_gold = np.full(len(nodes), -1, np.int64)
    node_cov = np.zeros(len(nodes))
    ts = np.linspace(0.0, 1.0, 9)
    for v_idx, cam in enumerate(cam_ids):
        rows = res_by_cam.get(int(cam), [])
        if not rows:
            continue
        arr = np.array([r[1:] for r in rows])          # (E,4)
        gids = np.array([r[0] for r in rows])
        sel = np.where(nodes // S == v_idx)[0]
        if not len(sel):
            continue
        ss = segs[v_idx, nodes[sel] % S]                # (n,4)
        p = ss[:, :2][:, None, :] * (1 - ts[None, :, None]) \
            + ss[:, 2:][:, None, :] * ts[None, :, None]  # (n,9,2)
        a = arr[:, :2]
        d = arr[:, 2:] - a
        len2 = np.maximum((d * d).sum(-1), 1e-12)
        # dist of each sample to each residual segment
        w = p[:, :, None, :] - a[None, None, :, :]       # (n,9,E,2)
        t = np.clip((w * d[None, None]).sum(-1) / len2[None, None], 0, 1)
        cl = a[None, None] + t[..., None] * d[None, None]
        dist = np.linalg.norm(p[:, :, None, :] - cl, axis=-1)  # (n,9,E)
        near = dist < tol2d
        # coverage of OUR segment per golden line
        n_g = len(gold_lines)
        cov_g = np.zeros((len(sel), n_g))
        for e in range(arr.shape[0]):
            np.maximum.at(cov_g[:, gids[e]], slice(None), 0)  # no-op, keep shape
        # accumulate: a sample covered by ANY residual of golden gi
        for gi in np.unique(gids):
            m = near[:, :, gids == gi].any(-1)           # (n,9)
            cov_g[:, gi] = m.mean(1)
        best = cov_g.argmax(1)
        bc = cov_g[np.arange(len(sel)), best]
        node_gold[sel] = np.where(bc >= 0.6, best, -1)
        node_cov[sel] = bc
    return node_gold, node_cov


def main():
    from PIL import Image

    cams = json.load(open(CAMS))
    cfg = l3d.Config()
    pipe = l3d.Line3D(cfg)
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]), np.array(c["t"]),
                         c["width"], c["height"])
        img = np.asarray(Image.open(
            os.path.join(IMG_DIR, c["image"])).convert("L"))
        pipe.add_image(int(cam_id), cam, img, cache_dir=CACHE)
    pipe.match_images()
    print("matched", flush=True)

    st, nodes, li, lj, ww, labels = build_graph(pipe)
    cam_ids = sorted(pipe._views)
    gold_lines = parse_lines3d_txt(GOLDEN)
    node_gold, node_cov = map_nodes_to_golden(st, nodes, cam_ids, gold_lines)
    n_nodes = len(nodes)
    print(f"nodes {n_nodes}, edges {len(ww)}, "
          f"mapped {(node_gold >= 0).sum()} ({(node_gold>=0).mean()*100:.0f}%)",
          flush=True)

    # clusters -> golden composition
    uniq, inv = np.unique(labels, return_inverse=True)
    S = st["mask"].shape[1]
    from collections import Counter, defaultdict
    members = defaultdict(list)
    for n_i in range(n_nodes):
        members[inv[n_i]].append(n_i)
    multi = []
    for c, mem in members.items():
        gs = Counter(int(node_gold[m]) for m in mem if node_gold[m] >= 0)
        # golden lines with >=2 member segments each (solid claims)
        solid = [g for g, k in gs.items() if k >= 2]
        if len(solid) >= 2:
            multi.append((c, solid, len(mem)))
    print(f"clusters with >=2 solid golden lines: {len(multi)}", flush=True)

    # bridge edges: endpoints mapped to different golden lines
    eg_i = node_gold[li]
    eg_j = node_gold[lj]
    bridge = (eg_i >= 0) & (eg_j >= 0) & (eg_i != eg_j)
    same_cluster = inv[li] == inv[lj]
    b = bridge & same_cluster
    print(f"bridge edges inside clusters: {b.sum()} / {len(ww)} edges",
          flush=True)

    # classify each bridge edge
    estP1 = np.asarray(pipe._last_state["fm"].est_P1)
    estP2 = np.asarray(pipe._last_state["fm"].est_P2)
    nv = (nodes // S).astype(int)
    ns = (nodes % S).astype(int)
    bi = np.where(b)[0]
    same_view = nv[li[bi]] == nv[lj[bi]]

    def gap_ratio(e):
        i, j = li[e], lj[e]
        p1, p2 = estP1[nv[i], ns[i]], estP2[nv[i], ns[i]]
        q1, q2 = estP1[nv[j], ns[j]], estP2[nv[j], ns[j]]
        d = p2 - p1
        L = np.linalg.norm(d)
        if L < 1e-9:
            return 0.0
        d /= L
        t1, t2 = 0.0, L
        s1 = np.dot(q1 - p1, d)
        s2 = np.dot(q2 - p1, d)
        lo_, hi_ = min(s1, s2), max(s1, s2)
        inter = min(t2, hi_) - max(t1, lo_)
        return inter / max(min(L, hi_ - lo_), 1e-9)   # <0 => disjoint along dir

    gaps = np.array([gap_ratio(e) for e in bi])
    disjoint = gaps < 0.1
    print("bridge classes:", flush=True)
    for tag, m in [("same-view", same_view),
                   ("cross-view overlap", ~same_view & ~disjoint),
                   ("cross-view disjoint/collinear", ~same_view & disjoint)]:
        sel = bi[m]
        if len(sel):
            print(f"  {tag:30s}: {len(sel):6d} edges, "
                  f"w median {np.median(ww[sel]):.3f}, "
                  f"w p90 {np.percentile(ww[sel], 90):.3f}", flush=True)
        else:
            print(f"  {tag:30s}: 0 edges", flush=True)

    # weight distribution: bridges vs intra-golden edges
    intra = (eg_i >= 0) & (eg_j >= 0) & (eg_i == eg_j)
    print(f"intra-golden edges: {intra.sum()}, w median "
          f"{np.median(ww[intra]):.3f}", flush=True)
    hist, edges_ = np.histogram(ww[b], bins=[0, .4, .5, .6, .7, .8, .9, 1.01])
    print("bridge w histogram:",
          {f"{edges_[k]:.1f}": int(hist[k]) for k in range(len(hist))},
          flush=True)

    # if we cut all bridge edges, how many clusters split?
    keep = ~b
    ei = np.concatenate([li[keep], lj[keep]])
    ej = np.concatenate([lj[keep], li[keep]])
    ew = np.concatenate([ww[keep], ww[keep]]).astype(np.float32)
    lab2 = clustering_ops.cluster_edges(ei, ej, ew, n_nodes,
                                        pipe.config.felzenszwalb_c)
    print(f"clusters: {len(np.unique(labels))} -> {len(np.unique(lab2))} "
          f"after cutting bridges", flush=True)
    np.savez("/tmp/diag_graph.npz", nodes=nodes, li=li, lj=lj, ww=ww,
             labels=labels, node_gold=node_gold, node_cov=node_cov)


if __name__ == "__main__":
    main()
