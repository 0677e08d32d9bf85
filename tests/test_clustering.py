"""Clustering tests: native C++ union-find vs the python reference
(reference semantics: clustering.cc:6-48, universe.h:49-104)."""

import numpy as np
import pytest

from line3dpp_tpu.ops import clustering


def _random_edges(rng, n_nodes=200, n_edges=1500):
    i = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    j = rng.integers(0, n_nodes, n_edges).astype(np.int32)
    keep = i != j
    w = rng.uniform(0.5, 1.0, n_edges).astype(np.float32)
    return i[keep], j[keep], w[keep]


def test_native_matches_python(rng):
    i, j, w = _random_edges(rng)
    if clustering._native_lib() is None:
        pytest.skip("native lib unavailable")

    order = np.argsort(w, kind="stable")
    i2, j2, w2 = i[order], j[order], w[order]
    lab_native = clustering.cluster_edges(i, j, w, 200, 3.0)
    lab_py = clustering._cluster_python(i2, j2, w2, 200, 3.0)
    # same partition (root choice may differ)
    _, a = np.unique(lab_native, return_inverse=True)
    _, b = np.unique(lab_py, return_inverse=True)
    assert (a[:, None] == a[None, :]).all() == (b[:, None] == b[None, :]).all()
    np.testing.assert_array_equal(
        a[:, None] == a[None, :], b[:, None] == b[None, :])


def test_strong_cliques_cluster_together():
    # two strong cliques, weak cross edge with high weight (= weak affinity
    # after the 1-w flip the pipeline does NOT do — here low weight merges
    # first, so use low weights for in-clique edges)
    edges = []
    for base in (0, 4):
        for a in range(4):
            for b in range(a + 1, 4):
                edges.append((base + a, base + b, 0.1))
    edges.append((3, 4, 5.0))  # far above the adaptive threshold
    i = np.array([e[0] for e in edges], np.int32)
    j = np.array([e[1] for e in edges], np.int32)
    w = np.array([e[2] for e in edges], np.float32)
    labels = clustering.cluster_edges(i, j, w, 8, 0.5)
    assert len(set(labels[:4])) == 1
    assert len(set(labels[4:])) == 1
    assert labels[0] != labels[7]


def test_anchored_all_weak_matches_plain(rng):
    # with no strong nodes the anchor constraint never fires: identical
    # partition to the single-pass reference clustering
    i, j, w = _random_edges(rng)
    strong = np.zeros(200, bool)
    lab_a = clustering.cluster_edges_anchored(i, j, w, 200, strong, 3.0)
    lab_p = clustering.cluster_edges(i, j, w, 200, 3.0)
    _, a = np.unique(lab_a, return_inverse=True)
    _, b = np.unique(lab_p, return_inverse=True)
    np.testing.assert_array_equal(
        a[:, None] == a[None, :], b[:, None] == b[None, :])


def test_anchored_blocks_weak_bridge():
    # two strong cliques joined ONLY through a weak node with cheap edges:
    # plain clustering merges everything; anchored keeps the strong
    # clusters apart (the weak bridge node joins one of them)
    edges = []
    for base in (0, 3):
        for a in range(3):
            for b in range(a + 1, 3):
                edges.append((base + a, base + b, 0.1))
    edges.append((2, 6, 0.15))   # strong A -> weak bridge
    edges.append((6, 3, 0.15))   # weak bridge -> strong B
    i = np.array([e[0] for e in edges], np.int32)
    j = np.array([e[1] for e in edges], np.int32)
    w = np.array([e[2] for e in edges], np.float32)
    strong = np.array([1, 1, 1, 1, 1, 1, 0], bool)

    lab_p = clustering.cluster_edges(i, j, w, 7, 3.0)
    assert len(set(lab_p.tolist())) == 1          # plain: all merged

    lab_a = clustering.cluster_edges_anchored(i, j, w, 7, strong, 3.0)
    assert lab_a[0] == lab_a[1] == lab_a[2]
    assert lab_a[3] == lab_a[4] == lab_a[5]
    assert lab_a[0] != lab_a[3]                   # strong clusters separate
    assert lab_a[6] in (lab_a[0], lab_a[3])       # bridge joined one side


def test_anchored_pass2_may_refine_pass1():
    # weak members interleaved into pass 2 inflate component sizes and
    # lower the adaptive threshold w + c/size, so a strong-strong merge
    # accepted in pass 1 can be REJECTED in pass 2: pass-2 strong
    # components refine (never coarsen) the pass-1 partition
    # (ops/clustering.cluster_edges_anchored docstring).
    edges = [
        (0, 2, 0.1), (0, 3, 0.1),   # weak members of strong node 0
        (1, 4, 0.1), (1, 5, 0.1),   # weak members of strong node 1
        (0, 1, 0.9),                # the strong-strong edge
    ]
    i = np.array([e[0] for e in edges], np.int32)
    j = np.array([e[1] for e in edges], np.int32)
    w = np.array([e[2] for e in edges], np.float32)
    strong = np.array([1, 1, 0, 0, 0, 0], bool)
    c = 1.0

    # pass 1 alone (strong subgraph {0,1}) merges: 0.9 <= c
    lab1 = clustering.cluster_edges(i[4:], j[4:], w[4:], 6, c)
    assert lab1[0] == lab1[1]

    # anchored: weak merges first (threshold drops to 0.1 + c/3), the
    # 0.9 strong edge is then rejected -> the pass-1 cluster splits,
    # each fragment keeping its weak members
    lab2 = clustering.cluster_edges_anchored(i, j, w, 6, strong, c)
    assert lab2[0] != lab2[1]
    assert lab2[2] == lab2[3] == lab2[0]
    assert lab2[4] == lab2[5] == lab2[1]
