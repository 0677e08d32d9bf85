"""TPU (Mosaic) lowering smoke tests for every Pallas kernel.

Round 4 shipped `Precision.HIGH` inside the LSD fit kernels; the installed
JAX Mosaic lowering only supports DEFAULT/HIGHEST for in-kernel dot_general
(jax/_src/pallas/mosaic/lowering.py raises "Unsupported dot precision"), so
every TPU detection run crashed (BENCH_r04 rc=1) while CPU-forced tests and
interpret-mode dryruns stayed green.  These tests lower each Pallas entry
point *for platform tpu* from the CPU test box — no relay, no hardware —
so any lowering-breaking edit (unsupported precision/op/layout) fails CI.

`.lower(lowering_platforms=("tpu",))` runs the full Mosaic kernel lowering
(the pallas_call is lowered to a Mosaic custom call at trace-to-StableHLO
time), which is exactly the stage that raised in round 4.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from line3dpp_tpu.ops import (affinity_pallas, lsd_cc, lsd_fit,
                              matching_pallas, scoring_pallas)


def _lower_tpu(fn, *args, **static):
    """Trace with concrete avals and lower for the TPU platform."""
    jitted = jax.jit(functools.partial(fn, **static))
    return jitted.trace(*args).lower(lowering_platforms=("tpu",))


def _fit_args(n=2048, c_cap=512):
    slot = jnp.zeros((n,), jnp.int32)
    f = jnp.zeros((n,), jnp.float32)
    tables = jnp.zeros((lsd_fit.ROWS, c_cap + lsd_fit.WIN), jnp.float32)
    return slot, f, tables, c_cap


def test_lsd_fit_kernels_lower_for_tpu():
    slot, f, tables, c_cap = _fit_args()
    _lower_tpu(lsd_fit.moments, slot, f, f, f, f, c_cap=c_cap)
    _lower_tpu(lsd_fit.extents, slot, f, f, f, tables, c_cap=c_cap)
    _lower_tpu(lsd_fit.gate_pixels, slot, f, f, f, f, tables,
               jnp.bool_(True), jnp.float32(0.9), c_cap=c_cap)
    _lower_tpu(lsd_fit.band_counts, slot, f, f, f, tables, c_cap=c_cap)
    _lower_tpu(lsd_fit.band_counts, slot, f, f, f, tables, c_cap=c_cap,
               bands=((-1.0, 1.0, 1.0, 0.0),) * 7)
    _lower_tpu(lsd_fit.gate_moments, slot, f, f, f, f, f, tables,
               jnp.bool_(True), jnp.float32(0.9), c_cap=c_cap)


def test_lsd_gather_kernels_lower_for_tpu():
    from line3dpp_tpu.ops import lsd_gather

    lab = jnp.zeros((256, 512), jnp.int32)
    T = jnp.zeros((256 * 512,), jnp.int32)
    _lower_tpu(lsd_gather.apply_merge_dense, lab, T, tile=(128, 512),
               invalid=1 << 30)
    src = jnp.zeros((128 * 4096,), jnp.int32)
    idx = jnp.zeros((8192,), jnp.int32)
    _lower_tpu(lsd_gather.gather_sorted, src, idx, win_rows=512)


def test_lsd_cc_kernels_lower_for_tpu():
    hp, wp = lsd_cc.TILE_H * 2, lsd_cc.TILE_W * 2
    angle = jnp.zeros((hp, wp), jnp.float32)
    active = jnp.zeros((hp, wp), bool)
    tol = jnp.float32(0.9)
    _lower_tpu(lsd_cc.cc_tiles, angle, active, tol)
    # merge_tile_labels is XLA + the same tile kernel path; lower it too
    lab = jnp.zeros((hp, wp), jnp.int32)
    _lower_tpu(lsd_cc.merge_tile_labels, lab, angle, active, tol)


def test_matching_pallas_lowers_for_tpu():
    V, S, P = 3, 128, 2
    segments = jnp.zeros((V, S, 4), jnp.float32)
    seg_mask = jnp.zeros((V, S), bool)
    RtKinv = jnp.tile(jnp.eye(3, dtype=jnp.float32), (V, 1, 1))
    C = jnp.zeros((V, 3), jnp.float32)
    src = jnp.zeros((P,), jnp.int32)
    tgt = jnp.ones((P,), jnp.int32)
    F = jnp.tile(jnp.eye(3, dtype=jnp.float32), (P, 1, 1))
    pv = jnp.ones((P,), bool)
    _lower_tpu(matching_pallas.match_pairs_pallas, segments, seg_mask,
               RtKinv, C, src, tgt, F, pv, knn=4)


def test_scoring_pallas_lowers_for_tpu():
    V, S, N, knn = 2, 64, 2, 4
    M = N * knn
    r = jnp.zeros((V, S, 3), jnp.float32)
    C = jnp.zeros((V, 3), jnp.float32)
    k_reg = jnp.ones((V,), jnp.float32)
    nbr = jnp.zeros((V, N), jnp.int32)
    d = jnp.zeros((V, S, M), jnp.float32)
    valid = jnp.zeros((V, S, M), bool)
    _lower_tpu(scoring_pallas.score_matches_pallas, r, r, r, C, k_reg,
               nbr, d, d, valid, knn=knn, two_sig_a_sqr=25.0)


def test_affinity_pallas_lowers_for_tpu():
    V, S, N, knn = 2, 128, 2, 4
    M = N * knn
    P = jnp.zeros((V, S, 3), jnp.float32)
    d = jnp.zeros((V, S), jnp.float32)
    valid = jnp.zeros((V, S), bool)
    nbr = jnp.zeros((V, N), jnp.int32)
    tgt = jnp.zeros((V, S, M), jnp.int32)
    _lower_tpu(affinity_pallas.gather_target_estimates, P, P, d, d, valid,
               nbr, tgt, knn=knn)


def test_unsupported_precision_fails_lowering():
    """The exact round-4 failure mode must be *caught* by this harness:
    a kernel dot with Precision.HIGH must raise at TPU lowering time."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def bad_kernel(a_ref, b_ref, o_ref):
        o_ref[:, :] = jax.lax.dot_general(
            a_ref[:, :], b_ref[:, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGH)

    def bad(a, b):
        return pl.pallas_call(
            bad_kernel,
            out_shape=jax.ShapeDtypeStruct((128, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(a, b)

    a = jnp.zeros((128, 128), jnp.float32)
    with pytest.raises(Exception, match="[Pp]recision"):
        _lower_tpu(bad, a, a)
