"""Pallas LSD fit kernels (ops/lsd_fit.py) vs numpy references.

The moments/extents kernels run in interpreter mode on CPU and must match
plain per-component reductions bit-for-bit (the same math the XLA fallback
path computes with segment ops).
"""

import numpy as np
import jax.numpy as jnp

from line3dpp_tpu.ops import lsd_fit


def _random_sorted_case(rng, n=2048, c_cap=256, dump_frac=0.15):
    """Sorted slot array + payloads, with whole RUNS mapped to the dump
    slot — matching the pipeline invariant (ops/lsd.py `_lsd_round`): slots
    come from label-sorted keys, and a label is dumped as a whole (short
    run / c_cap overflow), so a real component's run is never interrupted.
    The extents kernel's head-scatter relies on this contiguity."""
    n_runs = 40
    run_of = np.sort(rng.integers(0, n_runs, n))
    dump_runs = rng.uniform(size=n_runs) < dump_frac
    slot = np.where(dump_runs[run_of], c_cap, run_of).astype(np.int32)
    xs = rng.uniform(0, 500, n).astype(np.float32)
    ys = rng.uniform(0, 300, n).astype(np.float32)
    mag = rng.uniform(0.1, 9.0, n).astype(np.float32)
    pix = (rng.uniform(size=n) < 0.8).astype(np.float32)
    return slot, xs, ys, mag, pix


def test_moments_kernel(rng):
    c_cap = 256
    slot, xs, ys, mag, pix = _random_sorted_case(rng)
    mom = np.asarray(lsd_fit.moments(
        jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(mag), jnp.asarray(pix), c_cap, interpret=True))

    w = mag * pix
    feats = np.stack([w, w * xs, w * ys, w * xs * xs, w * ys * ys,
                      w * xs * ys, pix, np.zeros_like(w)])
    want = np.zeros((8, c_cap), np.float32)
    for c in range(c_cap):
        m = slot == c
        want[:, c] = feats[:, m].sum(1)
    np.testing.assert_allclose(mom, want, rtol=1e-5, atol=1e-2)


def test_extents_kernel(rng):
    c_cap = 256
    slot, xs, ys, mag, pix = _random_sorted_case(rng)
    theta = rng.uniform(-np.pi, np.pi, c_cap).astype(np.float32)
    cx = rng.uniform(0, 500, c_cap).astype(np.float32)
    cy = rng.uniform(0, 300, c_cap).astype(np.float32)
    gate = rng.uniform(0.5, 50.0, c_cap).astype(np.float32)

    tables = np.zeros((8, c_cap + lsd_fit.WIN), np.float32)
    tables[0, :c_cap] = np.cos(theta)
    tables[1, :c_cap] = np.sin(theta)
    tables[2, :c_cap] = cx
    tables[3, :c_cap] = cy
    tables[4, :c_cap] = gate

    ext = np.asarray(lsd_fit.extents(
        jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(pix), jnp.asarray(tables), c_cap, interpret=True))

    # reference per-pixel projections
    ct, st = np.cos(theta), np.sin(theta)
    sc = np.minimum(slot, c_cap - 1)
    dxp = xs - cx[sc]
    dyp = ys - cy[sc]
    l_proj = dxp * ct[sc] + dyp * st[sc]
    w_proj = -dxp * st[sc] + dyp * ct[sc]

    want_ext = np.full((4, c_cap), lsd_fit.BIG, np.float32)
    for c in range(c_cap):
        m = (slot == c) & (pix != 0)
        if m.any():
            want_ext[0, c] = l_proj[m].min()
            want_ext[1, c] = w_proj[m].min()
            want_ext[2, c] = (-l_proj[m]).min()
            want_ext[3, c] = (-w_proj[m]).min()
    # empty/absent components must stay at BIG exactly
    empty = want_ext[0] >= lsd_fit.BIG
    np.testing.assert_array_equal(ext[:4][:, empty],
                                  want_ext[:, empty])
    np.testing.assert_allclose(ext[:4], want_ext, rtol=1e-4, atol=1e-2)


def test_core_pallas_path_matches_xla(rng):
    """The full _lsd_core with use_pallas_cc=True (interpret-mode kernels via
    monkeypatch) must produce the same accepted segments as the XLA path."""
    import functools

    import line3dpp_tpu.ops.lsd as lsd
    import line3dpp_tpu.ops.lsd_cc as lsd_cc

    img = rng.uniform(0, 8, size=(96, 200)).astype(np.float32)
    from tests.test_lsd import _draw_segment
    for p, q in [((15.0, 20.0), (180.0, 28.0)), ((40.0, 80.0), (160.0, 30.0))]:
        _draw_segment(img, p, q)

    H, W = img.shape
    segs_x, ok_x, _ = lsd._lsd_core(jnp.asarray(img), H, W,
                                    use_pallas_cc=False)
    a = np.asarray(segs_x)[np.asarray(ok_x)]

    import line3dpp_tpu.ops.lsd_gather as lsd_gather

    names = ("moments", "extents", "gate_pixels", "band_counts",
             "gate_moments")
    origs = {n: getattr(lsd_fit, n) for n in names}
    gnames = ("apply_merge_dense", "gather_sorted")
    gorigs = {n: getattr(lsd_gather, n) for n in gnames}
    orig_cc = lsd_cc.cc_tiles
    lsd_cc.cc_tiles = functools.partial(orig_cc, interpret=True)
    for n, fn in origs.items():
        setattr(lsd_fit, n, functools.partial(fn, interpret=True))
    for n, fn in gorigs.items():
        setattr(lsd_gather, n, functools.partial(fn, interpret=True))
    try:
        segs_p, ok_p, _ = lsd._lsd_core(jnp.asarray(img), H, W,
                                        use_pallas_cc=True)
    finally:
        lsd_cc.cc_tiles = orig_cc
        for n, fn in origs.items():
            setattr(lsd_fit, n, fn)
        for n, fn in gorigs.items():
            setattr(lsd_gather, n, fn)
    b = np.asarray(segs_p)[np.asarray(ok_p)]

    assert len(a) == len(b)
    # same segments (order may differ across the two compaction layouts)
    a_sorted = a[np.lexsort(a.T)]
    b_sorted = b[np.lexsort(b.T)]
    np.testing.assert_allclose(a_sorted, b_sorted, rtol=1e-3, atol=0.1)


def test_gate_pixels(rng):
    # the gating kernel vs a plain numpy reference of the lsd.cpp
    # `isaligned` + width-band test
    c_cap = 256
    slot, xs, ys, mag, pix = _random_sorted_case(rng)
    theta = rng.uniform(-np.pi, np.pi, c_cap).astype(np.float32)
    cx = rng.uniform(0, 500, c_cap).astype(np.float32)
    cy = rng.uniform(0, 300, c_cap).astype(np.float32)
    gate = rng.uniform(0.5, 50.0, c_cap).astype(np.float32)
    tables = np.zeros((8, c_cap + lsd_fit.WIN), np.float32)
    tables[0, :c_cap] = np.cos(theta)
    tables[1, :c_cap] = np.sin(theta)
    tables[2, :c_cap] = cx
    tables[3, :c_cap] = cy
    tables[4, :c_cap] = gate
    ang = rng.uniform(-np.pi, np.pi, len(slot)).astype(np.float32)

    center = rng.uniform(-3.0, 3.0, c_cap).astype(np.float32)

    ct, st = np.cos(theta), np.sin(theta)
    sc = np.minimum(slot, c_cap - 1)
    dxp = xs - cx[sc]
    dyp = ys - cy[sc]
    w_proj = -dxp * st[sc] + dyp * ct[sc]
    # row 5 = optional band center on the rect normal (seed-anchored
    # refine, ops/lsd.py seed_center); zero reproduces the symmetric band
    for use_center in (False, True):
        tables[5, :c_cap] = center if use_center else 0.0
        w_eff = (w_proj - center[sc]) if use_center else w_proj
        for dump_keep in (True, False):
            for cos_tol in (-2.0, float(np.cos(np.radians(22.5)))):
                got = np.asarray(lsd_fit.gate_pixels(
                    jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
                    jnp.asarray(ang), jnp.asarray(pix), jnp.asarray(tables),
                    jnp.bool_(dump_keep), jnp.float32(cos_tol),
                    c_cap, interpret=True))
                aligned = (np.abs(np.cos(ang) * ct[sc]
                                  + np.sin(ang) * st[sc]) >= cos_tol)
                want = np.where(
                    slot < c_cap,
                    pix * ((np.abs(w_eff) <= gate[sc]) & aligned),
                    pix if dump_keep else 0.0).astype(np.float32)
                np.testing.assert_array_equal(got, want)


def test_band_counts(rng):
    # width-reduction retry counts vs a plain numpy reference
    c_cap = 256
    slot, xs, ys, mag, pix = _random_sorted_case(rng)
    theta = rng.uniform(-np.pi, np.pi, c_cap).astype(np.float32)
    cx = rng.uniform(0, 500, c_cap).astype(np.float32)
    cy = rng.uniform(0, 300, c_cap).astype(np.float32)
    mid = rng.uniform(-3, 3, c_cap).astype(np.float32)
    width = rng.uniform(0.5, 12.0, c_cap).astype(np.float32)
    tables = np.zeros((8, c_cap + lsd_fit.WIN), np.float32)
    tables[0, :c_cap] = np.cos(theta)
    tables[1, :c_cap] = np.sin(theta)
    tables[2, :c_cap] = cx
    tables[3, :c_cap] = cy
    tables[4, :c_cap] = mid
    tables[5, :c_cap] = width

    got = np.asarray(lsd_fit.band_counts(
        jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(pix), jnp.asarray(tables), c_cap, interpret=True))

    ct, st = np.cos(theta), np.sin(theta)
    sc = np.minimum(slot, c_cap - 1)
    w_proj = -(xs - cx[sc]) * st[sc] + (ys - cy[sc]) * ct[sc]
    d2 = 2.0 * np.abs(w_proj - mid[sc])
    want = np.zeros((4, c_cap), np.float32)
    for b in range(4):
        inb = (pix != 0) & (slot < c_cap) & (d2 <= width[sc] - 0.5 * (b + 1))
        np.add.at(want[b], sc[inb], 1.0)
    np.testing.assert_allclose(got[:4], want, atol=1e-3)

    # asymmetric one-sided bands (the rect_improve side cuts of the
    # rescue cascade, lsd.cpp:1803-1843): lo_w*width+lo_c <= s <= hi_w*
    # width+hi_c in the s = 2(w_proj - mid) frame
    bands = ((-1.0, 1.0, 1.0, 0.0), (-1.0, 0.0, 1.0, -2.0),
             (-1.0, 3.0, 1.0, -1.0))
    got2 = np.asarray(lsd_fit.band_counts(
        jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
        jnp.asarray(pix), jnp.asarray(tables), c_cap, bands=bands,
        interpret=True))
    s = 2.0 * (w_proj - mid[sc])
    want2 = np.zeros((len(bands), c_cap), np.float32)
    for r, (lw, lc, hw, hc) in enumerate(bands):
        inb = ((pix != 0) & (slot < c_cap)
               & (s >= lw * width[sc] + lc) & (s <= hw * width[sc] + hc))
        np.add.at(want2[r], sc[inb], 1.0)
    np.testing.assert_allclose(got2[:len(bands)], want2, atol=1e-3)
    assert not got2[len(bands):].any()


def test_core_seed_center_gate_wiring(rng):
    """seed_center=True: the Pallas path passes the seed-anchored band
    center through tables row 5 (ops/lsd.py `gated_pix`); the kernel must
    implement exactly ``|w_proj - center| <= gate``.

    The XLA and Pallas paths are NOT compared here: their fits sum moments
    in different orders (jax.ops.segment_sum vs one-hot MXU matmuls), the
    seed-anchored shrink turns 1-ULP band flips into discrete region
    repartitions, and the two paths legitimately settle on different
    fragmentations of the same lines (both pass the NFA test; verified
    manually — every segment of both paths lies on a drawn GT line).
    Instead the full Pallas pipeline is run twice with identical fit
    numerics — once with the real gate kernel, once with a plain-jnp
    reference gate — and must agree bit-for-bit, which pins the row-5
    wiring AND the kernel's center semantics end-to-end."""
    import functools

    import line3dpp_tpu.ops.lsd as lsd
    import line3dpp_tpu.ops.lsd_cc as lsd_cc

    img = rng.uniform(0, 8, size=(96, 200)).astype(np.float32)
    from tests.test_lsd import _draw_segment
    for p, q in [((15.0, 20.0), (180.0, 28.0)), ((40.0, 80.0), (160.0, 30.0)),
                 ((30.0, 60.0), (170.0, 64.0))]:
        _draw_segment(img, p, q)
    H, W = img.shape

    def ref_gate(slot, xs, ys, ang, pix, tables, dump_keep, cos_tol,
                 c_cap, interpret=False):
        sc = jnp.minimum(slot, c_cap - 1)
        ct, st = tables[0, sc], tables[1, sc]
        cx, cy = tables[2, sc], tables[3, sc]
        gate, center = tables[4, sc], tables[5, sc]
        w_proj = (-(xs - cx) * st + (ys - cy) * ct) - center
        aligned = jnp.abs(jnp.cos(ang) * ct + jnp.sin(ang) * st) >= cos_tol
        keep = (pix != 0.0) & (jnp.abs(w_proj) <= gate) & aligned
        return jnp.where(slot < c_cap, jnp.where(keep, 1.0, 0.0),
                         jnp.where(dump_keep & (pix != 0.0), 1.0, 0.0)
                         ).astype(jnp.float32)

    # _lsd_round is jax.jit'ed with identical static args/avals across the
    # two runs; without clearing its cache the second run would reuse the
    # first trace and the patched gate would never execute (round-4 advisor
    # finding: the test compared a run to itself).  Clear the cache before
    # each run and count ref_gate traces to prove the patch took effect.
    gate_calls = []

    def counted_ref_gate(*a, **kw):
        gate_calls.append(1)
        return ref_gate(*a, **kw)

    import line3dpp_tpu.ops.lsd_gather as lsd_gather

    orig_cc, orig_mom, orig_ext, orig_gate = (
        lsd_cc.cc_tiles, lsd_fit.moments, lsd_fit.extents,
        lsd_fit.gate_pixels)
    gorigs = {n: getattr(lsd_gather, n)
              for n in ("apply_merge_dense", "gather_sorted")}
    lsd_cc.cc_tiles = functools.partial(orig_cc, interpret=True)
    lsd_fit.moments = functools.partial(orig_mom, interpret=True)
    lsd_fit.extents = functools.partial(orig_ext, interpret=True)
    for n, fn in gorigs.items():
        setattr(lsd_gather, n, functools.partial(fn, interpret=True))
    try:
        lsd_fit.gate_pixels = functools.partial(orig_gate, interpret=True)
        lsd._lsd_round.clear_cache()
        segs_k, ok_k, _ = lsd._lsd_core(jnp.asarray(img), H, W,
                                        use_pallas_cc=True, seed_center=True)
        a = np.asarray(segs_k)[np.asarray(ok_k)]
        lsd_fit.gate_pixels = counted_ref_gate
        lsd._lsd_round.clear_cache()
        segs_r, ok_r, _ = lsd._lsd_core(jnp.asarray(img), H, W,
                                        use_pallas_cc=True, seed_center=True)
        b = np.asarray(segs_r)[np.asarray(ok_r)]
    finally:
        lsd_cc.cc_tiles = orig_cc
        lsd_fit.moments = orig_mom
        lsd_fit.extents = orig_ext
        lsd_fit.gate_pixels = orig_gate
        for n, fn in gorigs.items():
            setattr(lsd_gather, n, fn)
        lsd._lsd_round.clear_cache()

    assert gate_calls, "reference gate was never traced — vacuous compare"
    assert len(a) >= 8  # the pipeline actually extracted the drawn lines
    assert len(a) == len(b)
    np.testing.assert_array_equal(a[np.lexsort(a.T)], b[np.lexsort(b.T)])


def test_gate_moments_equals_gate_then_moments(rng):
    """The fused refine kernel must be bit-identical to gate_pixels
    followed by moments on its output (same formulas, same precision,
    newpix exactly 0/1)."""
    c_cap = 256
    slot, xs, ys, mag, pix = _random_sorted_case(rng)
    ang = rng.uniform(-np.pi, np.pi, len(slot)).astype(np.float32)
    theta = rng.uniform(-np.pi, np.pi, c_cap).astype(np.float32)
    tables = np.zeros((8, c_cap + lsd_fit.WIN), np.float32)
    tables[0, :c_cap] = np.cos(theta)
    tables[1, :c_cap] = np.sin(theta)
    tables[2, :c_cap] = rng.uniform(0, 500, c_cap)
    tables[3, :c_cap] = rng.uniform(0, 300, c_cap)
    tables[4, :c_cap] = rng.uniform(0.5, 6.0, c_cap)
    tables[5, :c_cap] = rng.uniform(-2.0, 2.0, c_cap)
    args = (jnp.asarray(slot), jnp.asarray(xs), jnp.asarray(ys),
            jnp.asarray(ang))
    targs = (jnp.asarray(tables), jnp.bool_(True), jnp.float32(0.8), c_cap)
    for dump_keep in (True, False):
        targs = (jnp.asarray(tables), jnp.bool_(dump_keep),
                 jnp.float32(0.8), c_cap)
        newpix, mom = lsd_fit.gate_moments(
            *args[:3], args[3], jnp.asarray(mag), jnp.asarray(pix),
            *targs, interpret=True)
        want_pix = lsd_fit.gate_pixels(
            *args[:3], args[3], jnp.asarray(pix), *targs, interpret=True)
        want_mom = lsd_fit.moments(
            args[0], args[1], args[2], jnp.asarray(mag), want_pix, c_cap,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(newpix),
                                      np.asarray(want_pix))
        np.testing.assert_array_equal(np.asarray(mom), np.asarray(want_mom))
