"""AOT warm-start plumbing (ops/lsd.py): artifact keying + safe fallback.

The serialized-executable path exists because the axon relay makes the
persistent compile-cache key drift between sessions (CLAUDE.md).  These
tests pin the invalidation contract — any change to shape, dtype, static
detect args, or the detection modules' code must change the artifact
path — and that a corrupt artifact falls back to the jit path instead of
crashing detection.
"""

import os

import numpy as np
import pytest

from line3dpp_tpu.ops import lsd

KW = dict(rect_improve=False, rescue=False, n_rounds=3, seed_gate=False,
          seed_center=False, side_split=False, refine_iters=2)


def test_aot_path_keys_on_everything(tmp_path, monkeypatch):
    monkeypatch.setenv("L3D_AOT_DIR", str(tmp_path))
    base = lsd.aot_path(2304, 3072, True, KW)
    assert str(tmp_path) in base and base.endswith(".pkl")
    # shape, dtype, backend flag and static args all key the artifact
    assert lsd.aot_path(1152, 3072, True, KW) != base
    assert lsd.aot_path(2304, 3072, True, KW, dtype="float32") != base
    assert lsd.aot_path(2304, 3072, False, KW) != base
    kw2 = dict(KW, rescue=True)
    assert lsd.aot_path(2304, 3072, True, kw2) != base
    # the code fingerprint is part of the name (stale-after-edit guard)
    assert lsd._code_fingerprint() in base


def test_corrupt_artifact_falls_back_to_jit(tmp_path, monkeypatch, rng):
    monkeypatch.setenv("L3D_AOT_DIR", str(tmp_path))
    lsd._aot_loaded.clear()
    img = rng.uniform(0, 8, size=(96, 200)).astype(np.float32)
    import jax.numpy as jnp

    path = lsd.aot_path(96, 200, False, KW, dtype="float32")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "wb") as f:
        f.write(b"not a pickle of an executable")
    out = lsd._detect_dispatch(jnp.asarray(img), 96, 200, False, **KW)
    # jit fallback produced the normal structured output
    assert len(out) == 15
    assert lsd._aot_loaded[path] is False  # remembered as bad
    lsd._aot_loaded.clear()
