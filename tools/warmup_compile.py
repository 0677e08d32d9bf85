"""Pre-compile the TPU detection program and serialize the executable.

The detection program takes 7-15 min to compile over the axon relay, and
the relay's multi-tenant worker pool makes the persistent-compilation-
cache key drift between sessions (byte-identical programs hash to
different keys — see ops/lsd.py AOT section).  This tool compiles once
per input shape and pickles the loaded executable into `.jax_aot/`;
`detect()`/`detect_batch()` then warm-start in ~25 s (4 s deserialize +
first dispatch) instead of recompiling.

Artifacts are keyed by shape + static detect args + a fingerprint of the
detection modules, so code edits invalidate them automatically (the old
files just stop matching; prune with --prune).

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/warmup_compile.py \
      [HxW ...] [--prune]

Default shape: 2304x3072 (the bundled testdata / bench image size).
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")


def main() -> None:
    from line3dpp_tpu.ops import lsd

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    shapes = [tuple(int(v) for v in a.split("x")) for a in args] or [
        (2304, 3072)]

    if "--prune" in sys.argv:
        fp = lsd._code_fingerprint()
        for f in os.listdir(lsd.aot_dir()):
            if f.endswith(".pkl") and fp not in f:
                os.remove(os.path.join(lsd.aot_dir(), f))
                print("pruned", f)

    if jax.default_backend() != "tpu":
        print("warmup_compile: backend is not TPU; nothing to do")
        return
    for H, W in shapes:
        t0 = time.time()
        path = lsd.aot_warmup(H, W, use_pallas_cc=True)
        sz = os.path.getsize(path) / 1e6
        print(f"{H}x{W}: {path} ({sz:.0f} MB) in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
