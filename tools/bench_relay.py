"""Relay transfer/dispatch microbenchmarks: what does a per-image detect
dispatch actually pay in host->device upload, device->host readback, and
bare program latency on the axon relay?

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_relay.py
"""
from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)


def sync(x):
    return float(jnp.sum(x.astype(jnp.float32).reshape(-1)[:8]))


def best(fn, n=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts), float(np.median(ts))


def main():
    print(f"backend: {jax.default_backend()}", flush=True)

    # bare dispatch latency: tiny jitted program + scalar readback
    f = jax.jit(lambda x: jnp.sum(x) * 2.0)
    x = jnp.ones((8, 128))
    b, m = best(lambda: float(f(x)))
    print(f"dispatch+scalar readback : best {b*1e3:7.1f} ms  med {m*1e3:7.1f} ms",
          flush=True)

    # host->device upload at detect-relevant sizes
    for name, arr in [("upload 28MB f32 (image)",
                       np.zeros((3072, 2304), np.float32)),
                      ("upload 7MB u8 (image)",
                       np.zeros((3072, 2304), np.uint8)),
                      ("upload 0.5MB f32",
                       np.zeros((128, 1024), np.float32))]:
        b, m = best(lambda a=arr: sync(jnp.asarray(a)))
        print(f"{name:25s}: best {b*1e3:7.1f} ms  med {m*1e3:7.1f} ms",
              flush=True)

    # device->host readback at finalize-relevant sizes
    g = jax.jit(lambda: jnp.zeros((32768, 4), jnp.float32))
    y = g()
    sync(y)
    b, m = best(lambda: np.asarray(y).sum())
    print(f"readback 512KB f32       : best {b*1e3:7.1f} ms  med {m*1e3:7.1f} ms",
          flush=True)
    h = jax.jit(lambda: (jnp.zeros((32768, 4), jnp.float32),
                         jnp.zeros((32768,), bool),
                         jnp.int32(1), jnp.int32(2), jnp.int32(3),
                         jnp.int32(4), jnp.int32(5), jnp.int32(6),
                         jnp.int32(7), jnp.int32(8)))
    out = h()
    sync(out[0])
    b, m = best(lambda: jax.device_get(out) and None)
    print(f"device_get full out tuple: best {b*1e3:7.1f} ms  med {m*1e3:7.1f} ms",
          flush=True)
    b, m = best(lambda: [int(out[i]) for i in range(2, 10)] and None)
    print(f"8x separate int() reads  : best {b*1e3:7.1f} ms  med {m*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
