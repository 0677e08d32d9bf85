"""Microbenchmarks of the primitives the LSD redesign depends on.

Measures, on the real TPU: segment_sum / segment_min scatter costs,
random gather costs (big and small tables), sort/argsort, cumsum, and a
dense 8-neighbor stencil iteration — at the sizes LSD actually uses
(4.5M-pixel subsampled image, ~500k active pixels, 65k components).
Numbers drive the choice of reduction strategy (scatter vs sort vs
one-hot MXU matmul).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_l3d")

HW = 4_530_000   # ~2458x1843 subsampled pixels
NACT = 524_288   # active pixels
C = 65_536       # component cap


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    return float(jnp.sum(leaves[0].astype(jnp.float32).reshape(-1)[:8]))


def timeit(name, fn, *args, n=3):
    f = jax.jit(fn)
    sync(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        sync(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s}: {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    vals_hw = jax.random.normal(k1, (HW,), jnp.float32)
    vals_act = jax.random.normal(k1, (NACT,), jnp.float32)
    lab_hw = jax.random.randint(k2, (HW,), 0, HW, jnp.int32)
    lab_hw_small = jax.random.randint(k2, (HW,), 0, C, jnp.int32)
    lab_act = jax.random.randint(k3, (NACT,), 0, C, jnp.int32)
    table_hw = jax.random.normal(k4, (HW,), jnp.float32)
    table_c = jax.random.normal(k4, (C,), jnp.float32)
    img = jax.random.normal(k1, (2464, 1844), jnp.float32)

    timeit("segment_sum HW->HW", lambda v, l: jax.ops.segment_sum(v, l, HW),
           vals_hw, lab_hw)
    timeit("segment_sum HW->C", lambda v, l: jax.ops.segment_sum(v, l, C),
           vals_hw, lab_hw_small)
    timeit("segment_sum NACT->C", lambda v, l: jax.ops.segment_sum(v, l, C),
           vals_act, lab_act)
    timeit("segment_min NACT->C",
           lambda v, l: jax.ops.segment_min(v, l, C), vals_act, lab_act)
    timeit("segment_sum NACT->C x7 ids shared",
           lambda v, l: [jax.ops.segment_sum(v * i, l, C) for i in range(1, 8)],
           vals_act, lab_act)
    timeit("gather HW from HW table", lambda t, l: t[l], table_hw, lab_hw)
    timeit("gather HW from C table", lambda t, l: t[l], table_c, lab_hw_small)
    timeit("gather NACT from C table", lambda t, l: t[l], table_c, lab_act)
    timeit("sort HW int32", lambda l: jnp.sort(l), lab_hw)
    timeit("argsort NACT int32", lambda l: jnp.argsort(l), lab_act)
    timeit("sort_kv NACT (key + 2 payloads)",
           lambda l, v: jax.lax.sort((l, v, v), num_keys=1), lab_act, vals_act)
    timeit("cumsum HW f32", lambda v: jnp.cumsum(v), vals_hw)
    timeit("cumsum HW int32 (mask rank)",
           lambda l: jnp.cumsum((l > 0).astype(jnp.int32)), lab_hw)
    timeit("nonzero-compact HW->NACT",
           lambda v: jnp.nonzero(v > 0.9, size=NACT, fill_value=-1)[0], vals_hw)

    def stencil8(x):
        out = x
        for dy, dx in ((0, 1), (0, -1), (1, 0), (-1, 0),
                       (1, 1), (1, -1), (-1, 1), (-1, -1)):
            out = jnp.minimum(out, jnp.roll(x, (-dy, -dx), (0, 1)))
        return out

    timeit("8-neighbor roll-min on image x16",
           lambda x: jax.lax.fori_loop(0, 16, lambda i, a: stencil8(a), x), img)

    # one-hot MXU reduction: NACT values into C bins, 7 features, bucketed
    # out[c_hi, c_lo] = A[p, c_hi]^T @ B[p, c_lo]  with c = c_hi*128 + c_lo
    def onehot_reduce(v, l):
        chi = l // 128
        clo = l % 128
        A = jax.nn.one_hot(chi, C // 128, dtype=jnp.float32)     # (N, 512)
        B = jax.nn.one_hot(clo, 128, dtype=jnp.float32) * v[:, None]
        return jax.lax.dot_general(
            A, B, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                  # (512, 128)

    timeit("one-hot MXU reduce NACT->C (1 feat)", onehot_reduce,
           vals_act, lab_act)

    print("done", flush=True)


if __name__ == "__main__":
    main()
