"""Second round of primitive microbenchmarks for the LSD fit redesign:
sorted-id segment reductions, row gathers, monotone gathers, scans, sorts —
at the post-compaction sizes (2.27M active-pixel cap, 262k component cap).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_l3d")

N = 2_265_088    # ~0.5 * subsampled HW, multiple of 1024
C = 262_144


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
    print(f"{name:46s}: {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    vals = jax.random.normal(k1, (N,), jnp.float32)
    ids_rand = jax.random.randint(k2, (N,), 0, C, jnp.int32)
    ids_sorted = jnp.sort(ids_rand)
    table_rows = jax.random.normal(k1, (C, 8), jnp.float32)
    table_1 = jax.random.normal(k1, (C,), jnp.float32)

    timeit("segsum N->C rand", lambda v, l: jax.ops.segment_sum(v, l, C),
           vals, ids_rand)
    timeit("segsum N->C sorted-flagged",
           lambda v, l: jax.ops.segment_sum(v, l, C, indices_are_sorted=True),
           vals, ids_sorted)
    timeit("segmax N->C sorted-flagged",
           lambda v, l: jax.ops.segment_max(v, l, C, indices_are_sorted=True),
           vals, ids_sorted)
    timeit("segsum x7 N->C sorted-flagged",
           lambda v, l: [jax.ops.segment_sum(v * i, l, C,
                                             indices_are_sorted=True)
                         for i in range(1, 8)],
           vals, ids_sorted)
    timeit("row-gather N x [C,8]", lambda t, l: t[l], table_rows, ids_rand)
    timeit("gather N from C rand", lambda t, l: t[l], table_1, ids_rand)
    timeit("gather N from C monotone", lambda t, l: t[l], table_1, ids_sorted)
    timeit("cumsum N", lambda v: jnp.cumsum(v), vals)
    timeit("assoc-scan min N",
           lambda v: jax.lax.associative_scan(jnp.minimum, v), vals)
    timeit("sort N kv (key + 3 payloads)",
           lambda l, v: jax.lax.sort((l, v, v + 1, v + 2), num_keys=1),
           ids_rand, vals)
    timeit("argsort N", lambda l: jnp.argsort(l), ids_rand)
    timeit("nonzero N size=C",
           lambda v: jnp.nonzero(v > 1.2, size=C, fill_value=N)[0], vals)
    timeit("betainc C", lambda t: jax.scipy.special.betainc(
        jnp.abs(t) + 1.0, jnp.abs(t) * 2 + 1.0, 0.125), table_1)
    # scatter of bools back to dense grid (consumed update)
    dense = jnp.zeros((4_530_176,), jnp.bool_)
    idxs = jnp.sort(jax.random.randint(k2, (N,), 0, 4_530_176, jnp.int32))
    flags = vals > 0
    timeit("scatter-set N bools into HW",
           lambda d, i, f: d.at[i].max(f, mode="drop"), dense, idxs, flags)
    print("done", flush=True)


if __name__ == "__main__":
    main()
