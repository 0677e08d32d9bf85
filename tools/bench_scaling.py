"""Measured weak scaling of the view-sharded step on a virtual CPU mesh.

VERDICT r4 "missing #4": SCALING.md's communication:compute claim was
analytical.  This tool measures it: the sharded forward step runs at a
FIXED per-shard load (VL views per device) on 1/2/4/8 virtual CPU
devices; perfect weak scaling = flat step time as devices (and the
global view count V = VL * D) grow.  The gathered payloads — segments,
masks, and the five estimate tables (SCALING.md §2 table) — grow with
global V, so any comm/imbalance overhead shows as time growth vs D=1.

Each device count runs in its own subprocess (the XLA virtual-device
count is fixed at process start).  CPU collectives are memcpys, not ICI,
so the numbers bound the *structural* overhead (gather size growth,
sharding bookkeeping), not wire time; real-chip wire time is the
analytic payload/bandwidth row printed alongside.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_scaling.py
       [--per-shard 4] [--segs 1024] [--nbrs 6] [--devices 1,2,4,8]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def worker(n_dev: int, per_shard: int, S: int, N: int) -> None:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, REPO)
    import bench
    from line3dpp_tpu.parallel import sharded

    V = per_shard * n_dev
    args = bench.make_workload(V=V, S=S, N=N)
    mesh = sharded.make_mesh(n_dev)
    dargs = sharded.shard_inputs(mesh, *args)

    def bench_mode(comm):
        step = sharded.sharded_forward_step(mesh, knn=10, pair_chunk=N,
                                            comm=comm)

        def run():
            out = step(*dargs)
            # sync via scalar readback (relay-safe habit; harmless on CPU)
            return float(jnp.sum(out.score3d[0, :8, :8]))

        t0 = time.perf_counter()
        run()
        compile_s = time.perf_counter() - t0
        best = min(
            (lambda t: (run(), time.perf_counter() - t)[1])(
                time.perf_counter())
            for _ in range(3))
        return best * 1e3, compile_s

    step_ms, compile_s = bench_mode("gather")
    # identical shapes/FLOPs/host-contention, collectives replaced by
    # local tiles — the delta isolates gather cost
    tile_ms, _ = bench_mode("tile")

    # analytic per-step gather payload (SCALING.md §2): segments+mask+
    # 5 estimate tables + median depth, all O(global V)
    gather_mb = (V * S * (4 + 1) * 4            # segments f32 + mask (word)
                 + V * S * (3 + 3 + 1 + 1 + 1) * 4   # est P1,P2,d1,d2,valid
                 + V * 4) / 1e6
    print(json.dumps(dict(devices=n_dev, V=V, S=S, N=N,
                          step_ms=step_ms, nocomm_ms=tile_ms,
                          compile_s=compile_s,
                          gather_mb=round(gather_mb, 1))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--per-shard", type=int, default=4)
    ap.add_argument("--segs", type=int, default=1024)
    ap.add_argument("--nbrs", type=int, default=6)
    ap.add_argument("--devices", default="1,2,4,8")
    ap.add_argument("--worker", type=int, default=0)
    a = ap.parse_args()
    if a.worker:
        worker(a.worker, a.per_shard, a.segs, a.nbrs)
        return

    rows = []
    for d in [int(x) for x in a.devices.split(",")]:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(d),
             "--per-shard", str(a.per_shard), "--segs", str(a.segs),
             "--nbrs", str(a.nbrs)],
            capture_output=True, text=True, cwd=REPO,
            env=dict(os.environ, PYTHONPATH=f"/root/.axon_site:{REPO}"))
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"D={d} FAILED:\n{r.stdout}\n{r.stderr}", file=sys.stderr)
            sys.exit(1)
        rows.append(json.loads(line[-1]))
        print(line[-1], flush=True)

    base = rows[0]["step_ms"]
    print(f"\nweak scaling (fixed {a.per_shard} views/shard, "
          f"S={a.segs}, N={a.nbrs}; {os.cpu_count()} host cores — "
          "no-comm control shares the same core contention):")
    print(f"{'D':>3} {'V':>5} {'step ms':>9} {'no-comm':>9} "
          f"{'gather ms':>10} {'share':>6} {'eff':>6} {'MB':>7}")
    for r in rows:
        g = r["step_ms"] - r["nocomm_ms"]
        print(f"{r['devices']:>3} {r['V']:>5} {r['step_ms']:>9.1f} "
              f"{r['nocomm_ms']:>9.1f} {g:>10.1f} "
              f"{g / r['step_ms']:>6.1%} {base / r['step_ms']:>6.2f} "
              f"{r['gather_mb']:>7.1f}")


if __name__ == "__main__":
    main()
