"""Multi-process (multi-host) execution of the view-sharded forward step.

This is SCALING.md's jax.distributed recipe as executable code: every
process calls ``jax.distributed.initialize`` against a shared coordinator,
the 1-D ``("views",)`` mesh spans the GLOBAL device set, per-process hosts
provide only their addressable shards (``jax.make_array_from_callback``),
and the collectives inside ``parallel/sharded.py`` ride the cross-process
transport (ICI/DCN on real pods; TCP on the CPU test harness).

Each process prints the same global checksum of the step outputs —
``tests/test_multihost.py`` launches two CPU processes and compares the
checksums against a single-process run of the identical scene.

Usage (per process)::

    python tools/run_multihost.py --coordinator=HOST:PORT \
        --num_processes=2 --process_id=K [--cpu N] [--views V]

Reference: the upstream has no distributed mode at all (SURVEY.md §2.3);
this replaces its single-GPU scaling ceiling.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num_processes", type=int, required=True)
    ap.add_argument("--process_id", type=int, required=True)
    ap.add_argument("--cpu", type=int, default=0,
                    help="force CPU backend with this many local devices")
    ap.add_argument("--views", type=int, default=8)
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_num_cpu_devices", args.cpu)
        jax.config.update("jax_platforms", "cpu")

    jax.distributed.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    sys.path.insert(0, __file__.rsplit("/", 2)[0])
    from __graft_entry__ import _STATIC, _example_inputs
    from line3dpp_tpu.parallel import sharded

    n_dev = len(jax.devices())
    pid = jax.process_index()
    print(f"[mh] process {pid}/{args.num_processes}: "
          f"{jax.local_device_count()} local / {n_dev} global devices",
          flush=True)

    mesh = Mesh(np.array(jax.devices()), (sharded.AXIS,))
    fn = sharded.sharded_forward_step(mesh, **_STATIC)

    V = args.views
    if V % n_dev:
        raise SystemExit(f"views={V} not divisible by {n_dev} devices")
    host_args = _example_inputs(V=V, S=16, N=2)   # same seed on every host

    shard = NamedSharding(mesh, P(sharded.AXIS))
    repl = NamedSharding(mesh, P())
    shardings = (shard, shard, repl, repl, repl, shard, shard, shard)

    def place(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(
            x.shape, s, lambda idx: x[idx])

    placed = tuple(place(x, s) for x, s in zip(host_args, shardings))
    out = fn(*placed)

    # global reductions -> replicated scalars every process can print
    n_est = int(jnp.sum(out.est_valid.astype(jnp.int32)))
    n_edges = int(jnp.sum(out.aff_valid.astype(jnp.int32)))
    w_sum = float(jnp.sum(out.aff_weight))
    print(f"[mh] process {pid}: checksum est={n_est} edges={n_edges} "
          f"wsum={w_sum:.6f}", flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
