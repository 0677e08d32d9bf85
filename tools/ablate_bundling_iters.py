"""Bundling LM iteration-count convergence ablation (PARITY.md row 17).

The reference caps Ceres at 250 iterations (commons.h:88) but stops early on
convergence; our batched LM is a fixed-length ``lax.scan`` that pays for
every iteration, so `optimize_cluster_lines` clamps to
``min(max_iter_optim, 50)``.  This tool justifies (or refutes) that clamp
with data: it captures the REAL testdata LM problem (all clusters entering
bundling in the golden e2e run), then reruns the solver at several iteration
counts and reports the total robustified cost and the parameter drift vs the
250-iteration reference solution.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/ablate_bundling_iters.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from line3dpp_tpu.ops import bundling


def capture_testdata_problem():
    """Run the golden e2e (CPU, cached segments, --optimize) capturing the
    LM inputs the pipeline assembles for bundling."""
    cap: dict = {}
    orig = bundling.optimize_cluster_lines

    def wrapper(lineP1, lineP2, mc, mv, ms, C, st, config, **kw):
        return orig(lineP1, lineP2, mc, mv, ms, C, st, config,
                    _capture=cap, **kw)

    bundling.optimize_cluster_lines = wrapper
    try:
        sys.argv = [sys.argv[0], "--cpu", "--optimize"]
        import run_testdata

        run_testdata.main()
    finally:
        bundling.optimize_cluster_lines = orig
    return cap


def main():
    sys.path.insert(0, os.path.dirname(__file__))
    cap = capture_testdata_problem()
    C, Cpad = cap["C"], cap["Cpad"]
    args = (jnp.asarray(cap["obs_cluster"]), jnp.asarray(cap["Ko"]),
            jnp.asarray(cap["Ro"]), jnp.asarray(cap["to"]),
            jnp.asarray(cap["p1h"]), jnp.asarray(cap["p2h"]),
            jnp.asarray(cap["d2"]))
    p0 = jnp.asarray(cap["params0"])

    print(f"\ncaptured LM problem: C={C} clusters (padded {Cpad}), "
          f"O={len(cap['obs_cluster']) } observations")
    cost0 = np.asarray(bundling.lm_cost(p0, *args, num_clusters=Cpad))[:C]
    print(f"initial cost: {cost0.sum():.6f}")

    sweeps = [10, 25, 50, 100, 250]
    results = {}
    for it in sweeps:
        p = bundling.lm_optimize(p0, *args, num_clusters=Cpad, iterations=it)
        cost = np.asarray(bundling.lm_cost(p, *args, num_clusters=Cpad))[:C]
        results[it] = (np.asarray(p)[:C], cost)

    p_ref, cost_ref = results[250]
    print(f"\n{'iters':>6} {'total_cost':>14} {'vs_250':>12} "
          f"{'max_param_drift':>16} {'clusters>1e-6':>14}")
    for it in sweeps:
        p, cost = results[it]
        drift = np.abs(p - p_ref).max()
        worse = int((cost - cost_ref > 1e-6).sum())
        print(f"{it:>6} {cost.sum():>14.6f} "
              f"{cost.sum() - cost_ref.sum():>+12.3e} {drift:>16.3e} "
              f"{worse:>14}")
    print("\n(PARITY.md row 17: clamp justified iff 50-iter total cost is "
          "within ~1e-4 of 250-iter and drift is negligible)")


if __name__ == "__main__":
    main()
