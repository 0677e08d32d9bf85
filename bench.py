"""Benchmark: COLD end-to-end reconstruction throughput on the bundled
testdata — detection (TPU LSD, no segment cache) + matching + scoring +
filtering + affinity + clustering/fit/sweep, i.e. every phase a user pays
for on first contact with a dataset (the round-1 bench excluded detection,
which then dominated cold runs at 10.6 s/image; VERDICT round-1 item 1).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Falls back to the synthetic device-step workload when the reference
testdata images are not mounted.

Baseline: the reference publishes no numbers (BASELINE.md) and cannot be
built in this image (no Eigen/Boost, zero egress).  The stand-in is a
MEASURED number since round 4: this framework's identical math executed
END-TO-END on the host CPU (XLA CPU backend, tools/bench_cpu_baseline.py)
— LSD detect + match + score + affinity + cluster/fit/sweep on the same
26 images, no segment caches, best of 2 passes after a compile warmup =
0.0568 images/s (458 s, 4-core host, 2026-08-19).  The rounds 1-3
estimate was 0.1 img/s (phase-2-only corroboration: 217 s = 0.12 img/s);
the full-pipeline measurement replaces it (VERDICT r3 item 4).
A round-5 re-measurement of the updated code gave 0.0527 img/s under
partial host contention; the HIGHER (harder) 2026-08-19 number is kept
as the divisor.  vs_baseline = images_per_sec / 0.0568.
"""

import json
import time

import numpy as np

BASELINE_IMAGES_PER_SEC = 0.0568  # measured; tools/bench_cpu_baseline.py


def make_workload(V=26, S=3000, N=10, seed=0):
    import line3dpp_tpu as l3d
    from line3dpp_tpu.camera import (
        CameraBatch, fundamental_matrix, median_center_translation,
        rotation_from_rpy,
    )

    rng = np.random.default_rng(seed)
    n_lines = 800
    P = rng.uniform([-4, -3, 8], [4, 3, 16], size=(n_lines, 3))
    d = rng.normal(size=(n_lines, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    Q = P + d * rng.uniform(0.5, 2.0, size=(n_lines, 1))

    K = np.array([[2400.0, 0, 1536], [0, 2400.0, 1152], [0, 0, 1]])
    cams = []
    for i in range(V):
        R = rotation_from_rpy(rng.normal() * 0.03, -0.02 * i + 0.2,
                              rng.normal() * 0.03)
        C = np.array([0.35 * i - 4.5, rng.normal() * 0.1, rng.normal() * 0.1])
        cams.append(l3d.Camera(K, R, -R @ C, 3072, 2304))

    segs = np.zeros((V, S, 4), np.float32)
    mask = np.zeros((V, S), bool)
    for i, cam in enumerate(cams):
        sv = np.hstack([cam.project(P), cam.project(Q)]).astype(np.float32)
        # fill remaining slots with clutter segments (realistic full load)
        n_fill = S - len(sv)
        a = rng.uniform([0, 0], [3072, 2304], size=(n_fill, 2))
        ang = rng.uniform(0, 2 * np.pi, n_fill)
        ln = rng.uniform(20, 300, n_fill)
        b = a + np.stack([np.cos(ang), np.sin(ang)], -1) * ln[:, None]
        segs[i] = np.vstack([sv, np.hstack([a, b])])
        mask[i] = True

    translation = median_center_translation(cams)
    cb = CameraBatch.from_cameras(cams, sigma_p=2.5, translation=translation)
    centered = [l3d.Camera(c.K, c.R, -c.R @ (c.C - translation),
                           c.width, c.height) for c in cams]

    neighbor_ids = np.zeros((V, N), np.int32)
    pair_valid = np.zeros((V, N), bool)
    F = np.zeros((V, N, 3, 3), np.float32)
    for i in range(V):
        nbrs = sorted((j for j in range(V) if j != i),
                      key=lambda j: np.linalg.norm(cams[i].C - cams[j].C))
        for g, j in enumerate(nbrs[:N]):
            neighbor_ids[i, g] = j
            pair_valid[i, g] = True
            F[i, g] = fundamental_matrix(centered[i], centered[j])

    return (segs, mask, cb.RtKinv.astype(np.float32), cb.C.astype(np.float32),
            cb.k_reg.astype(np.float32), neighbor_ids, F, pair_valid)


IMG_DIR = "/root/reference/testdata"
CAMS = "testdata/cameras_testdata.json"


def run_testdata_e2e():
    """One full cold pipeline pass over the 26 testdata images; returns
    (images, wall_seconds).  Compile caches are warm after the first call;
    segment caches are intentionally NOT used."""
    import json as _json
    import os

    import line3dpp_tpu as l3d
    from PIL import Image

    cams = _json.load(open(os.path.join(os.path.dirname(__file__), CAMS)))
    cfg = l3d.Config(optimize=False, load_segments=False)
    pipe = l3d.Line3D(cfg)
    t0 = time.perf_counter()
    items = []
    for cam_id in sorted(cams, key=int):
        c = cams[cam_id]
        cam = l3d.Camera(np.array(c["K"]), np.array(c["R"]),
                         np.array(c["t"]), c["width"], c["height"])
        img = np.asarray(
            Image.open(os.path.join(IMG_DIR, c["image"])).convert("L"))
        items.append((int(cam_id), cam, img))
    # pipelined detection: image i+1's device program is submitted before
    # image i's results are read back (ops/lsd.detect_batch)
    pipe.add_images(items)
    pipe.match_images()
    lines = pipe.reconstruct_3d_lines()
    dt = time.perf_counter() - t0
    assert len(lines) > 500, f"implausible reconstruction: {len(lines)} lines"
    return len(cams), dt


_LAST = "/root/repo/.bench_last.json"


def _relay_alive(timeout_s: float = 90.0) -> bool:
    """The axon TPU relay can be fully down (connection-refused / hanging
    jax.devices) for an hour or more; probe a tiny op in a subprocess so
    the bench fails FAST instead of hanging the driver."""
    import subprocess
    import sys

    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.ones((8, 128)))))")
    try:
        r = subprocess.run([sys.executable, "-c", code],
                           timeout=timeout_s, capture_output=True)
        return r.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    import os

    if not _relay_alive():
        # emit the last successful measurement, clearly labeled — the
        # relay being down says nothing about the framework's speed
        if os.path.exists(_LAST):
            last = json.load(open(_LAST))
            last["unit"] += " [CACHED RESULT: TPU relay unreachable at bench time]"
            print(json.dumps(last))
            return
        print(json.dumps({"metric": "cold_e2e_images_per_sec", "value": 0.0,
                          "unit": "TPU relay unreachable and no cached result",
                          "vs_baseline": 0.0}))
        return

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if os.path.isdir(IMG_DIR):
        n, dt0 = run_testdata_e2e()      # warmup: compiles everything
        _, dt1 = run_testdata_e2e()
        _, dt2 = run_testdata_e2e()      # best-of-3: the relay is
        dt = min(dt0, dt1, dt2)          # multi-tenant, variance is high
        ips = n / dt
        result = {
            "metric": "cold_e2e_images_per_sec",
            "value": round(ips, 3),
            "unit": ("images/s cold end-to-end (26x 3072x2304: TPU LSD "
                     "detect + match + score + affinity + cluster/fit/"
                     "sweep; no caches)"),
            "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
        }
        json.dump(result, open(_LAST, "w"))
        print(json.dumps(result))
        return

    device_step_bench()


def device_step_bench():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    import jax.numpy as jnp

    from line3dpp_tpu.models.step import forward_step

    V, S, N, K = 26, 3000, 10, 10
    host_args = make_workload(V=V, S=S, N=N)
    args = tuple(jnp.asarray(a) for a in host_args)

    static = dict(
        epipolar_overlap=0.25, knn=K, two_sig_a_sqr=200.0,
        min_similarity=0.5, check_orientation=True, min_best_score=0.75,
        min_best_score_perc=0.10, min_affinity=0.5, pair_chunk=8,
        use_pallas_matching=jax.default_backend() == "tpu",
        use_pallas_scoring=jax.default_backend() == "tpu",
    )

    # NOTE: on the axon TPU relay, jax.block_until_ready does NOT wait for
    # execution — only a host readback forces completion.  Sync by reading a
    # device-reduced scalar (4 bytes) so timing measures compute, not a
    # 30 MB tensor transfer.
    def run_synced():
        out = forward_step(*args, **static)
        return float(jnp.sum(out.score3d) + jnp.sum(out.aff_weight))

    run_synced()  # warmup / compile

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_synced()
        times.append(time.perf_counter() - t0)

    dt = min(times)
    ips = V / dt
    print(json.dumps({
        "metric": "device_step_images_per_sec",
        "value": round(ips, 3),
        "unit": "images/s (26 views x 3000 segs x 10 nbrs, matching+scoring+affinity)",
        "vs_baseline": round(ips / BASELINE_IMAGES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
