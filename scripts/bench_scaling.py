"""Sharded-engine scaling efficiency at fixed global size (strong scaling).

Measures the ShardedSumcheck layer prove wall-clock at D = 1, 2, 4, 8 on a
virtual CPU mesh (xla_force_host_platform_device_count) at one fixed global
table size, and reports efficiency(D) = t(1) / (D * t(D)) — the round-1/2
"done" criterion from BASELINE.md (>= 80% target).  This is the
communication-scaling measurement: the per-round psum + the sharded builds
vs. perfectly-parallel local folds.  The reference parallelism this
replaces is the rayon hot loop (rust/src/gkr/sumcheck.rs:50-63).

A CPU mesh measures SCALING (collective/communication overhead at fixed
work), not absolute TPU throughput; the absolute anchor is bench.py on the
real chip.  Results are recorded in SCALING_r03.json.

Usage:
    python scripts/bench_scaling.py [k] [reps]   (defaults k=14, reps=3)
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if "cpu" not in jax.config.jax_platforms.split(",")[0]:
    jax.config.update("jax_platforms", "cpu")


def synth(k: int, k_cur: int = 4):
    from gkr_tpu.field import P
    from gkr_tpu.mle import MleStruct

    rng = random.Random(1)
    n = 1 << k
    w = [rng.randrange(P) for _ in range(n)]
    add_gates, mult_gates = [], []
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    struct = MleStruct(k, False, [True] * k, k)
    return z, w, add_gates, mult_gates, k_cur, struct


def time_sharded(D: int, k: int, reps: int) -> tuple[float, list]:
    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.parallel.sharding import ShardedSumcheck, make_mesh

    z, w, ag, mg, kc, struct = synth(k)
    mesh = make_mesh(D)
    eng = ShardedSumcheck(mesh)

    def one():
        return eng.prove_layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())

    proof = one()                      # warmup: compiles
    best = None
    for _ in range(reps):
        t0 = time.time()
        one()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    return best, proof[0]


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n = 1 << k
    results = {}
    ref_coeffs = None
    for D in (1, 2, 4, 8):
        dt, first = time_sharded(D, k, reps)
        if ref_coeffs is None:
            ref_coeffs = first
        else:
            assert first == ref_coeffs, f"transcript diverged at D={D}"
        results[D] = dt
        print(f"D={D}: {dt * 1000:8.1f} ms  {n / dt:12,.0f} gates/s",
              flush=True)
    t1 = results[1]
    out = {
        "metric": f"sharded_layer_sumcheck_strong_scaling_2e{k}",
        "platform": "cpu-mesh (virtual, xla_force_host_platform_device_count)",
        # virtual devices are threads on the SAME physical cores: measured
        # efficiency is a floor once D exceeds the core count (collective
        # overhead is real, the parallel speedup is capped by the host)
        "host_physical_cpus": os.cpu_count(),
        "global_gates": n,
        "wall_ms": {str(D): round(t * 1000, 1) for D, t in results.items()},
        "speedup": {str(D): round(t1 / t, 2) for D, t in results.items()},
        "efficiency": {str(D): round(t1 / (D * t), 3)
                       for D, t in results.items()},
        "transcript_identical_across_D": True,
    }
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
