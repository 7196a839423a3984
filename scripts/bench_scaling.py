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
real chip.  The recorded sweep is committed as SCALING_r04.json at the
repo root.

Protocol (the round-3 sweep never finished: 4 mesh sizes x fresh shard_map
compiles exceeded this host's XLA:CPU compile budget): each D point runs in
its OWN subprocess over a shared persistent compile cache
(GKR_TPU_JAX_CACHE) — the first sweep pays each compile once, re-runs hit
the cache; the per-phase lax.scan round program (ShardedSumcheck._scan)
bounds the program inventory at ~7 per D.

Usage:
    python scripts/bench_scaling.py [k] [reps] [D,D,...]  (defaults 12 2 1,2,4,8)
"""

from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import random
import subprocess
import sys
import time


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


def child(D: int, k: int, reps: int) -> int:
    """One D point, in-process (invoked as a subprocess by main)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import gkr_tpu.jaxeng  # noqa: F401  (persistent compile cache)
    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.parallel.sharding import ShardedSumcheck, make_mesh

    z, w, ag, mg, kc, struct = synth(k)
    mesh = make_mesh(D)
    eng = ShardedSumcheck(mesh)

    def one():
        return eng.prove_layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())

    t0 = time.time()
    proof, _ = one()                   # warmup: compiles (or cache hits)
    warm_s = time.time() - t0
    best = None
    for _ in range(reps):
        t0 = time.time()
        one()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"D": D, "best_s": best, "warm_s": round(warm_s, 1),
                      "round1_coeffs": proof[0]}), flush=True)
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--child"]
    if "--child" in sys.argv[1:]:
        return child(int(args[0]), int(args[1]), int(args[2]))
    k = int(args[0]) if len(args) > 0 else 12
    reps = int(args[1]) if len(args) > 1 else 2
    ds = ([int(x) for x in args[2].split(",")] if len(args) > 2
          else [1, 2, 4, 8])
    n = 1 << k
    results, ref_coeffs = {}, None
    for D in ds:
        t0 = time.time()
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             str(D), str(k), str(reps)],
            capture_output=True, text=True)
        if out.returncode != 0:
            print(out.stdout + out.stderr, file=sys.stderr)
            raise RuntimeError(f"child D={D} failed")
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        if ref_coeffs is None:
            ref_coeffs = rec["round1_coeffs"]
        else:
            assert rec["round1_coeffs"] == ref_coeffs, \
                f"transcript diverged at D={D}"
        results[D] = rec["best_s"]
        print(f"D={D}: {rec['best_s'] * 1000:8.1f} ms "
              f"{n / rec['best_s']:12,.0f} gates/s "
              f"(child total {time.time() - t0:.0f}s, warm "
              f"{rec['warm_s']}s)", file=sys.stderr, flush=True)
    t1 = results[ds[0]] * ds[0]        # normalize if sweep starts above D=1
    out = {
        "metric": f"sharded_layer_sumcheck_strong_scaling_2e{k}",
        "platform": "cpu-mesh (virtual, xla_force_host_platform_device_count)",
        # virtual devices are threads on the SAME physical cores: measured
        # efficiency is a floor once D exceeds the core count (collective
        # overhead is real, the parallel speedup is capped by the host)
        "host_physical_cpus": os.cpu_count(),
        "global_gates": n,
        "reps": reps,
        "wall_ms": {str(D): round(t * 1000, 1) for D, t in results.items()},
        "speedup": {str(D): round(t1 / t, 2) for D, t in results.items()},
        "efficiency": {str(D): round(t1 / (D * t), 3)
                       for D, t in results.items()},
        "transcript_identical_across_D": True,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"recorded to {path}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
