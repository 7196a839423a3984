"""Benchmark: one full GKR layer sumcheck at a 2^k-gate layer (default
k=20, the BASELINE.json north-star config) on the default JAX device.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "gates/s", "vs_baseline": N}

`vs_baseline` compares against the exact host engine's measured rate (the
reference publishes no numbers — BASELINE.md — so the host big-int engine,
which is algorithmically the reference's linear-time equivalent, is the
recorded baseline; its rate is measured at a smaller k and is size-linear).
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

from gkr_tpu.field import P
from gkr_tpu.mimc import Mimc7
from gkr_tpu.mle import MleStruct
from gkr_tpu.sumcheck import prove_layer_sumcheck


def synth_layer(rng: random.Random, k: int, k_cur: int = 4):
    n = 1 << k
    w_values = [rng.randrange(P) for _ in range(n)]
    add_gates = []
    mult_gates = []
    # n gates total, spread across the 2^k_cur outputs (a dense 2^k-gate
    # layer, half add / half mult)
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    # random tables are structurally full-support
    struct = MleStruct(k, False, [True] * k, k)
    return z, w_values, add_gates, mult_gates, k_cur, struct


def run_host(k: int) -> float:
    rng = random.Random(1)
    z, w, ag, mg, kc, struct = synth_layer(rng, k)
    t0 = time.time()
    prove_layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())
    dt = time.time() - t0
    return (len(ag) + len(mg)) / dt


def run_device(k: int) -> float:
    from gkr_tpu.jaxeng.sumcheck import prove_layer_sumcheck_jax
    from gkr_tpu.jaxeng import limbs as L
    rng = random.Random(1)
    z, w, ag, mg, kc, struct = synth_layer(rng, k)
    w_dev = L.pack(w)
    # warmup: compile all per-shape programs
    prove_layer_sumcheck_jax(z, w, ag, mg, kc, k, struct, Mimc7(),
                             w_dev=w_dev)
    t0 = time.time()
    prove_layer_sumcheck_jax(z, w, ag, mg, kc, k, struct, Mimc7(),
                             w_dev=w_dev)
    dt = time.time() - t0
    return (len(ag) + len(mg)) / dt


def main() -> int:
    k = int(os.environ.get("GKR_BENCH_K", "20"))
    host_k = int(os.environ.get("GKR_BENCH_HOST_K", "13"))
    try:
        device_rate = run_device(k)
    except Exception as e:  # pragma: no cover
        print(json.dumps({"metric": f"gkr_layer_sumcheck_2e{k}",
                          "value": 0, "unit": "gates/s",
                          "vs_baseline": 0, "error": str(e)}))
        return 1
    host_rate = run_host(host_k)
    print(json.dumps({
        "metric": f"gkr_layer_sumcheck_2e{k}_gates_per_sec",
        "value": round(device_rate, 1),
        "unit": "gates/s",
        "vs_baseline": round(device_rate / host_rate, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
