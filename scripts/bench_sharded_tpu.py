"""Sharded-engine vs fused-engine wall-clock on the real TPU chip.

Runs the SAME 2^k-gate layer sumcheck through (a) the fused single-chip
engine and (b) the ShardedSumcheck engine on a 1-device mesh with the
Pallas kernel path (use_pallas auto-detects TPU).  Transcripts must be
identical; the ratio quantifies the sharding overhead (shard_map dispatch,
in-trace sort plans instead of the host-cached wiring, psum over a
singleton axis) that a multi-chip deployment pays per chip.

Usage:
  PYTHONPATH=/root/.axon_site:/root/repo timeout 1700 python -u \
      scripts/bench_sharded_tpu.py [k]
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
import sys
import time

import jax

# persistent compile cache: configured by gkr_tpu.jaxeng at import
# (GKR_TPU_JAX_CACHE, default ~/.cache/gkr_tpu_jax)

from gkr_tpu.field import P  # noqa: E402
from gkr_tpu.mimc import Mimc7  # noqa: E402
from gkr_tpu.mle import MleStruct  # noqa: E402
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
from gkr_tpu.jaxeng.fused import (build_wiring,  # noqa: E402
                                  prove_layer_sumcheck_fused)
from gkr_tpu.parallel.sharding import ShardedSumcheck, make_mesh  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    n = 1 << k
    k_cur = 4
    rng = random.Random(1)
    w = [rng.randrange(P) for _ in range(n)]
    add_gates, mult_gates = [], []
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    struct = MleStruct(k, False, [True] * k, k)
    print("device:", jax.devices()[0], "k:", k, flush=True)

    w_dev = L.pack(w)
    w_dev.block_until_ready()
    wiring = build_wiring(add_gates, mult_gates, n)
    jax.block_until_ready(wiring)

    def fused():
        return prove_layer_sumcheck_fused(z, w, add_gates, mult_gates,
                                          k_cur, k, struct, Mimc7(),
                                          w_dev=w_dev, wiring=wiring)

    mesh = make_mesh(1)
    eng = ShardedSumcheck(mesh)
    print("sharded use_pallas:", eng.use_pallas, flush=True)

    def sharded():
        return eng.prove_layer_sumcheck(z, w, add_gates, mult_gates,
                                        k_cur, k, struct, Mimc7(),
                                        w_dev=w_dev)

    t0 = time.time()
    pf = fused()
    print(f"fused warmup: {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    ps = sharded()
    print(f"sharded warmup: {time.time() - t0:.1f}s", flush=True)
    assert pf == ps, "fused/sharded transcript mismatch"

    def best_of(fn, reps=3):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    tf = best_of(fused)
    ts = best_of(sharded)
    out = {
        "metric": f"sharded_vs_fused_single_tpu_2e{k}",
        "fused_ms": round(tf * 1000, 1),
        "sharded_ms": round(ts * 1000, 1),
        "sharded_gates_per_sec": round(n / ts, 1),
        "fused_gates_per_sec": round(n / tf, 1),
        "sharded_over_fused": round(ts / tf, 2),
        "use_pallas": eng.use_pallas,
        "transcript_identical": True,
    }
    print(json.dumps(out))
    name = os.environ.get("GKR_SHARDED_OUT", "SHARDED_TPU_r05.json")
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), name)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"recorded to {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
