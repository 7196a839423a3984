"""Time the device-resident fused layer sumcheck on the real TPU.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/bench_fused.py [k]
"""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    use_pallas = os.environ.get("NO_PALLAS", "") == ""
    n = 1 << k
    k_cur = 4
    rng = random.Random(1)
    print("device:", jax.devices()[0], "k:", k, "pallas:", use_pallas,
          flush=True)

    t0 = time.time()
    w = [rng.randrange(P) for _ in range(n)]
    add_gates = []
    mult_gates = []
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    struct = MleStruct(k, False, [True] * k, k)
    print(f"synth: {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    w_dev = L.pack(w)
    w_dev.block_until_ready()
    print(f"pack w (host codec + upload): {time.time()-t0:.1f}s", flush=True)

    t0 = time.time()
    wiring = build_wiring(add_gates, mult_gates, n)
    jax.block_until_ready(wiring)
    print(f"build_wiring (once per circuit): {time.time()-t0:.1f}s",
          flush=True)

    t0 = time.time()
    prove_layer_sumcheck_fused(z, w, add_gates, mult_gates, k_cur, k,
                               struct, Mimc7(), w_dev=w_dev,
                               use_pallas=use_pallas, wiring=wiring)
    print(f"warmup (compiles): {time.time()-t0:.1f}s", flush=True)

    for rep in range(3):
        t0 = time.time()
        prove_layer_sumcheck_fused(z, w, add_gates, mult_gates, k_cur, k,
                                   struct, Mimc7(), w_dev=w_dev,
                                   use_pallas=use_pallas, wiring=wiring)
        dt = time.time() - t0
        print(f"run {rep}: {dt*1000:.0f} ms -> {n/dt:,.0f} gates/s",
              flush=True)


if __name__ == "__main__":
    main()
