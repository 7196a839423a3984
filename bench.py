"""Benchmark: GKR layer sumcheck at a 2^k-gate layer (default k=20, the
BASELINE.json north-star config) on the default JAX device.

Prints ONE JSON line.  Fields:
  metric / value / unit   : headline — fused device engine, gates/s at 2^k
                            (steady state: witness packed, circuit-static
                            wiring plans cached, as in production where one
                            circuit is proved for many instances)
  vs_baseline             : device rate / CppBackend rate.  The baseline is
                            the repo's own native C++ OpenMP engine
                            (gkr_tpu/native) measured in-process at 2^18
                            (size-linear algorithm), NOT the pure-Python
                            engine — the reference publishes no numbers
                            (BASELINE.md), and C++ is the strongest host
                            implementation available.
  cpp_gates_per_sec       : that baseline, recorded
  host_py_gates_per_sec   : pure-Python engine rate (measured at 2^12)
  sumcheck_rounds_per_sec : v = 2k rounds per layer / layer seconds
  fr_mle_evals_per_sec    : table-entry evaluation rate; one "eval" is one
                            Fr table entry consumed by a round evaluation
                            (phase 1: 4 tables, phase 2: 3; sizes halve)
  mont_mul_per_sec        : exact BN254 Montgomery muls/s inside the layer
                            (~7 per entry-eval incl. fold)
  kernel_peak_mul_per_sec : standalone Pallas mont_mul kernel rate at 2^20
                            (the compute speed-of-light for this limb ISA)
  sol_fraction            : mont_mul_per_sec / kernel_peak_mul_per_sec —
                            how close the full pipeline runs to its own
                            kernel peak (dispatch, hash, build overheads)
  breakdown_ms            : build1/build2/rounds+hash split, milliseconds

GKR_BENCH_K overrides k.  GKR_BENCH_EXTRA=1 adds a 2^16 config and a full
multi-layer prove; see BENCH_extra_r02.json for a recorded full sweep.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


def _enable_device_cache():
    import jax
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache-device")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def synth_layer(rng: random.Random, k: int, k_cur: int = 4):
    from gkr_tpu.field import P
    from gkr_tpu.mle import MleStruct

    n = 1 << k
    w_values = [rng.randrange(P) for _ in range(n)]
    add_gates = []
    mult_gates = []
    # n gates total spread across the 2^k_cur outputs, half add / half mult
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    struct = MleStruct(k, False, [True] * k, k)
    return z, w_values, add_gates, mult_gates, k_cur, struct


def run_host(k: int) -> float:
    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.sumcheck import prove_layer_sumcheck

    rng = random.Random(1)
    z, w, ag, mg, kc, struct = synth_layer(rng, k)
    t0 = time.time()
    prove_layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())
    return (len(ag) + len(mg)) / (time.time() - t0)


def run_cpp(k: int) -> float | None:
    from gkr_tpu.mimc import Mimc7

    try:
        from gkr_tpu.native.engine import CppBackend
        backend = CppBackend()
    except Exception:
        return None
    rng = random.Random(1)
    z, w, ag, mg, kc, struct = synth_layer(rng, k)
    backend.layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())  # warm
    t0 = time.time()
    backend.layer_sumcheck(z, w, ag, mg, kc, k, struct, Mimc7())
    return (len(ag) + len(mg)) / (time.time() - t0)


def run_device(k: int):
    import jax

    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.jaxeng import limbs as L
    from gkr_tpu.jaxeng import fused as F

    rng = random.Random(1)
    z, w, ag, mg, kc, struct = synth_layer(rng, k)
    n = 1 << k
    w_dev = L.pack(w)
    w_dev.block_until_ready()
    wiring = F.build_wiring(ag, mg, n)
    jax.block_until_ready(wiring)

    def one():
        return F.prove_layer_sumcheck_fused(z, w, ag, mg, kc, k, struct,
                                            Mimc7(), w_dev=w_dev,
                                            wiring=wiring)

    one()                                    # warmup: compiles
    best = None
    for _ in range(3):
        t0 = time.time()
        one()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best

    # breakdown: builds timed standalone; rounds+hash = remainder
    use_pallas = F._pallas_platform()
    pallas_build = use_pallas and n >= F.PALLAS_MIN
    z_dev = L.pack(z)
    na, nm = len(ag), len(mg)

    def tt(fn, reps=3):
        r = fn()
        jax.block_until_ready(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        jax.block_until_ready(r)
        return (time.time() - t0) / reps

    b1 = tt(lambda: F._build_phase1(w_dev, z_dev, wiring, (na, nm), n,
                                    pallas_build))
    S1, eqz = F._build_phase1(w_dev, z_dev, wiring, (na, nm), n,
                              pallas_build)
    import jax.numpy as jnp
    from gkr_tpu.field import P as _P
    b_star = jnp.stack([L.pack_scalar(rng.randrange(_P)) for _ in range(k)])
    wb = L.pack_scalar(rng.randrange(_P))
    b2 = tt(lambda: F._build_phase2(w_dev, b_star, wb, eqz, wiring,
                                    (na, nm), n, pallas_build))

    # standalone Pallas mont_mul peak (compute speed-of-light proxy)
    peak = None
    if use_pallas:
        from gkr_tpu.jaxeng import pallas_kernels as PK
        a_t = L.jnormalize(jax.random.randint(
            jax.random.PRNGKey(0), (n, 16), 0, 1 << 15,
            dtype=jnp.int32).astype(jnp.uint32)).T  # (16, n) kernel layout
        dt_m = tt(lambda: PK.pl_mont_mul_T(a_t, a_t))
        peak = n / dt_m

    return best, b1, b2, peak


def main() -> int:
    _enable_device_cache()
    k = int(os.environ.get("GKR_BENCH_K", "20"))
    host_k = int(os.environ.get("GKR_BENCH_HOST_K", "12"))
    cpp_k = int(os.environ.get("GKR_BENCH_CPP_K", "18"))
    n = 1 << k
    v = 2 * k
    out = {"metric": f"gkr_layer_sumcheck_2e{k}_gates_per_sec",
           "unit": "gates/s"}
    try:
        dt, b1, b2, peak = run_device(k)
    except Exception as e:  # pragma: no cover
        out.update({"value": 0, "vs_baseline": 0, "error": str(e)})
        print(json.dumps(out))
        return 1
    device_rate = n / dt
    cpp_rate = run_cpp(cpp_k)
    host_rate = run_host(host_k)
    baseline = cpp_rate if cpp_rate else host_rate

    # per-layer work accounting (see docstring for definitions)
    entries = 0
    for phase_tables in (4, 3):
        m = n
        while m >= 2:
            entries += m * phase_tables
            m //= 2
    mont_muls = 0
    m = n
    while m >= 2:
        # phase1 eval: 1 mul per entry per t in {0,1,2} on the half table
        # -> 1.5m; fold: 4 tables * m/2 = 2m.  phase2: 2 muls per entry per
        # t -> 3m; fold 1.5m.  (interp/hash negligible per entry)
        mont_muls += int(3.5 * m) + int(4.5 * m)
        m //= 2

    out.update({
        "value": round(device_rate, 1),
        "vs_baseline": round(device_rate / baseline, 2),
        "cpp_gates_per_sec": round(cpp_rate, 1) if cpp_rate else None,
        "cpp_measured_at": f"2^{cpp_k}",
        "host_py_gates_per_sec": round(host_rate, 1),
        "layer_ms": round(dt * 1000, 1),
        "sumcheck_rounds_per_sec": round(v / dt, 1),
        "fr_mle_evals_per_sec": round(entries / dt, 1),
        "mont_mul_per_sec": round(mont_muls / dt, 1),
        "kernel_peak_mul_per_sec": round(peak, 1) if peak else None,
        "sol_fraction": (round(mont_muls / dt / peak, 3) if peak else None),
        "breakdown_ms": {"build_phase1": round(b1 * 1000, 1),
                         "build_phase2": round(b2 * 1000, 1),
                         "rounds_and_hash": round((dt - b1 - b2) * 1000, 1)},
    })
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
