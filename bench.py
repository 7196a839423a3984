"""Benchmark: GKR layer sumcheck at a 2^k-gate layer (default k=20, the
BASELINE.json north-star config) on the default JAX device.

Prints ONE JSON line.  Fields:
  metric / value / unit   : headline — fused device engine, gates/s at 2^k
                            (steady state: witness packed, circuit-static
                            wiring plans cached, as in production where one
                            circuit is proved for many instances)
  vs_baseline             : device rate / CppBackend rate.  The baseline is
                            the repo's own native C++ OpenMP engine
                            (gkr_tpu/native) measured in-process at the
                            SAME layer size as the headline, NOT the
                            pure-Python engine — the reference publishes no
                            numbers (BASELINE.md), and C++ is the strongest
                            host implementation available.
  cpp_gates_per_sec       : that baseline, recorded
  host_py_gates_per_sec   : pure-Python engine rate (measured at 2^12)
  pipelined_gates_per_sec : steady-state serving throughput — a batch of
                            instances of one circuit proved back-to-back
                            with ONE device->host sync for the batch
                            (the per-layer sync the isolated headline
                            pays is ~25 ms through the tunneled host);
                            pipelined_layer_ms is the per-layer amortized
                            wall-clock
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
  roofline                : HARDWARE anchor (not self-referential):
                            hbm_min_ms   = analytic minimum HBM bytes/layer
                                           at the chip's pin bandwidth,
                            vpu_min_ms   = u32 VPU ops/layer at the chip's
                                           MEASURED elementwise u32 peak
                                           (in-VMEM Pallas microbench),
                            chip_min_ms  = max of the two (the binding one),
                            sol_vs_chip  = chip_min_ms / layer_ms
  breakdown_ms            : build1/build2/rounds+hash split, milliseconds

GKR_BENCH_K overrides k.  GKR_BENCH_EXTRA=1 additionally runs a 2^16-layer
config, the 2^24 scaling config (GKR_BENCH_TOPK overrides; 0 skips), a
FULL multi-layer prove (layer walk + mle_struct + restrict_to_line +
sparse_from_dense + full-strength host verify), and the native 3-round
mimc aggregation end-to-end (GKR_BENCH_AGG=0 skips), emitted under
"extra" in the same JSON line.  Recorded sweeps live at the repo root as
BENCH_extra_r<N>.json; see git log for the round each was taken in.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time


def _enable_device_cache():
    # gkr_tpu.jaxeng configures the persistent compilation cache
    # (GKR_TPU_JAX_CACHE, default ~/.cache/gkr_tpu_jax) at import; importing
    # it here makes the cache active before any compile.
    import gkr_tpu.jaxeng  # noqa: F401


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


# ---------------------------------------------------------------- roofline
#
# Chip constants for the roofline anchor.  HBM pin bandwidth per chip from
# the public spec (TPU v5e: 819 GB/s; jax-ml.github.io/scaling-book).  The
# VPU u32 throughput is NOT taken from a spec — elementwise u32 multiply is
# partially emulated by Mosaic — so it is MEASURED in-VMEM on this chip by
# _measure_vpu_peak and the measured number is recorded in the output.
HBM_GBPS = {"TPU v5": 819.0, "TPU v5 lite": 819.0, "TPU v4": 1228.0,
            "TPU v6": 1640.0}

# u32 VPU ops in one 16x16-limb Montgomery multiply (pallas_kernels.py):
#   _mul_cols: 256 muls + 256 masks + 256 shifts + 512 adds        = 1280
#   _redc_cols: 16*(3 muls + ...) + 15*16*(1 mul + 2 ops + 2 adds) ~ 1500
#   _norm_rows: carry chain 16*(2 adds + mask + shift) + cond-sub   ~  160
OPS_PER_MONT_MUL = 2940


def _measure_vpu_peak():
    """Measured elementwise u32 multiply rate (Gop/s) inside a VMEM kernel
    — the silicon anchor for vpu_min_ms.

    Measured as a MARGINAL rate between a shallow and a deep multiply
    chain (8 independent accumulators for ILP): through the tunneled
    device every forced sync pays a ~23 ms round-trip floor and
    `block_until_ready` alone does not actually block (axon), so an
    absolute wall-clock rate under-reads by orders of magnitude.  The
    difference between the two depths cancels the fixed sync cost.
    Completion is forced by device_get of one scalar."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, ROWS, BLOCK, CHAINS = 1 << 20, 16, 1 << 11, 8

    def make(reps):
        def kernel(a_ref, b_ref, o_ref):
            a, b = a_ref[:], b_ref[:]
            accs = [a + jnp.uint32(i) for i in range(CHAINS)]
            for _ in range(reps):
                accs = [acc * b for acc in accs]
            out = accs[0]
            for acc in accs[1:]:
                out = out + acc
            o_ref[:] = out

        @jax.jit
        def run(a, b):
            r = pl.pallas_call(
                kernel, grid=(N // BLOCK,),
                in_specs=[pl.BlockSpec((ROWS, BLOCK), lambda i: (0, i),
                                       memory_space=pltpu.VMEM)] * 2,
                out_specs=pl.BlockSpec((ROWS, BLOCK), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((ROWS, N), jnp.uint32))(a, b)
            return r[0, 0]
        return run

    a = jax.random.randint(jax.random.PRNGKey(0), (ROWS, N), 1, 1 << 15,
                           jnp.int32).astype(jnp.uint32)

    def best_s(run):
        jax.device_get(run(a, a))
        best = None
        for _ in range(5):
            t0 = time.time()
            jax.device_get(run(a, a))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    lo_reps, hi_reps = 16, 128
    lo, hi = best_s(make(lo_reps)), best_s(make(hi_reps))
    if hi - lo <= 1e-4:
        raise RuntimeError("vpu peak unmeasurable (marginal time ~ 0)")
    return ROWS * N * (hi_reps - lo_reps) * CHAINS / (hi - lo) / 1e9


def _measure_hash_latency():
    """Measured serial latency (seconds) of one 3-element MiMC7-91
    multi_hash in the Mosaic kernel — the Fiat-Shamir transcript cost
    that no data parallelism touches: each of the v=2k rounds must hash
    the round coefficients before the fold can use the challenge, a
    91-round dependent scalar chain per hash.  Chained marginal timing
    (h_{i+1} = H(h_i, a, b) depth-d inside one program) cancels both the
    tunnel sync floor and the backend's coalescing of unchained calls."""
    import jax
    import jax.numpy as jnp

    from gkr_tpu.jaxeng import limbs as L
    from gkr_tpu.jaxeng import pallas_kernels as PK
    from gkr_tpu.field import P as _P

    rng = random.Random(9)
    a = L.pack_scalar(rng.randrange(_P))
    b = L.pack_scalar(rng.randrange(_P))
    h0 = L.pack_scalar(rng.randrange(_P))

    def chain(depth):
        @jax.jit
        def f(h):
            for _ in range(depth):
                h = PK.pl_mimc_multi(jnp.stack([h, a, b]))
            return h[0]
        return f

    def best_chain(depth):
        f = chain(depth)
        jax.device_get(f(h0))                # warm (compile)
        best = None
        for _ in range(3):
            t0 = time.time()
            jax.device_get(f(h0))
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        return best

    lo_d, hi_d = 2, 10
    dt = (best_chain(hi_d) - best_chain(lo_d)) / (hi_d - lo_d)
    if dt <= 0:
        raise RuntimeError("hash latency unmeasurable (marginal time ~ 0)")
    return dt


def _min_hbm_bytes(n: int, na: int, nm: int) -> int:
    """Analytic minimum HBM traffic for one fused layer (bytes).

    Counted at 64 B per (16,)-u32 field element, 128 B per gate for the
    8+8-split cumsum columns.  Rounds (both phases, sizes summing to 2n
    per phase over the halving chain): eval reads the stack once, fold
    reads it again and writes half — phase 1 stack is 4 tables, phase 2
    is 3.  Builds: per phase, gather + product + cumsum over the gate
    list and one boundary-difference pass over the n buckets."""
    G = na + nm
    elem = 64
    rounds = 0
    for t in (4, 3):
        per_entry = elem * t            # one table-stack entry
        rounds += 2 * n * per_entry     # eval pass (sum of halving sizes)
        rounds += 2 * n * per_entry     # fold read
        rounds += n * per_entry         # fold write (half, summed = n)
    builds = 0
    for _phase in (1, 2):
        builds += 3 * elem * G          # weight gather read+write+mul read
        builds += 2 * 128 * G           # split columns write + cumsum read
        builds += 2 * 128 * n           # boundary gathers (hi/lo) over Cz
        builds += elem * n * 3          # normalize write per table (~3)
    return rounds + builds


def run_device(k: int, breakdown: bool = True):
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

    if not breakdown:
        # skip the standalone stage timings: they hold the full table
        # stack alive while rebuilding it, doubling peak HBM — at 2^24
        # that is the difference between fitting and ResourceExhausted
        return best, None, None, None

    # breakdown: builds timed standalone; rounds+hash = remainder.
    # Through the tunneled device `block_until_ready` does NOT actually
    # block and any forced sync (device_get) pays a ~23 ms round-trip
    # floor, so standalone stages are timed MARGINALLY: enqueue `lo` vs
    # `hi` repetitions, drain with one scalar device_get, and divide the
    # difference — the fixed sync cost cancels.
    use_pallas = F._pallas_platform()
    pallas_build = use_pallas and n >= F.PALLAS_MIN
    z_dev = L.pack(z)
    na, nm = len(ag), len(mg)

    def _first_leaf(r):
        import jax.numpy as jnp
        leaves = jax.tree_util.tree_leaves(r)
        a = leaves[0]
        return a.reshape(-1)[0] if hasattr(a, "reshape") else jnp.uint32(0)

    def tt(fn, lo=1, hi=4):
        # fn(i) must VARY an operand with i: the tunneled backend coalesces
        # repeated identical un-chained calls (~7x under-read, same effect
        # as the mont_mul peak's unchained timing — see `chain` below)
        def run(reps):
            r = None
            for i in range(reps):
                r = fn(i)
            jax.device_get(_first_leaf(r))

        run(1)                               # warm
        def best_s(reps):
            best = None
            for _ in range(3):
                t0 = time.time()
                run(reps)
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return best
        d = best_s(hi) - best_s(lo)
        if d <= 0:
            return None                      # unmeasurable under noise
        return d / (hi - lo)

    c1 = (na, nm, wiring.fast[0], wiring.fast[1],
          wiring.mxu[0], wiring.mxu[1])
    c2 = (na, nm, wiring.fast[2], wiring.fast[3],
          wiring.mxu[2], wiring.mxu[3])
    import jax.numpy as jnp
    from gkr_tpu.field import P as _P
    # per-repetition operand variants so repeated calls cannot be coalesced
    z_vars = [L.pack([rng.randrange(_P) for _ in z]) for _ in range(8)]
    b1 = tt(lambda i: F._build_phase1(w_dev, z_vars[i], wiring, c1, n,
                                      pallas_build))
    S1, eqz = F._build_phase1(w_dev, z_dev, wiring, c1, n, pallas_build)
    b_vars = [jnp.stack([L.pack_scalar(rng.randrange(_P))
                         for _ in range(k)]) for _ in range(8)]
    wb = L.pack_scalar(rng.randrange(_P))
    b2 = tt(lambda i: F._build_phase2(w_dev, b_vars[i], wb, eqz, wiring,
                                      c2, n, pallas_build))

    # standalone Pallas mont_mul peak (compute speed-of-light proxy).
    # CHAINED marginal timing: x = mul(x, b) depth-d inside one program —
    # repeated identical un-chained calls are coalesced by the tunneled
    # backend and read ~7x faster than the VPU op-count floor allows.
    peak = None
    if use_pallas:
        from gkr_tpu.jaxeng import pallas_kernels as PK
        a_t = L.jnormalize(jax.random.randint(
            jax.random.PRNGKey(0), (n, 16), 0, 1 << 15,
            dtype=jnp.int32).astype(jnp.uint32)).T  # (16, n) kernel layout

        def chain(depth):
            @jax.jit
            def f(x):
                for _ in range(depth):
                    x = PK.pl_mont_mul_T(x, a_t)
                return x[0, 0]
            return f

        def best_chain(depth):
            f = chain(depth)
            jax.device_get(f(a_t))
            best = None
            for _ in range(3):
                t0 = time.time()
                jax.device_get(f(a_t))
                dt = time.time() - t0
                best = dt if best is None or dt < best else best
            return best

        lo_d, hi_d = 1, 5
        dt_m = (best_chain(hi_d) - best_chain(lo_d)) / (hi_d - lo_d)
        peak = n / dt_m if dt_m > 0 else None

    return best, b1, b2, peak


def run_device_pipelined(k: int, batch: int = 6):
    """Steady-state pipelined throughput: `batch` instances of the same
    circuit proved back-to-back (distinct Fiat-Shamir inputs z), all
    layer programs enqueued asynchronously, ONE device->host sync for
    the whole batch (prove_layer_sumcheck_fused defer=True), then host
    FS validation of every transcript.  This is the production serving
    shape — one circuit, many instances — and amortizes the per-layer
    sync that the isolated headline pays in full (~25 ms through the
    tunneled bench host, larger than the whole round chain)."""
    import jax

    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.jaxeng import limbs as L
    from gkr_tpu.jaxeng import fused as F
    from gkr_tpu.field import P

    rng = random.Random(1)
    z0, w, ag, mg, kc, struct = synth_layer(rng, k)
    n = 1 << k
    w_dev = L.pack(w)
    w_dev.block_until_ready()
    wiring = F.build_wiring(ag, mg, n)
    jax.block_until_ready(wiring)
    z_list = [[rng.randrange(P) for _ in range(kc)] for _ in range(batch)]

    def run():
        t0 = time.time()
        outs = [F.prove_layer_sumcheck_fused(
            z_list[i], w, ag, mg, kc, k, struct, Mimc7(),
            w_dev=w_dev, wiring=wiring, defer=True) for i in range(batch)]
        host = jax.device_get([o[0] for o in outs])
        for (_, fin), h in zip(outs, host):
            fin(h)
        return time.time() - t0

    run()                                    # warmup (compiles shared)
    best = None
    for _ in range(3):
        dt = run()
        best = dt if best is None or dt < best else best
    return batch * n / best, best / batch


class _TimedBackend:
    """Per-stage timing proxy around a prover backend (full-prove mode)."""

    def __init__(self, inner):
        self.inner = inner
        self.t: dict[str, float] = {}

    def reset_cache(self):
        if hasattr(self.inner, "reset_cache"):
            self.inner.reset_cache()

    def _timed(self, name, fn, *a, **kw):
        t0 = time.time()
        r = fn(*a, **kw)
        self.t[name] = self.t.get(name, 0.0) + (time.time() - t0)
        return r

    def mle_struct(self, *a, **kw):
        return self._timed("mle_struct", self.inner.mle_struct, *a, **kw)

    def layer_sumcheck(self, *a, **kw):
        return self._timed("sumcheck", self.inner.layer_sumcheck, *a, **kw)

    def restrict_to_line(self, *a, **kw):
        return self._timed("restrict_to_line",
                           self.inner.restrict_to_line, *a, **kw)

    def sparse_from_dense(self, *a, **kw):
        return self._timed("sparse_from_dense",
                           self.inner.sparse_from_dense, *a, **kw)


def synth_circuit(rng: random.Random, k: int, k_input: int):
    """Depth-3 synthetic circuit with 2^k-gate wide layers: 16 outputs <-
    2^k gates <- 2^k-entry layer <- 2^k gates <- 2^k_input inputs.  The
    full-prove scope of rust/src/gkr/prover.rs:6-96 +
    rust/src/convert.rs:787-849 (struct + sumcheck + line restriction +
    sparse MLE materialization per layer)."""
    from gkr_tpu.circuit import GKRCircuit, GateLayer

    n, ni = 1 << k, 1 << k_input
    l0 = GateLayer(4, k, add_gates=[(o, rng.randrange(n), rng.randrange(n))
                                    for o in range(16)])
    mid_add, mid_mult = [], []
    for g in range(n):
        trip = (g, rng.randrange(n), rng.randrange(n))
        (mid_add if g & 1 else mid_mult).append(trip)
    l1 = GateLayer(k, k, add_gates=mid_add, mult_gates=mid_mult)
    in_add, in_mult = [], []
    for g in range(n):
        trip = (g & (n - 1), rng.randrange(ni), rng.randrange(ni))
        (in_add if g & 1 else in_mult).append(trip)
    l2 = GateLayer(k, k_input, add_gates=in_add, mult_gates=in_mult)
    return GKRCircuit(layers=[l0, l1, l2], input_k=k_input)


def run_full_prove(k: int, k_input: int = 16):
    """Full prove() + full-strength host verify on the device backend.

    Returns (total gates, prove seconds, per-stage dict, verify seconds).
    sparse_from_dense materializes the input-layer MLE (2^k_input terms) —
    on the tunneled bench host that stage is transfer-bound (~0.5 MB/s
    device->host); the per-stage split keeps the compute number honest."""
    from gkr_tpu.field import P
    from gkr_tpu.jaxeng.backend import JaxBackend
    from gkr_tpu.prover import prove
    from gkr_tpu.verifier import verify

    rng = random.Random(7)
    circuit = synth_circuit(rng, k, k_input)
    inputs = [rng.randrange(P) for _ in range(1 << k_input)]
    w = circuit.evaluate(inputs)
    backend = _TimedBackend(JaxBackend())
    proof = prove(circuit, w, backend=backend)          # warmup: compiles
    backend.t.clear()
    t0 = time.time()
    proof = prove(circuit, w, backend=backend)
    dt = time.time() - t0
    t1 = time.time()
    ok = verify(proof, circuit)
    verify_s = time.time() - t1
    assert ok, "full-prove self-verification failed"
    # pipelined walk: device-resident z-chain, two syncs per proof
    # instead of one per layer (prove_pipelined)
    try:
        from gkr_tpu.jaxeng.backend import prove_pipelined
        inner = backend.inner
        p2 = prove_pipelined(circuit, w, backend=inner)   # warmup
        t2 = time.time()
        p2 = prove_pipelined(circuit, w, backend=inner)
        pipe_s = time.time() - t2
        assert verify(p2, circuit), "pipelined self-verification failed"
    except Exception:  # pragma: no cover
        pipe_s = None
    gates = sum(layer.n_gates() for layer in circuit.layers)
    return gates, dt, dict(backend.t), verify_s, pipe_s


def run_aggregation(n_inputs: int = 3):
    """Native aggregation end-to-end: the product-level wall-clock the
    reference's colored timers print per round (rust/src/aggregator.rs:
    349-358).  Reference-example mimc inputs (examples/mimc/input*.json,
    byte-equal to rust/example/input{1,2,3}.json), full-strength defaults
    (full_fs + recombination + per-round self-verify), JaxBackend.
    Returns {total_s, round_s[], constraints[]} — round i's constraint
    count includes the in-circuit verifier gadget for round i-1's proof."""
    import json as _json

    from gkr_tpu.examples import mimc_example
    from gkr_tpu.jaxeng.backend import JaxBackend
    from gkr_tpu.recursion.native import prove_round_native

    root = os.path.dirname(os.path.abspath(__file__))
    inputs = []
    for i in range(1, n_inputs + 1):
        with open(os.path.join(root, "examples", "mimc",
                               f"input{i}.json")) as f:
            inputs.append({k: int(v) for k, v in _json.load(f).items()})
    backend = JaxBackend()
    pairs = None
    rounds, n_constraints = [], []
    t_all = time.time()
    for i, ui in enumerate(inputs):
        t0 = time.time()
        pairs, builder = prove_round_native(
            mimc_example, ui, pairs if i else None, backend=backend)
        rounds.append(round(time.time() - t0, 3))
        n_constraints.append(len(builder.constraints))
    return {
        "config": (f"native mimc aggregation, {n_inputs} inputs, full_fs "
                   "+ recombination + self-verify, JaxBackend"),
        "total_s": round(time.time() - t_all, 2),
        "round_s": rounds,
        "constraints": n_constraints,
    }


def main() -> int:
    _enable_device_cache()
    k = int(os.environ.get("GKR_BENCH_K", "20"))
    host_k = int(os.environ.get("GKR_BENCH_HOST_K", "12"))
    # C++ baseline at the SAME size as the device headline (round-3 weak
    # finding: a 2^18 baseline vs a 2^20 device rate mixed sizes even
    # though the algorithm is size-linear); GKR_BENCH_CPP_K overrides.
    cpp_k = int(os.environ.get("GKR_BENCH_CPP_K", str(k)))
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

    # hardware roofline: HBM bytes at pin bandwidth vs u32 ops at the
    # MEASURED elementwise peak — the binding one is the chip floor
    roofline = None
    try:
        import jax
        dev_kind = jax.devices()[0].device_kind
        gbps = next((v for pfx, v in HBM_GBPS.items()
                     if dev_kind.startswith(pfx)), None)
        if gbps and jax.devices()[0].platform != "cpu":
            vpu_gops = _measure_vpu_peak()
            t_hash = _measure_hash_latency()
            hbm_min = _min_hbm_bytes(n, n // 2, n // 2) / (gbps * 1e9)
            vpu_min = mont_muls * OPS_PER_MONT_MUL / (vpu_gops * 1e9)
            # serial Fiat-Shamir floor: v dependent transcript hashes per
            # layer that throughput parallelism cannot touch (round-4
            # verdict: the throughput-only roofline overstated the
            # reachable gap)
            serial_min = v * t_hash
            chip_min = max(hbm_min, vpu_min, serial_min)
            roofline = {
                "device_kind": dev_kind,
                "hbm_gbps": gbps,
                "vpu_u32_gops_measured": round(vpu_gops, 1),
                "t_hash_ms_measured": round(t_hash * 1000, 3),
                "hbm_min_ms": round(hbm_min * 1000, 2),
                "vpu_min_ms": round(vpu_min * 1000, 2),
                "serial_fs_min_ms": round(serial_min * 1000, 2),
                "chip_min_ms": round(chip_min * 1000, 2),
                "sol_vs_chip": round(chip_min / dt, 3),
            }
    except Exception as e:  # pragma: no cover
        roofline = {"error": str(e)}

    # fixed device<->host sync round-trip (the tunnel RTT a co-located
    # production host would not pay; included once in layer_ms via the
    # one per-layer download)
    rtt = None
    try:
        import jax
        import jax.numpy as jnp
        f_tiny = jax.jit(lambda x: x + 1)
        x0 = jnp.zeros((16,), jnp.uint32)
        jax.device_get(f_tiny(x0))          # warm (compile)
        for _ in range(5):
            t0 = time.time()
            # fresh output array each time: device_get of an
            # already-fetched array is free and would read 0
            jax.device_get(f_tiny(x0))
            dt_r = time.time() - t0
            rtt = dt_r if rtt is None or dt_r < rtt else rtt
    except Exception:  # pragma: no cover
        pass

    try:
        pipe_rate, pipe_layer_s = run_device_pipelined(k)
    except Exception:  # pragma: no cover
        pipe_rate = pipe_layer_s = None

    out.update({
        "value": round(device_rate, 1),
        "vs_baseline": round(device_rate / baseline, 2),
        "pipelined_gates_per_sec": (round(pipe_rate, 1)
                                    if pipe_rate else None),
        "pipelined_layer_ms": (round(pipe_layer_s * 1000, 1)
                               if pipe_layer_s else None),
        "cpp_gates_per_sec": round(cpp_rate, 1) if cpp_rate else None,
        "cpp_measured_at": f"2^{cpp_k}",
        "host_cpus": os.cpu_count(),
        "sync_rtt_ms": round(rtt * 1000, 1) if rtt else None,
        "host_py_gates_per_sec": round(host_rate, 1),
        "layer_ms": round(dt * 1000, 1),
        "sumcheck_rounds_per_sec": round(v / dt, 1),
        "fr_mle_evals_per_sec": round(entries / dt, 1),
        "mont_mul_per_sec": round(mont_muls / dt, 1),
        "kernel_peak_mul_per_sec": round(peak, 1) if peak else None,
        "sol_fraction": (round(mont_muls / dt / peak, 3) if peak else None),
        "roofline": roofline,
        # None = stage unmeasurable under timing noise (negative margin);
        # the remainder is only derived when both builds measured cleanly
        "breakdown_ms": {
            "build_phase1": round(b1 * 1000, 1) if b1 else None,
            "build_phase2": round(b2 * 1000, 1) if b2 else None,
            "rounds_and_hash": (round((dt - b1 - b2) * 1000, 1)
                                if b1 and b2 else None)},
    })

    if os.environ.get("GKR_BENCH_EXTRA", "") == "1":
        extra = {}
        dt16, _, _, _ = run_device(16, breakdown=False)
        extra["layer_2e16"] = {"gates_per_sec": round((1 << 16) / dt16, 1),
                               "layer_ms": round(dt16 * 1000, 2)}
        fk = int(os.environ.get("GKR_BENCH_FULL_K", str(k)))
        fki = int(os.environ.get("GKR_BENCH_FULL_KIN", "16"))
        try:
            gates, fdt, stages, verify_s, pipe_s = run_full_prove(fk, fki)
            extra["full_prove"] = {
                "config": f"depth-3, 2^{fk}-gate layers, 2^{fki} inputs",
                "total_gates": gates,
                "prove_s": round(fdt, 3),
                "gates_per_sec": round(gates / fdt, 1),
                "stage_s": {s: round(t, 3) for s, t in stages.items()},
                "host_verify_s": round(verify_s, 2),
                "pipelined_prove_s": (round(pipe_s, 3)
                                      if pipe_s else None),
                "pipelined_gates_per_sec": (round(gates / pipe_s, 1)
                                            if pipe_s else None),
            }
        except Exception as e:  # pragma: no cover
            extra["full_prove"] = {"error": str(e)}
        if os.environ.get("GKR_BENCH_AGG", "1") == "1":
            try:
                extra["aggregation_e2e"] = run_aggregation()
            except Exception as e:  # pragma: no cover
                extra["aggregation_e2e"] = {"error": str(e)}
        # BASELINE.md's 2^24 scaling config LAST: its ~6 GB of transient
        # stacks can leave the 16 GB HBM too fragmented for later stages
        # (GKR_BENCH_TOPK=0 skips it on a small-memory device)
        top_k = int(os.environ.get("GKR_BENCH_TOPK", "24"))
        if top_k > k:
            try:
                dt_top, _, _, _ = run_device(top_k, breakdown=False)
                extra[f"layer_2e{top_k}"] = {
                    "gates_per_sec": round((1 << top_k) / dt_top, 1),
                    "layer_ms": round(dt_top * 1000, 1)}
            except Exception as e:  # pragma: no cover
                extra[f"layer_2e{top_k}"] = {"error": str(e)}
        out["extra"] = extra
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
