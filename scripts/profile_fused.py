"""Per-piece timing of the fused engine at 2^k on the current device.

Usage: PYTHONPATH=.:/root/.axon_site python -u scripts/profile_fused.py [k]

Times every sub-piece of the builds (gathers, mont-mul, cumsum segment
sum, boundary gathers, normalize) and of the rounds (eval, fold, MiMC,
per-round Python dispatch) so optimization targets are measured, not
guessed.
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

import jax.numpy as jnp  # noqa: E402

from gkr_tpu.field import P  # noqa: E402
from gkr_tpu.mimc import Mimc7  # noqa: E402
from gkr_tpu.mle import MleStruct  # noqa: E402
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
import gkr_tpu.jaxeng.fused as F  # noqa: E402
from gkr_tpu.jaxeng.fused import build_wiring  # noqa: E402


def tick(label, fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:44s} {(time.time()-t0)/reps*1000:10.2f} ms", flush=True)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    k_cur = 4
    rng = random.Random(1)
    use_pallas = F._pallas_platform()
    print("device:", jax.devices()[0], "k:", k, "pallas:", use_pallas,
          flush=True)

    key = jax.random.PRNGKey(0)
    w_dev = L.jnormalize(jax.random.randint(
        key, (n, 16), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32))
    w_dev.block_until_ready()
    z = [rng.randrange(P) for _ in range(k_cur)]
    z_dev = L.pack(z)
    na = nm = n // 2
    add_gates = [(g & 15, rng.randrange(n), rng.randrange(n))
                 for g in range(na)]
    mult_gates = [(g & 15, rng.randrange(n), rng.randrange(n))
                  for g in range(nm)]

    t0 = time.time()
    wiring = build_wiring(add_gates, mult_gates, n)
    jax.block_until_ready(wiring)
    print(f"build_wiring host->dev: {(time.time()-t0)*1000:.0f} ms",
          flush=True)

    c = L.pack_scalar(123456789)
    if use_pallas:
        from gkr_tpu.jaxeng import pallas_kernels as PK
        tick("pallas MiMC multi_hash(3)",
             lambda: PK.pl_mimc_multi(jnp.stack([c, c, c])))

        # ---- build sub-pieces (transposed layout), all jitted standalone
        w_T = jnp.asarray(w_dev.T)
        eqz_T = jax.jit(PK.pl_eq_table_T)(z_dev)
        jax.block_until_ready((w_T, eqz_T))
        ga = wiring.a1_out
        gin = wiring.a1_in
        hib = wiring.a1_hib

        gather_eq = jax.jit(lambda e, idx: e[:, idx])
        tick("gather eqz (16,G)", lambda: gather_eq(eqz_T, ga))
        wa = gather_eq(eqz_T, ga)
        tick("gather w (16,G)", lambda: gather_eq(w_T, gin))
        wg = gather_eq(w_T, gin)
        tick("pl_mont_mul_T (16,G)", lambda: PK.pl_mont_mul_T(wa, wg))
        prod = PK.pl_mont_mul_T(wa, wg)

        seg = jax.jit(lambda h, a, b, nn=n: F._seg_sorted_T(h, [a, b], nn))
        tick("seg_sorted_T 2 tables", lambda: seg(hib, wa, prod))
        rel = seg(hib, wa, prod)[0]

        split = jax.jit(lambda ws: jnp.cumsum(
            jnp.concatenate([ws & jnp.uint32(0xFF), ws >> 8], axis=0),
            axis=1, dtype=jnp.uint32))
        tick("  cumsum(32,G) alone", lambda: split(wa))
        C = split(wa)
        Cz = jnp.concatenate([jnp.zeros((32, 1), jnp.uint32), C], axis=1)
        bnd = jax.jit(lambda cz, h: cz[:, h] - cz[:, jnp.concatenate(
            [jnp.zeros((1,), h.dtype), h[:-1]])])
        tick("  boundary gathers (32,n)x2", lambda: bnd(Cz, hib))
        tick("pl_normalize_T (18,n)", lambda: PK.pl_normalize_T(rel))

        tick("build_phase1 (total)", lambda: F._build_phase1(
            w_dev, z_dev, wiring, (na, nm), n, True))
        S1, eqz = F._build_phase1(w_dev, z_dev, wiring, (na, nm), n, True)
        b_star = jnp.stack([L.pack_scalar(rng.randrange(P))
                            for _ in range(k)])
        wb = L.pack_scalar(rng.randrange(P))
        tick("pl_eq_table_T 2^k", lambda: jax.jit(PK.pl_eq_table_T)(b_star))
        tick("build_phase2 (total)", lambda: F._build_phase2(
            w_dev, b_star, wb, eqz, wiring, (na, nm), n, True))

        # ---- round pieces at a few sizes
        S = S1
        for kk in (k, k - 4, k - 8):
            m = 1 << kk
            Sm = S[:, :, :m]
            tick(f"p1 eval+interp m=2^{kk}", lambda Sm=Sm: F._p1_round_T(Sm))
            tick(f"pl_fold m=2^{kk}", lambda Sm=Sm: PK.pl_fold(Sm, c))
            y = PK.pl_phase1_eval(Sm)
        tick("interp3 alone (XLA, tiny)",
             lambda: jax.jit(F._interp3)(y[0], y[1], y[2]))

    struct = MleStruct(k, False, [True] * k, k)
    t0 = time.time()
    F.prove_layer_sumcheck_fused(z, None, add_gates, mult_gates, k_cur, k,
                                 struct, Mimc7(), w_dev=w_dev,
                                 wiring=wiring)
    print(f"full layer (1st, incl residual compiles): "
          f"{(time.time()-t0)*1000:.0f} ms", flush=True)
    for rep in range(3):
        t0 = time.time()
        F.prove_layer_sumcheck_fused(z, None, add_gates, mult_gates, k_cur,
                                     k, struct, Mimc7(), w_dev=w_dev,
                                     wiring=wiring)
        dt = time.time() - t0
        print(f"full layer run {rep}: {dt*1000:.0f} ms -> "
              f"{n/dt:,.0f} gates/s", flush=True)


if __name__ == "__main__":
    main()
