"""Per-piece timing of the fused engine at 2^k (TPU)."""

from __future__ import annotations

import random
import sys
import time

import jax
import jax.numpy as jnp

from gkr_tpu.field import P
from gkr_tpu.jaxeng import limbs as L
from gkr_tpu.jaxeng import pallas_kernels as PK
from gkr_tpu.jaxeng.fused import (_build_phase1, _build_phase2, _gate_cols,
                                  _hash2, _hash3, _p1_round, _pad_pow2)


def tick(label, fn, reps=5):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:44s} {(time.time()-t0)/reps*1000:10.2f} ms")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    rng = random.Random(1)
    key = jax.random.PRNGKey(0)
    w_dev = L.jnormalize(jax.random.randint(key, (n, 16), 0, 1 << 16,
                                            dtype=jnp.int32).astype(jnp.uint32))
    w_dev.block_until_ready()
    z = [rng.randrange(P) for _ in range(4)]
    z_dev = L.pack(z)
    na = nm = n // 2
    gates = [(g & 15, rng.randrange(n), rng.randrange(n)) for g in range(na)]
    add_olr = _gate_cols(gates, _pad_pow2(na))
    mult_olr = _gate_cols(gates, _pad_pow2(nm))

    c = L.pack_scalar(123456789)
    tick("hash3 (device MiMC multi_hash(3))", lambda: _hash3(c, c, c))
    tick("hash2", lambda: _hash2(c, c))

    tick("build_phase1 (2^19 add + 2^19 mult)",
         lambda: _build_phase1(w_dev, z_dev, (add_olr, mult_olr), (na, nm), n))
    S1, wa, wm = _build_phase1(w_dev, z_dev, (add_olr, mult_olr), (na, nm), n)
    b_star = jnp.stack([L.pack_scalar(rng.randrange(P)) for _ in range(k)])
    tick("build_phase2", lambda: _build_phase2(w_dev, b_star, wa, wm,
                                               (add_olr, mult_olr), (na, nm), n))
    tick("eq_table 2^k", lambda: L.jeq_table(b_star))

    S1T = PK.to_T(S1)
    tick("pallas p1 eval+interp (full n)", lambda: _p1_round(S1) if False else PK.pl_phase1_eval(S1T))
    tick("pallas fold (full n)", lambda: PK.pl_fold(S1T, c))
    tick("XLA _p1_round at 2^12",
         lambda: _p1_round(S1[: 1 << 12]))
    # total round-chain estimate
    import gkr_tpu.jaxeng.fused as F
    from gkr_tpu.mle import MleStruct
    from gkr_tpu.mimc import Mimc7
    struct = MleStruct(k, False, [True] * k, k)
    w = [rng.randrange(P) for _ in range(1)]  # w_dev used instead
    t0 = time.time()
    F.prove_layer_sumcheck_fused(z, None, gates, gates, 4, k, struct,
                                 Mimc7(), w_dev=w_dev)
    print(f"full layer: {(time.time()-t0)*1000:.0f} ms")


if __name__ == "__main__":
    main()
