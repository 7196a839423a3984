"""Ablation timing of _build_phase1 at 2^k: measure each component's
MARGINAL cost by stubbing it out and re-timing the whole jitted build
(varied operands per repetition so the tunneled backend cannot coalesce;
hi-lo repetition differences cancel the ~25 ms sync floor).

Usage: python scripts/ablate_build.py [k]
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import random
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

import gkr_tpu.jaxeng  # noqa: F401  (compile cache)
from gkr_tpu.field import P
from gkr_tpu.jaxeng import fused as F
from gkr_tpu.jaxeng import limbs as L
from gkr_tpu.jaxeng import pallas_kernels as PK


def marginal(fn, vars_, lo=1, hi=4, reps=3):
    """fn(operand) -> device tree; returns marginal seconds per call."""
    def run(n):
        r = None
        for i in range(n):
            r = fn(vars_[i % len(vars_)])
        leaf = jax.tree_util.tree_leaves(r)[0]
        jax.device_get(leaf.reshape(-1)[0])

    run(1)
    def best(n):
        b = None
        for _ in range(reps):
            t0 = time.time(); run(n); dt = time.time() - t0
            b = dt if b is None or dt < b else b
        return b
    return (best(hi) - best(lo)) / (hi - lo)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    rng = random.Random(1)
    w_vals = [rng.randrange(P) for _ in range(n)]
    ag, mg = [], []
    for g in range(n):
        o = g & 15
        trip = (o, rng.randrange(n), rng.randrange(n))
        (ag if g & 1 else mg).append(trip)
    wiring = F.build_wiring(ag, mg, n)
    jax.block_until_ready(wiring)
    w_dev = L.pack(w_vals)
    w_dev.block_until_ready()
    na, nm = len(ag), len(mg)
    fast = wiring.fast
    c1 = (na, nm, fast[0], fast[1])
    z_vars = [L.pack([rng.randrange(P) for _ in range(4)]) for _ in range(8)]

    print(f"k={k} fast={fast}")

    @partial(jax.jit, static_argnums=(3,))
    def build_variant(w_dev, z_dev, wiring, mode):
        w_T = w_dev.T
        eqz_T = PK.pl_eq_table_T(z_dev)
        G = wiring.a1_out.shape[0]
        if mode == "noeqgather":
            wa = jnp.broadcast_to(eqz_T[:, :1], (16, G))
        else:
            wa = eqz_T[:, wiring.a1_out]
        if mode == "nowgather":
            win = w_T[:, :G]
        else:
            win = w_T[:, wiring.a1_in]
        if mode == "nomul":
            prod_a = win
        else:
            prod_a = F._mmul_T(wa, win)
        if mode == "stop_after_mul":
            return prod_a
        fa1 = c1[2]
        if mode == "nocumsum":
            # skip the cumsum: fake monotone C directly from weights
            C = wa
            Cz = jnp.concatenate([jnp.zeros((16, 1), jnp.uint32), C], axis=1)
            seg = F._shift_diff_T(Cz[:, wiring.a1_hib],
                                  jnp.zeros((16, 1), jnp.uint32))
            pad = lambda x, b, a: jnp.pad(x, ((b, a), (0, 0)))  # noqa: E731
            rel = [pad(seg & jnp.uint32(0xFFFF), 0, 2) + pad(seg >> 16, 1, 1)]
            rel.append(rel[0])
        elif mode == "nobound":
            # cumsum but slice instead of the boundary gather
            out = []
            for ws in (wa, prod_a):
                C = jnp.cumsum(ws, axis=1, dtype=jnp.uint32)
                Cz = jnp.concatenate([jnp.zeros((16, 1), jnp.uint32), C], 1)
                seg = Cz[:, :n] if Cz.shape[1] >= n else jnp.pad(
                    Cz, ((0, 0), (0, n - Cz.shape[1])))
                pad = lambda x, b, a: jnp.pad(x, ((b, a), (0, 0)))  # noqa: E731
                out.append(pad(seg & jnp.uint32(0xFFFF), 0, 2)
                           + pad(seg >> 16, 1, 1))
            rel = out
        else:
            rel = F._seg_sorted_T(wiring.a1_hib, [wa, prod_a], n, fast=fa1)
        if mode == "nonorm":
            return rel[0]
        ha1 = PK.pl_normalize_T(rel[0])
        ha2 = PK.pl_normalize_T(rel[1])
        return ha1[0, 0] + ha2[0, 0]

    for mode in ("full", "noeqgather", "nowgather", "nomul",
                 "stop_after_mul", "nocumsum", "nobound", "nonorm"):
        dt = marginal(lambda z, m=mode: build_variant(w_dev, z, wiring, m),
                      z_vars)
        print(f"{mode:16s} {dt*1000:8.2f} ms")


if __name__ == "__main__":
    main()
