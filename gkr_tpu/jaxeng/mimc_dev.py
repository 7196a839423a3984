"""MiMC7-91 Fiat–Shamir transcript hashing ON DEVICE.

Why: the sumcheck round loop is challenge-sequential — round j's fold needs
r_j = MiMC(coeffs_j), and coeffs_j come from round j's evaluation.  With the
hash on the host every round costs two device<->host transfers (~35 ms each
through the tunnel), ~2.2 s per 2^20 layer before any math.  Hashing on
device lets an ENTIRE layer sumcheck (table build + all 2k rounds + the
Fiat–Shamir schedule) run as ONE dispatched program.

Scheme: iden3 MiMC7 (gkr_tpu.mimc.Mimc7 — the reference's `mimc-rs`
Mimc7::new(91).multi_hash(coeffs, key=0), rust/src/gkr/sumcheck.rs:45,83-85),
computed on 16x16-bit Montgomery limb vectors:

    hash(x, k): t_0 = x + k; t_i = h + k + cts[i]; h = t^7;  return h + k
    multi_hash(arr, key): r = key; for x in arr: r += x + hash(x, r)

x^7 is 4 Montgomery multiplies; the 90 tail rounds run under `lax.scan` over
the precomputed Montgomery-form constants so the traced graph stays small.
Everything is exact (the limb engine is exact); transcripts are bit-identical
to the host Mimc7 — tests/test_jaxeng.py cross-checks.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

from ..field import P, R
from ..mimc import DEFAULT_ROUNDS, mimc7_constants
from . import limbs as L


def _pack_consts(n_rounds: int = DEFAULT_ROUNDS) -> np.ndarray:
    cts = mimc7_constants(n_rounds)
    out = np.empty((n_rounds, 16), dtype=np.uint32)
    for i, c in enumerate(cts):
        v = c * R % P
        out[i] = np.frombuffer(v.to_bytes(32, "little"),
                               dtype=np.uint16).astype(np.uint32)
    return out


# Kept as a HOST numpy array: a module-level jnp constant would be captured
# as a tracer if this module is first imported inside a jit trace (the
# Pallas kernels import it lazily).
CTS_MONT = _pack_consts()
ZERO = np.zeros((16,), np.uint32)


def _pow7(t: jnp.ndarray) -> jnp.ndarray:
    t2 = L.mont_mul(t, t)
    t4 = L.mont_mul(t2, t2)
    t6 = L.mont_mul(t4, t2)
    return L.mont_mul(t6, t)


def mimc_hash_dev(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """hash(x, k) over (16,) Montgomery limb vectors (round 0 unrolled, the
    rest scanned over the constant table)."""
    h = _pow7(L.add_mod(x, k))

    def body(h, ct):
        return _pow7(L.add_mod(L.add_mod(h, k), ct)), None

    h, _ = lax.scan(body, h, CTS_MONT[1:])
    return L.add_mod(h, k)


def multi_hash_dev(arr: list[jnp.ndarray], key: jnp.ndarray = ZERO) -> jnp.ndarray:
    """multi_hash over a STATIC-length list of (16,) Montgomery vectors.
    The list length is a trace-time constant (the sumcheck's structural
    coefficient-count schedule), matching the host transcript exactly."""
    r = key
    for x in arr:
        r = L.add_mod(L.add_mod(r, x), mimc_hash_dev(x, r))
    return r
