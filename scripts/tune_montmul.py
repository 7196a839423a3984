"""Microbenchmark of mont_mul / fold kernel variants on the default device.

Variants:
  dot   — current: partial-product routing via uint32 dot_general
  pad   — shift-add accumulation with jnp.pad chains
  i32   — pad variant with int32 arithmetic where legal
Run:  python scripts/tune_montmul.py [log2_n]
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
from gkr_tpu.field import P  # noqa: E402


def conv_pad(a, b):
    """Shift-add column accumulation (no dot)."""
    cols = None
    for i in range(16):
        row = a[..., i:i + 1] * b          # (..., 16)
        lo = row & L.MASK
        hi = row >> 16
        contrib = (L._pad_last(lo, i, 16 - i)
                   + L._pad_last(hi, i + 1, 15 - i))
        cols = contrib if cols is None else cols + contrib
    return cols


def mont_mul_pad(a, b):
    return L._redc(conv_pad(a, b))


@jax.jit
def jmul_dot(a, b):
    return L.mont_mul(a, b)


@jax.jit
def jmul_pad(a, b):
    return mont_mul_pad(a, b)


@jax.jit
def jfold4(S, r):
    return L.fold_tables(S, r)


def timed(fn, *args, reps=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else \
        fn(*args).block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    out.block_until_ready()
    return (time.time() - t0) / reps


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    rng = np.random.RandomState(0)
    limbs = rng.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    limbs[:, 15] &= 0x2FFF
    a = jnp.asarray(limbs)
    b = jnp.asarray(limbs[::-1].copy())

    # correctness cross-check on a small slice
    small_a, small_b = a[:64], b[:64]
    ref = L.unpack(jmul_dot(small_a, small_b))
    alt = L.unpack(jmul_pad(small_a, small_b))
    assert ref == alt, "pad variant mismatch"

    t_dot = timed(jmul_dot, a, b)
    t_pad = timed(jmul_pad, a, b)
    print(f"n=2^{k}  mont_mul dot: {t_dot*1e3:8.2f} ms   "
          f"({n/t_dot/1e6:6.1f} M mul/s)")
    print(f"n=2^{k}  mont_mul pad: {t_pad*1e3:8.2f} ms   "
          f"({n/t_pad/1e6:6.1f} M mul/s)")

    S = jnp.stack([a, a, a, a], axis=1)
    r = L.pack_scalar(12345)
    t_fold = timed(jfold4, S, r)
    print(f"fold4 (4 tables):    {t_fold*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
