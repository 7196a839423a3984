"""Measure candidate primitives for the wiring-table build at 2^20:
sort, gather, cumsum, searchsorted, bulk host->device transfer."""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def tick(label, fn, reps=3):
    r = fn()
    jax.block_until_ready(r)
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    jax.block_until_ready(r)
    print(f"{label:46s} {(time.time()-t0)/reps*1000:10.2f} ms")


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (n,), 0, n, dtype=jnp.int32)
    w = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    pos = jnp.arange(n, dtype=jnp.int32)

    sort2 = jax.jit(lambda i, p: lax.sort((i, p), num_keys=1))
    tick("sort_key_val 2^k (i32,i32)", lambda: sort2(idx, pos))
    skeys, perm = sort2(idx, pos)

    gather = jax.jit(lambda w, p: w[p])
    tick("gather rows (n,16) by perm", lambda: gather(w, perm))

    @jax.jit
    def split_cumsum(ws):
        lo = ws & 0xFF
        hi = ws >> 8
        both = jnp.concatenate([lo, hi], axis=1)          # (n, 32)
        return jnp.cumsum(both, axis=0, dtype=jnp.uint32)
    tick("split cumsum (n,32) axis0", lambda: split_cumsum(w))
    C = split_cumsum(w)

    @jax.jit
    def boundaries(sk):
        return jnp.searchsorted(sk, jnp.arange(n, dtype=jnp.int32), side="right")
    tick("searchsorted n-in-n", lambda: boundaries(skeys))
    hi_b = boundaries(skeys)

    @jax.jit
    def seg_extract(C, hi_b):
        Cz = jnp.concatenate([jnp.zeros((1, 32), jnp.uint32), C], axis=0)
        t_hi = Cz[hi_b]
        t_lo = jnp.concatenate([jnp.zeros((1, 32), jnp.uint32), t_hi[:-1]], axis=0)
        return t_hi - t_lo[: t_hi.shape[0]]
    tick("segment diff gathers", lambda: seg_extract(C, hi_b))

    # one-shot fused build (sort..diff) as single program
    @jax.jit
    def fused_build(idx, w):
        sk, perm = lax.sort((idx, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
        ws = w[perm]
        lo = ws & 0xFF
        hi = ws >> 8
        C = jnp.cumsum(jnp.concatenate([lo, hi], axis=1), axis=0, dtype=jnp.uint32)
        hi_b = jnp.searchsorted(sk, jnp.arange(n, dtype=jnp.int32), side="right")
        Cz = jnp.concatenate([jnp.zeros((1, 32), jnp.uint32), C], axis=0)
        t_hi = Cz[hi_b]
        t_prev = jnp.concatenate([jnp.zeros((1, 32), jnp.uint32), t_hi[:-1]], axis=0)
        return t_hi - t_prev
    tick("FUSED sort+cumsum segment build", lambda: fused_build(idx, w))

    # host->device bulk transfer
    big = np.random.randint(0, 1 << 16, size=(n, 16)).astype(np.uint32)
    dev = jax.devices()[0]
    tick("device_put 64MB (n,16) u32", lambda: jax.device_put(big, dev), reps=3)
    small = np.random.randint(0, 1 << 16, size=(1 << 16, 16)).astype(np.uint32)
    tick("device_put 4MB", lambda: jax.device_put(small, dev), reps=5)

    arr = jax.device_put(big, dev)
    t0 = time.time()
    np.asarray(jax.device_get(arr))
    print(f"{'device_get 64MB':46s} {(time.time()-t0)*1000:10.2f} ms")


if __name__ == "__main__":
    main()
