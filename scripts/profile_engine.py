"""Per-component wall-clock breakdown of the round-1 device engine on the
real TPU — identifies where the 2^20 layer-sumcheck's ~30s goes.

Run: python scripts/profile_engine.py [k]
"""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import random
import sys
import time

import jax
import jax.numpy as jnp

from gkr_tpu.field import P
from gkr_tpu.mimc import Mimc7
from gkr_tpu.jaxeng import limbs as L
from gkr_tpu.jaxeng import pallas_kernels as PK
from gkr_tpu.jaxeng.sumcheck import (_build_phase1_tables, _phase1_eval,
                                     _fold_rep, _gather_weights,
                                     _scatter_pair)


def tick(label, fn, reps=3):
    fn()  # warmup/compile
    t0 = time.time()
    for _ in range(reps):
        r = fn()
    if hasattr(r, "block_until_ready"):
        r.block_until_ready()
    elif isinstance(r, tuple):
        for x in r:
            if hasattr(x, "block_until_ready"):
                x.block_until_ready()
    dt = (time.time() - t0) / reps
    print(f"{label:40s} {dt*1000:10.2f} ms")
    return dt


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << k
    rng = random.Random(1)
    print("device:", jax.devices()[0])

    w = [rng.randrange(P) for _ in range(1 << 14)]
    t0 = time.time()
    w_dev_small = L.pack(w)
    print(f"pack 2^14 values (host codec+xfer)      {(time.time()-t0)*1000:10.2f} ms")

    # big table directly on device (synthetic, avoids 30s host codec)
    key = jax.random.PRNGKey(0)
    w_dev = jax.random.randint(key, (n, 16), 0, 1 << 16, dtype=jnp.int32).astype(jnp.uint32)
    w_dev = L.jnormalize(w_dev)
    w_dev.block_until_ready()

    z = [rng.randrange(P) for _ in range(4)]
    eqz = L.jeq_table(L.pack(z))

    gates = [(g & 15, rng.randrange(n), rng.randrange(n)) for g in range(1 << 15)]
    import numpy as np
    garr = np.asarray(gates, dtype=np.int32)
    out_i = jnp.asarray(garr[:, 0]); l_i = jnp.asarray(garr[:, 1])
    r_i = jnp.asarray(garr[:, 2]); mask = jnp.ones((1 << 15,), bool)

    tick("gather_weights (2^15 gates)", lambda: _gather_weights(eqz, out_i, mask))
    wts = _gather_weights(eqz, out_i, mask)
    d = tick("scatter_pair (2^15 gates -> 2^k)", lambda: _scatter_pair(wts, w_dev, l_i, r_i, n))
    print(f"  -> est. full build (2 tables x {n // (1<<15)} chunks): {d * (n >> 15) * 2 * 1000:.0f} ms")

    S1 = jnp.stack([w_dev, w_dev, w_dev, w_dev], axis=1)
    S1.block_until_ready()
    tick("XLA _phase1_eval (n,4,16)", lambda: _phase1_eval(S1))
    r_dev = L.pack_scalar(12345)
    tick("XLA _fold_rep (n,4,16)", lambda: _fold_rep(S1, r_dev))

    S1T = PK.to_T(S1); S1T.block_until_ready()
    tick("to_T transpose", lambda: PK.to_T(S1))
    tick("pallas pl_phase1_eval (4,16,n)", lambda: PK.pl_phase1_eval(S1T))
    tick("pallas pl_fold_rep (4,16,n)", lambda: PK.pl_fold_rep(S1T, r_dev))
    tick("pallas pl_fold true-half (4,16,n)", lambda: PK.pl_fold(S1T, r_dev))

    y = PK.pl_phase1_eval(S1T)
    t0 = time.time()
    for _ in range(5):
        vals = L.unpack(y)
    print(f"{'unpack (3,16) device->host':40s} {(time.time()-t0)/5*1000:10.2f} ms")
    t0 = time.time()
    for _ in range(5):
        L.pack_scalar(12345 + _)
    print(f"{'pack_scalar host->device':40s} {(time.time()-t0)/5*1000:10.2f} ms")
    m = Mimc7()
    t0 = time.time()
    for _ in range(5):
        m.multi_hash([vals[0], vals[1], vals[2]], 0)
    print(f"{'host MiMC multi_hash(3)':40s} {(time.time()-t0)/5*1000:10.2f} ms")

    tick("mont_mul XLA (n,16)x(n,16)", lambda: L.jmul(w_dev, w_dev))
    tick("mont_mul pallas (16,n)T", lambda: PK.pl_mont_mul_T(S1T[0], S1T[0]))


if __name__ == "__main__":
    main()
