"""Pallas mont-mul kernel experiments: algorithm + block-width variants.

Timing is MARGINAL (chain depth hi vs lo inside one jitted program, drained
by a scalar device_get): through the tunneled device `block_until_ready`
does not actually block and every forced sync pays a ~23 ms round trip, so
absolute per-call wall-clocks are meaningless (see bench._measure_vpu_peak).

Variants (all exact BN254 Montgomery, verified against limbs.mont_mul):
  school/B  — production schoolbook+REDC (pallas_kernels._mmul_rows,
              32 live accumulator columns), sublane-dense, block width B
  cios/B    — CIOS-interleaved (17-column sliding accumulator; lower
              register pressure, longer dependency chain)

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/tune_pallas_mul.py
"""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os
import time

import jax

# persistent compile cache: configured by gkr_tpu.jaxeng at import
# (GKR_TPU_JAX_CACHE, default ~/.cache/gkr_tpu_jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gkr_tpu.field import NPRIME16  # noqa: E402
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
from gkr_tpu.jaxeng import pallas_kernels as PK  # noqa: E402

M16 = 0xFFFF
P_INTS = [int(x) for x in L.P_LIMBS_NP]


def _mmul_rows_cios(a, b):
    """CIOS: interleave partial products with the Montgomery reduction so
    the live accumulator is 17 columns instead of 32."""
    zero = jnp.zeros_like(a[0])
    npr = NPRIME16
    t = [zero] * 17
    for j in range(16):
        bj = b[j]
        for i in range(16):
            p = a[i] * bj
            t[i] = t[i] + (p & M16)
            t[i + 1] = t[i + 1] + (p >> 16)
        t0 = t[0]
        m = ((t0 & M16) * npr) & M16
        mp0 = m * P_INTS[0]
        carry = (((t0 & M16) + (mp0 & M16)) >> 16) + (t0 >> 16) + (mp0 >> 16)
        for i in range(1, 16):
            mp = m * P_INTS[i]
            t[i] = t[i] + (mp & M16)
            t[i + 1] = t[i + 1] + (mp >> 16)
        t = t[1:] + [zero]
        t[0] = t[0] + carry
    return PK._norm_rows(t[:16])


ALGOS = {
    "school": PK._mmul_rows,
    "cios": _mmul_rows_cios,
}


def make_kernel(algo, depth):
    mm = ALGOS[algo]

    def kernel(a_ref, b_ref, o_ref):
        block = a_ref.shape[-1]
        a = PK._rows8(a_ref[:])
        b = PK._rows8(b_ref[:])
        for _ in range(depth):
            a = mm(a, b)
        o_ref[:] = jnp.stack(a, axis=-3).reshape(16, block)

    return kernel


def build(algo, depth, n, block):
    kernel = make_kernel(algo, depth)

    @jax.jit
    def run(a, b):
        r = pl.pallas_call(
            kernel,
            grid=(n // block,),
            in_specs=[pl.BlockSpec((16, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((16, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((16, block), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
        )(a, b)
        return r[:, :2], r[0, 0]
    return run


def main():
    n = 1 << 20
    lo_d, hi_d = 1, 9
    rng = np.random.RandomState(0)
    limbs = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
    limbs[15] &= 0x2FFF
    a = jnp.asarray(limbs)
    b = jnp.asarray(limbs[:, ::-1].copy())
    # reference: depth-1 result via the XLA limb engine
    ref = np.asarray(jax.device_get(
        L.mont_mul(a.T[:2], b.T[:2]))).astype(np.uint32)

    for algo in ("school", "cios"):
        for block in (512, 1024, 2048, 4096):
            try:
                head, _ = build(algo, 1, n, block)(a, b)
                got = np.asarray(jax.device_get(head)).T
                assert np.array_equal(ref, got), f"{algo}/{block} mismatch"

                def best_s(depth):
                    run = build(algo, depth, n, block)
                    _, s = run(a, b)
                    jax.device_get(s)
                    best = None
                    for _ in range(3):
                        t0 = time.time()
                        _, s = run(a, b)
                        jax.device_get(s)
                        dt = time.time() - t0
                        best = dt if best is None or dt < best else best
                    return best

                d = best_s(hi_d) - best_s(lo_d)
                if d <= 0:
                    # negative marginal time = timing noise swamped the
                    # measurement (same guard as bench._measure_vpu_peak)
                    print(f"{algo:7s} block={block:5d}: unmeasurable "
                          f"(marginal time <= 0 under noise)", flush=True)
                    continue
                per = d / (hi_d - lo_d)
                print(f"{algo:7s} block={block:5d}: {per*1000:8.2f} ms/mul-pass "
                      f"{n/per/1e6:8.1f} M muls/s", flush=True)
            except Exception as e:
                print(f"{algo:7s} block={block:5d}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
