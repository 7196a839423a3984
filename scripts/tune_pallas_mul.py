"""Pallas mont-mul kernel experiments: block width + algorithm variants.

The production kernel (pallas_kernels._mmul_rows, 32 live accumulator
columns x block lanes) runs ~20x off a pure VPU op-count estimate —
hypothesis: vector-register spilling.  Variants:

  school/B  — current schoolbook+REDC at block width B
  cios/B    — CIOS-interleaved (18-column sliding accumulator) at width B

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/tune_pallas_mul.py
"""

from __future__ import annotations

import os
import time

import jax

_cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache-device")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from gkr_tpu.field import P, NPRIME16  # noqa: E402
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


def make_school(block):
    def kernel(a_ref, b_ref, o_ref):
        out = PK._mmul_rows(PK._rows(a_ref[:]), PK._rows(b_ref[:]))
        o_ref[:] = jnp.stack(out, axis=-2)
    return kernel


def make_cios(block):
    def kernel(a_ref, b_ref, o_ref):
        out = _mmul_rows_cios(PK._rows(a_ref[:]), PK._rows(b_ref[:]))
        o_ref[:] = jnp.stack(out, axis=-2)
    return kernel


def build(kernel, n, block):
    @jax.jit
    def run(a, b):
        return pl.pallas_call(
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
    return run


def main():
    n = 1 << 20
    rng = np.random.RandomState(0)
    limbs = rng.randint(0, 1 << 16, size=(16, n)).astype(np.uint32)
    limbs[15] &= 0x2FFF
    a = jnp.asarray(limbs)
    b = jnp.asarray(limbs[:, ::-1].copy())
    ref = None
    for name, maker in (("school", make_school), ("cios", make_cios)):
        for block in (256, 512, 1024, 2048, 4096):
            run = build(maker(block), n, block)
            out = run(a, b)
            out.block_until_ready()
            if ref is None:
                ref = np.asarray(jax.device_get(out[:, :64]))
            else:
                got = np.asarray(jax.device_get(out[:, :64]))
                assert np.array_equal(ref, got), f"{name}/{block} mismatch"
            best = 1e9
            for _ in range(5):
                t0 = time.time()
                run(a, b).block_until_ready()
                best = min(best, time.time() - t0)
            print(f"{name:7s} block={block:5d}: {best*1000:8.2f} ms "
                  f"{n/best/1e6:8.1f} M muls/s", flush=True)


if __name__ == "__main__":
    main()
