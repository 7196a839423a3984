"""VPU micro-benchmark: per-op cost of u32 mul/add vs f32 on the TPU.

Isolates why limb kernels run ~7x off a 1-op/cycle estimate: if the uint32
multiply is emulated by Mosaic, multiplies dominate the Montgomery chain
and the kernels should route products through f32 (exact for <=24-bit
products) or reduce multiply counts.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python -u scripts/micro_vpu.py
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
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

N = 1 << 20
ROWS = 16
BLOCK = 1 << 11
REPS = 16          # in-register op repetitions per element


def make_bench(op_name: str):
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[:]
        b = b_ref[:]
        acc = a
        for _ in range(REPS):
            if op_name == "u32_mul":
                acc = acc * b
            elif op_name == "u32_add":
                acc = acc + b
            elif op_name == "u32_mul16":
                acc = (acc & jnp.uint32(0xFFFF)) * (b & jnp.uint32(0xFFFF))
            elif op_name == "u32_shift":
                acc = (acc >> 16) + b
            elif op_name == "f32_mul":
                acc = acc * b
            elif op_name == "f32_fma":
                acc = acc * b + a
            elif op_name == "i32_mul":
                acc = acc * b
        o_ref[:] = acc

    dtype = (jnp.float32 if op_name.startswith("f32")
             else jnp.int32 if op_name.startswith("i32") else jnp.uint32)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(N // BLOCK,),
            in_specs=[pl.BlockSpec((ROWS, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((ROWS, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((ROWS, BLOCK), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((ROWS, N), dtype),
        )(a, b)

    return run, dtype


def main():
    key = jax.random.PRNGKey(0)
    for op in ("u32_add", "u32_mul", "u32_mul16", "u32_shift",
               "i32_mul", "f32_mul", "f32_fma"):
        run, dtype = make_bench(op)
        if dtype == jnp.float32:
            a = jax.random.uniform(key, (ROWS, N), jnp.float32)
        else:
            a = jax.random.randint(key, (ROWS, N), 1, 1 << 15,
                                   jnp.int32).astype(dtype)
        b = a + (3 if dtype != jnp.float32 else 0.5)
        r = run(a, b)
        r.block_until_ready()
        best = None
        for _ in range(5):
            t0 = time.time()
            r = run(a, b)
            r.block_until_ready()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        ops = ROWS * N * REPS
        print(f"{op:10s} {best*1000:8.3f} ms  {ops/best/1e9:8.1f} Gop/s",
              flush=True)


if __name__ == "__main__":
    main()
