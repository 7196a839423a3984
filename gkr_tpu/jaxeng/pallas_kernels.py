"""Pallas TPU kernels for the sumcheck hot loop.

Why: the XLA lowering of the limb arithmetic materializes the ~50
intermediate buffers of the Montgomery chain in HBM (measured ~42 ms /
2^20 muls, ~50x off speed-of-light).  These kernels keep the entire chain
in VMEM per block, so HBM traffic is just inputs + outputs.

Layout: the Pallas path keeps tables TRANSPOSED as (T, 16, n) — stack axis,
then the 16 limbs on SUBLANES, then the batch axis on the 128-wide LANES.
A (batch, 16)-minor layout would pad every vector register 16->128 and
waste 7/8 of the VPU; the transposed layout is dense.  Conversion from the
(n, T, 16) XLA-engine layout happens once per layer.

The modulus limbs are compile-time Python-int scalars (Mosaic supports
scalar-constant broadcasts; traced array constants cannot be captured).

Kernels (all exact BN254 arithmetic, Montgomery domain):
  pl_fold(S_T, r)                 bind the MSB variable of stacked tables
  pl_phase1_eval(S_T) -> y(3,16)  g_j(0),g_j(1),g_j(2) for phase 1
  pl_phase2_eval(S_T, wb) -> y    same for phase 2
  pl_mont_mul(a, b)               standalone elementwise product (tests)

Per-block partial sums are relaxed uint32 limb sums (block <= 2^13 keeps
headroom) combined and renormalized by limbs.sum_mod.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..field import NPRIME16, P, R2
from . import limbs as L

BLOCK = 1 << 11          # lanes per kernel instance (VMEM-bounded)
M16 = 0xFFFF             # python-int scalar mask (no captured constants)

P_INTS = [int(x) for x in L.P_LIMBS_NP]
NEGP_INTS = [((1 << 256) - P) >> (16 * i) & 0xFFFF for i in range(16)]
MONT_ONE_ROW = L.MONT_ONE


# ----------------------------------------------- (..., 16, n) layout math
# Mosaic has no scatter lowering, so all limb math is written over LISTS of
# row vectors (one (..., n) array per limb) with plain adds; rows are
# stacked only at kernel output.
#
# CRITICAL LAYOUT RULE (measured 8.2x, round 3): a row must be at least
# 2-D with >= 8 sublanes.  A 1-D (n,) row is laid out on ONE sublane of
# each (8, 128) vreg, so every op wastes 7/8 of the VPU.  Kernels reshape
# each (n,) limb row to (8, n/8) before doing math (`_r8`), which packs
# the row densely across sublanes; the reshape is a no-op relayout hint
# Mosaic resolves at register-allocation time, not a data shuffle per op.

def _rows(x):
    return [x[..., i, :] for i in range(16)]


def _r8(x):
    """(..., k, n) -> (..., k, 8, n/8): sublane-dense view for VPU math.

    Mosaic rejects reshaping a row EXTRACTED from a larger block (the
    relayout constraint is lost); reshaping the whole block before slicing
    is accepted, so callers reshape first and then slice rows out."""
    return x.reshape(*x.shape[:-1], 8, x.shape[-1] // 8)


def _rows8(x):
    """(..., 16, n) -> 16 sublane-dense rows of (..., 8, n/8)."""
    y = _r8(x)
    return [y[..., i, :, :] for i in range(16)]


def _carry_rows(rows):
    carry = jnp.zeros_like(rows[0])
    out = []
    for i in range(16):
        s = rows[i] + carry
        out.append(s & M16)
        carry = s >> 16
    return out, carry


def _cond_sub_rows(rows):
    s, overflow = _carry_rows([a + b for a, b in zip(rows, NEGP_INTS)])
    ge = overflow > 0
    return [jnp.where(ge, x, y) for x, y in zip(s, rows)]


def _norm_rows(rows):
    clean, _ = _carry_rows(rows)
    return _cond_sub_rows(clean)


def _add_rows(a, b):
    return _norm_rows([x + y for x, y in zip(a, b)])


def _sub_rows(a, b):
    u = [x + p + (M16 - y) for x, p, y in zip(a, P_INTS, b)]
    u[0] = u[0] + 1
    return _norm_rows(u)


def _mul_cols(a, b):
    """Schoolbook partial-product columns of two 16-row values (b may be a
    list of Python-int scalars — constants fold into the instruction
    stream)."""
    zero = jnp.zeros_like(a[0])
    cols = [zero] * 32
    for i in range(16):
        ai = a[i]
        for j in range(16):
            p = ai * b[j]                           # exact in uint32
            cols[i + j] = cols[i + j] + (p & M16)
            cols[i + j + 1] = cols[i + j + 1] + (p >> 16)
    return cols


def _redc_cols(cols):
    """Montgomery reduction of 32 relaxed columns (limbs < 2^31) ->
    canonical 16 rows (< p), value divided by R."""
    npr = NPRIME16
    for i in range(16):
        ti_full = cols[i]
        c = ti_full >> 16
        ti = ti_full & M16
        m = (ti * npr) & M16
        mp0 = m * P_INTS[0]
        carry_i = ((ti + (mp0 & M16)) >> 16) + c + (mp0 >> 16)
        cols[i + 1] = cols[i + 1] + carry_i
        for j in range(1, 16):
            mp = m * P_INTS[j]
            cols[i + j] = cols[i + j] + (mp & M16)
            cols[i + j + 1] = cols[i + j + 1] + (mp >> 16)
    return _norm_rows(cols[16:])


def _mmul_rows(a, b):
    """Montgomery product over row lists."""
    return _redc_cols(_mul_cols(a, b))


# ------------------------------------------------------------------ kernels

def _mont_mul_kernel(a_ref, b_ref, o_ref):
    block = a_ref.shape[-1]
    out = _mmul_rows(_rows8(a_ref[:]), _rows8(b_ref[:]))
    o_ref[:] = jnp.stack(out, axis=-3).reshape(16, block)


@jax.jit
def pl_mont_mul_T(a, b):
    """(16, n) x (16, n) -> (16, n)."""
    n = a.shape[-1]
    block = min(BLOCK, n)
    return pl.pallas_call(
        _mont_mul_kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
    )(a, b)


@jax.jit
def pl_mont_mul(a, b):
    """(n, 16) interface wrapper (tests/interop)."""
    return pl_mont_mul_T(a.T, b.T).T


def _mul_scalar2_kernel(t_ref, zz_ref, o_ref):
    """(16, block) x two SMEM scalars -> (2, 16, block): t*zz[0], t*zz[1].
    One fused kernel per eq-table doubling step."""
    block = t_ref.shape[-1]
    t = _rows8(t_ref[:])
    lo = _mmul_rows(t, [zz_ref[0, i] for i in range(16)])
    hi = _mmul_rows(t, [zz_ref[1, i] for i in range(16)])
    o_ref[0] = jnp.stack(lo, axis=-3).reshape(16, block)
    o_ref[1] = jnp.stack(hi, axis=-3).reshape(16, block)


def _eq_extend_T(t_T, zz):
    """One eq-table doubling: (16, m), (2, 16) -> (16, 2m) with the zc-half
    first (MSB-first order, matching limbs.eq_table_device)."""
    m = t_T.shape[-1]
    block = min(BLOCK, m)
    both = pl.pallas_call(
        _mul_scalar2_kernel,
        grid=(m // block,),
        in_specs=[pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((2, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((2, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 16, m), jnp.uint32),
    )(t_T, zz)
    return jnp.concatenate([both[0], both[1]], axis=-1)


EQ_PALLAS_MIN = 1 << 10      # rows below this stay on the XLA path


@jax.jit
def pl_eq_table_T(z_limbs):
    """chi table over (k, 16) Montgomery limbs -> (16, 2^k) transposed
    layout.  Bit-identical to limbs.eq_table_device (MSB-first); the first
    ~10 doublings run as tiny XLA ops, the large tail as in-VMEM Pallas
    scalar-multiply kernels (the XLA chain costs ~2 * 2^k REDCs — the
    dominant cost of the round-2 phase-2 build at k=20)."""
    k = z_limbs.shape[0]
    ones = jnp.broadcast_to(MONT_ONE_ROW, (k, 16))
    zc_all = L.sub_mod(ones, z_limbs)
    t = jnp.broadcast_to(MONT_ONE_ROW, (1, 16))
    j = k - 1
    while j >= 0 and t.shape[0] < EQ_PALLAS_MIN:
        t = jnp.concatenate([L.mul_scalar(t, zc_all[j]),
                             L.mul_scalar(t, z_limbs[j])], axis=0)
        j -= 1
    t_T = t.T
    while j >= 0:
        zz = jnp.stack([zc_all[j], z_limbs[j]])
        t_T = _eq_extend_T(t_T, zz)
        j -= 1
    return t_T


def _fold_kernel(lo_ref, hi_ref, r_ref, o_ref):
    tcnt, _, block = lo_ref.shape
    lo = lo_ref[:]
    hi = hi_ref[:]
    r_rows = [r_ref[0, i] for i in range(16)]       # scalars from SMEM
    lo_r = _rows8(lo)                               # (tcnt, 8, block/8)
    hi_r = _rows8(hi)
    diff = _sub_rows(hi_r, lo_r)
    prod = _mmul_rows(diff, r_rows)
    out = _add_rows(lo_r, prod)
    o_ref[:] = jnp.stack(out, axis=-3).reshape(tcnt, 16, block)


@jax.jit
def pl_fold(S_T, r):
    """S_T: (T, 16, n), r: (16,) -> (T, 16, n/2)."""
    tcnt = S_T.shape[0]
    n = S_T.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    grid = half // block
    return pl.pallas_call(
        _fold_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((tcnt, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((tcnt, 16, block),
                               lambda i, g=grid: (0, 0, i + g),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tcnt, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tcnt, 16, half), jnp.uint32),
    )(S_T, S_T, r.reshape(1, 16))


@jax.jit
def pl_fold_rep(S_T, r):
    """Shape-invariant fold: (T, 16, N) -> (T, 16, N).

    The physical buffer holds each logical entry replicated N/s times
    contiguously (s = logical table size), so the logical lo/hi halves are
    always the physical halves.  Folding then re-duplicating keeps the
    invariant and — crucially — keeps the program shape CONSTANT across all
    sumcheck rounds: one Mosaic compile per layer instead of one per table
    size (compiles dominate wall-clock at ~10s each).  Evaluations over the
    replicated buffer are 2^(j-1) x the true sums; the host rescales."""
    half = pl_fold(S_T, r)
    return jnp.repeat(half, 2, axis=-1)


def _phase1_eval_kernel(lo_ref, hi_ref, y_ref):
    lo = lo_ref[:]                                  # (4, 16, BN)
    hi = hi_ref[:]
    w0, a0, h0, m0 = (_rows8(lo[0]), _rows8(lo[1]),
                      _rows8(lo[2]), _rows8(lo[3]))
    w1, a1, h1, m1 = (_rows8(hi[0]), _rows8(hi[1]),
                      _rows8(hi[2]), _rows8(hi[3]))
    dw = _sub_rows(w1, w0)
    da = _sub_rows(a1, a0)
    dh = _sub_rows(h1, h0)
    dm = _sub_rows(m1, m0)
    wt, at, ht, mt = w0, a0, h0, m0
    acc = []
    for t in range(3):
        if t > 0:
            wt = _add_rows(wt, dw)
            at = _add_rows(at, da)
            ht = _add_rows(ht, dh)
            mt = _add_rows(mt, dm)
        prod = _mmul_rows(_add_rows(at, mt), wt)
        term = _add_rows(prod, ht)                   # 16 rows of (8, BN/8)
        # Mosaic lacks unsigned reductions; block sums fit int32 exactly
        acc.append(jnp.stack([
            jnp.sum(r.astype(jnp.int32)).astype(jnp.uint32)
            for r in term]))
    y_ref[0] = jnp.stack(acc)                        # (3, 16)


@jax.jit
def pl_phase1_eval(S_T):
    """S_T: (4, 16, n) -> y (3, 16) exact field values (Montgomery)."""
    n = S_T.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    grid = half // block
    partials = pl.pallas_call(
        _phase1_eval_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((4, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, 16, block),
                               lambda i, g=grid: (0, 0, i + g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 3, 16), jnp.uint32),
    )(S_T, S_T)
    # per-block sums are RELAXED (limb < 2^27); canonicalize before summing
    return L.sum_mod(L.normalize_relaxed(partials))


def _phase2_eval_kernel(lo_ref, hi_ref, wb_ref, y_ref):
    lo = lo_ref[:]                                  # (3, 16, BN)
    hi = hi_ref[:]
    wb = [wb_ref[0, i] for i in range(16)]          # scalars from SMEM
    w0, f0, g0 = _rows8(lo[0]), _rows8(lo[1]), _rows8(lo[2])
    w1, f1, g1 = _rows8(hi[0]), _rows8(hi[1]), _rows8(hi[2])
    dw = _sub_rows(w1, w0)
    df = _sub_rows(f1, f0)
    dg = _sub_rows(g1, g0)
    wt, fat, fmt = w0, f0, g0
    acc = []
    for t in range(3):
        if t > 0:
            wt = _add_rows(wt, dw)
            fat = _add_rows(fat, df)
            fmt = _add_rows(fmt, dg)
        wbw = _norm_rows([x + y for x, y in zip(wt, wb)])
        p1 = _mmul_rows(fat, wbw)
        p2 = _mmul_rows(fmt, wt)
        term = _add_rows(p1, p2)
        # Mosaic lacks unsigned reductions; block sums fit int32 exactly
        acc.append(jnp.stack([
            jnp.sum(r.astype(jnp.int32)).astype(jnp.uint32)
            for r in term]))
    y_ref[0] = jnp.stack(acc)


@jax.jit
def pl_phase2_eval(S_T, wb):
    n = S_T.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    grid = half // block
    partials = pl.pallas_call(
        _phase2_eval_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, 16, block),
                               lambda i, g=grid: (0, 0, i + g),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 3, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 3, 16), jnp.uint32),
    )(S_T, S_T, wb.reshape(1, 16))
    return L.sum_mod(L.normalize_relaxed(partials))


R2_INTS = [(R2 >> (16 * i)) & 0xFFFF for i in range(16)]

# ------------------------------------------- fused round-coefficient path
#
# The scan-tail rounds spent ~0.4 ms/round on XLA glue between kernels
# (normalize_relaxed + sum_mod of the per-block partials, the replication
# rescale, and _interp3 — each a chain of tiny (16,)-shaped XLA ops).
# pl_phase*_partials emit the raw relaxed block sums in (3, 16, grid)
# lane-major layout and pl_round_coeffs finishes everything (reduce,
# REDC, rescale, degree-2 interpolation) in one tiny kernel.

_R_MONT = (1 << 256) % P
INV2_INTS = [((pow(2, P - 2, P) * _R_MONT) % P >> (16 * i)) & 0xFFFF
             for i in range(16)]


def pl_phase1_partials(S_T):
    """S_T: (4, 16, n) -> (grid, 3, 16) RELAXED per-block sums (< 2^27):
    the raw output of the phase-1 eval kernel, finished by
    pl_round_coeffs instead of the XLA normalize/sum chain."""
    n = S_T.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    grid = half // block
    return pl.pallas_call(
        _phase1_eval_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((4, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((4, 16, block),
                               lambda i, g=grid: (0, 0, i + g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 3, 16), jnp.uint32),
    )(S_T, S_T)


def pl_phase2_partials(S_T, wb):
    n = S_T.shape[-1]
    half = n // 2
    block = min(BLOCK, half)
    grid = half // block
    return pl.pallas_call(
        _phase2_eval_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((3, 16, block), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((3, 16, block),
                               lambda i, g=grid: (0, 0, i + g),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((1, 3, 16), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid, 3, 16), jnp.uint32),
    )(S_T, S_T, wb.reshape(1, 16))


def _finalize_kernel(x_ref, inv_ref, o_ref):
    """(17, 128) relaxed 17-limb columns of y(t) at lanes t = 0,1,2
    (garbage elsewhere) + (1, 16) SMEM rescale scalar -> (16, 3)
    canonical degree-2 coefficients [c2 | c1 | c0] per lane.

    Only layout-safe primitives: leading-dim slicing into plain (128,)
    rows (the MiMC row-kernel pattern) and lane rolls; slicing a tiny
    (3,)-vector at a nonzero offset crashes Mosaic's layout inferer."""
    x = x_ref[:]
    zero = jnp.zeros_like(x[0])
    cols = [x[i] for i in range(17)] + [zero] * 15   # (128,) rows
    y0 = _redc_cols(cols)                            # value / R
    y0 = _mmul_rows(y0, R2_INTS)                     # canonical y(t)
    inv = [inv_ref[0, i] for i in range(16)]
    y0 = _mmul_rows(y0, inv)                         # replication rescale
    Y = jnp.stack(y0, 0)                             # (16, 128)
    Y1 = pltpu.roll(Y, 127, 1)                       # lane 0 <- y(1)
    Y2 = pltpu.roll(Y, 126, 1)                       # lane 0 <- y(2)
    y1 = [Y1[i] for i in range(16)]
    y2 = [Y2[i] for i in range(16)]
    # c2 = (y2 + y0 - 2 y1) / 2 ; c1 = y1 - y0 - c2 ; c0 = y0
    c2 = _mmul_rows(_sub_rows(_add_rows(y2, y0), _add_rows(y1, y1)),
                    INV2_INTS)
    c1 = _sub_rows(_sub_rows(y1, y0), c2)
    # valid at lane 0 of each (128,) row
    o_ref[:] = jnp.stack(
        [jnp.stack([c2[i][0], c1[i][0], y0[i][0]]) for i in range(16)])


@jax.jit
def pl_round_coeffs(partials, inv):
    """partials (G, 3, 16) relaxed block sums (< 2^27), inv (16,)
    Montgomery -> (3, 16) canonical (c2, c1, c0).

    The cross-block reduce + lo/hi 17-limb recombination are ~6 tiny XLA
    ops; the REDC + rescale + interpolation chain (the expensive glue,
    ~0.4 ms/round as plain XLA) runs in one kernel."""
    G = partials.shape[0]
    assert G <= (1 << 14), "block-reduce split bound (int32 partial sums)"
    lo = jnp.sum((partials & jnp.uint32(M16)).astype(jnp.int32), axis=0,
                 dtype=jnp.int32).astype(jnp.uint32)          # (3, 16)
    hi = jnp.sum((partials >> 16).astype(jnp.int32), axis=0,
                 dtype=jnp.int32).astype(jnp.uint32)
    cols = (jnp.pad(lo, ((0, 0), (0, 1)))
            + jnp.pad(hi, ((0, 0), (1, 0))))                  # (3, 17)
    X = jnp.zeros((17, 128), jnp.uint32).at[:, :3].set(cols.T)
    out = pl.pallas_call(
        _finalize_kernel,
        grid=(1,),
        in_specs=[pl.BlockSpec((17, 128), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((16, 3), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, 3), jnp.uint32),
    )(X, inv.reshape(1, 16))
    return out.T


def _normalize_kernel(t_ref, o_ref):
    lin, block = t_ref.shape[-2], t_ref.shape[-1]
    t8 = _r8(t_ref[:])
    rows = [t8[..., i, :, :] for i in range(lin)]
    zero = jnp.zeros_like(rows[0])
    cols = rows + [zero] * (32 - lin)
    over_r = _redc_cols(cols)                    # value / R, canonical
    out = _mmul_rows(over_r, R2_INTS)            # * R^2 / R  = value mod p
    o_ref[:] = jnp.stack(out, axis=-3).reshape(16, block)


@jax.jit
def pl_normalize_T(t):
    """Renormalize RELAXED limb accumulations, transposed layout:
    (lin, n) uint32 with lin <= 32, limbs < 2^31, value < p*2^256
    -> (16, n) canonical Montgomery.  The whole REDC chain stays in VMEM —
    the XLA lowering costs ~170 ms per 2^20-row table, this ~1 ms."""
    lin, n = t.shape
    assert lin <= 32
    block = min(BLOCK, n)
    return pl.pallas_call(
        _normalize_kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((lin, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
    )(t)


def _normalize_mul_kernel(t_ref, s_ref, o_ref):
    lin, block = t_ref.shape[-2], t_ref.shape[-1]
    t8 = _r8(t_ref[:])
    rows = [t8[..., i, :, :] for i in range(lin)]
    zero = jnp.zeros_like(rows[0])
    cols = rows + [zero] * (32 - lin)
    over_r = _redc_cols(cols)
    out = _mmul_rows(over_r, R2_INTS)
    s_rows = [s_ref[0, i] for i in range(16)]            # scalars from SMEM
    out = _mmul_rows(out, s_rows)
    o_ref[:] = jnp.stack(out, axis=-3).reshape(16, block)


@jax.jit
def pl_normalize_mul_T(t, s):
    """pl_normalize_T fused with a scalar Montgomery multiply:
    (lin, n) relaxed, (16,) scalar -> (16, n) canonical * s."""
    lin, n = t.shape
    assert lin <= 32
    block = min(BLOCK, n)
    return pl.pallas_call(
        _normalize_mul_kernel,
        grid=(n // block,),
        in_specs=[pl.BlockSpec((lin, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 16), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((16, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32),
    )(t, s.reshape(1, 16))


# ------------------------------------------------------- MXU segment sum

SEG_NB = 1 << 10         # output buckets per grid step (1024 = 8 dense vregs)
SEG_WB_CAP = 1 << 12     # max window block (VMEM bound, validated on v5e)


def _make_seg_kernel(T: int, NB: int, Wb: int):
    """Banded one-hot MXU segment sum: per output tile of NB buckets,
    per-bucket sums of T weight tables over gates SORTED by bucket key.

    out[t*NB + b] = sum_{g: key_g == t*NB+b} w_g, computed as
    (byte-planes of w)[32T, 2Wb] @ onehot(key == bucket)[2Wb, NB] on the
    MXU.  Sorted keys make the one-hot matrix block-banded: the host
    prescribes, per tile, which two Wb-blocks of the gate list cover the
    tile's buckets (scalar-prefetched block indices), so total MACs are
    O(32T * 2Wb * n) instead of O(G * n).  Exactness: bf16 holds 0..255
    and 0/1 exactly; f32 accumulates <= Wb*255 < 2^24 products exactly.

    Replaces the round-3 cumsum + boundary-gather segment build (XLA
    gather runs ~9 GB/s on this chip; measured 8 ms/table at 2^20 vs
    1.9 ms here, 2.15 ms for T=2 sharing one one-hot build)."""

    def kernel(bi_ref, w1_ref, w2_ref, k1_ref, k2_ref, o_ref):
        t = pl.program_id(0)
        base = t * NB
        w = jnp.concatenate([w1_ref[:], w2_ref[:]], axis=2)   # (T,16,2Wb)
        keys = jnp.concatenate([k1_ref[:], k2_ref[:]], axis=1)
        rows = ([(w[i] & 0xFF).astype(jnp.int32) for i in range(T)]
                + [(w[i] >> 8).astype(jnp.int32) for i in range(T)])
        lhs = jnp.concatenate(rows, axis=0)                   # (32T, 2Wb)
        lhs_b = lhs.astype(jnp.float32).astype(jnp.bfloat16)
        sub = jax.lax.broadcasted_iota(jnp.int32, (NB, 2 * Wb), 0) + base
        # NOTE: build the one-hot via bool->f32->bf16; a bf16 select
        # crashes the Mosaic compiler on this toolchain
        M_T = (sub == keys).astype(jnp.float32).astype(jnp.bfloat16)
        out = jax.lax.dot_general(lhs_b, M_T, (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc = out.astype(jnp.int32).astype(jnp.uint32)
        o_ref[:] = jnp.stack(
            [acc[16 * i:16 * (i + 1)] + (acc[16 * (T + i):16 * (T + i + 1)] << 8)
             for i in range(T)])

    return kernel


def pl_seg_sum_T(weights_T, keys, biarr, n: int, Wb: int):
    """Segment sum of T tables sharing one sorted key column.

    weights_T: list of (16, Gp) uint32 canonical limb tables, gate order
    sorted by bucket key, padded to Gp = m*Wb + Wb with key = n in the pad
    (the final Wb block guarantees the bi+1 window fetch never re-reads a
    real block — a clamped duplicate fetch would double-count).
    keys: (1, Gp) int32 sorted bucket ids.  biarr: (2*n/NB,) int32
    interleaved [bi, bi+1] window block indices per tile (host plan).
    Returns a list of (16, n) RELAXED uint32 tables (limbs < 2^31) for
    pl_normalize_T."""
    T = len(weights_T)
    NB = SEG_NB
    assert n % NB == 0 and Wb <= SEG_WB_CAP
    w = weights_T[0][None] if T == 1 else jnp.stack(weights_T)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // NB,),
        in_specs=[pl.BlockSpec((T, 16, Wb), lambda t, bi: (0, 0, bi[2 * t])),
                  pl.BlockSpec((T, 16, Wb),
                               lambda t, bi: (0, 0, bi[2 * t + 1])),
                  pl.BlockSpec((1, Wb), lambda t, bi: (0, bi[2 * t])),
                  pl.BlockSpec((1, Wb), lambda t, bi: (0, bi[2 * t + 1]))],
        out_specs=pl.BlockSpec((T, 16, NB), lambda t, bi: (0, 0, t)))
    out = pl.pallas_call(
        _make_seg_kernel(T, NB, Wb), grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((T, 16, n), jnp.uint32),
    )(biarr, w, w, keys, keys)
    return [out[i] for i in range(T)]


# ------------------------------------------------------------- MiMC7 kernel

def _pow7_rows(t):
    t2 = _mmul_rows(t, t)
    t4 = _mmul_rows(t2, t2)
    t6 = _mmul_rows(t4, t2)
    return _mmul_rows(t6, t)


# ---- block (sublane-packed) scalar math for the latency-bound MiMC chain
#
# The Fiat-Shamir hash is a SINGLE field element: row math uses one sublane
# of each vreg and a Montgomery multiply costs ~2800 sequential row ops, so
# the 91-round x 4-mul chain runs ~1 ms/hash — the dominant cost of the
# scan-tail rounds.  Packing the 16 limbs on SUBLANES as one (16, 128)
# tile computes 16 partial products per VPU op (one sublane-broadcast
# multiply + one pltpu.roll per column shift), ~3x fewer vreg-cycles.
#
# Bound discipline: _b_mul accepts inputs < 2p (clean 16-bit limbs; the
# REDC precondition 4p^2 < p*R holds for BN254: 4p ~ 0.76 * 2^256) and
# returns canonical < p; _b_add takes inputs < p and returns < p.  The
# round input h + key + constant is then < 3p, and one conditional
# subtract brings it under 2p — a valid _b_mul input.

def _b_roll(x, shift):
    return pltpu.roll(x, shift, 0)


def _b_carry(x, sublanes):
    """One sequential carry pass over `sublanes` relaxed rows of a
    (sublanes, 128) block -> clean (<2^16) limbs, plus the carry row."""
    carry = x[0] * jnp.uint32(0)
    rows = []
    for i in range(sublanes):
        s = x[i] + carry
        rows.append(s & M16)
        carry = s >> 16
    return jnp.stack(rows), carry


def _b_cond_sub(x):
    """(16, 128) clean limbs, value < 2p -> canonical < p."""
    s, overflow = _b_carry(
        jnp.stack([x[i] + jnp.uint32(NEGP_INTS[i]) for i in range(16)]), 16)
    return jnp.where(overflow > 0, s, x)


def _b_add(a, b):
    """Block modular add: inputs < p -> result < p."""
    s, _ = _b_carry(a + b, 16)
    return _b_cond_sub(s)


def _b_mul(a, b, p_block):
    """Montgomery product of (16, 128) blocks, sublane i = limb i.
    Inputs < 2p with clean limbs; output canonical < p."""
    zeros16 = jnp.zeros_like(a)
    C = jnp.concatenate([zeros16, zeros16], axis=0)      # (32,128) columns
    for j in range(16):
        bj = jnp.broadcast_to(b[j][None, :], a.shape)
        p = a * bj                                       # exact in uint32
        C = (C + _b_roll(jnp.concatenate([p & M16, zeros16], 0), j)
               + _b_roll(jnp.concatenate([p >> 16, zeros16], 0), j + 1))
    npr = jnp.uint32(NPRIME16)
    for i in range(16):
        ti_full = C[i]
        c = ti_full >> 16
        ti = ti_full & M16
        m = (ti * npr) & M16
        mb = jnp.broadcast_to(m[None, :], a.shape)
        mp = mb * p_block                                # (16,128) exact
        # low 16 bits of (ti + mp_lo[0]) vanish by construction of m;
        # fold their carry (plus ti's own high part) into column i+1
        mp0 = m * jnp.uint32(P_INTS[0])
        carry_i = ((ti + (mp0 & M16)) >> 16) + c
        mph = jnp.concatenate(
            [(mp[0:1] >> 16) + carry_i[None, :], mp[1:] >> 16, zeros16], 0)
        C = (C + _b_roll(jnp.concatenate([mp & M16, zeros16], 0), i)
               + _b_roll(mph, i + 1))
    s, _ = _b_carry(C[16:], 16)                          # value < 2p
    return _b_cond_sub(s)


def _b_pow7(t, p_block):
    t2 = _b_mul(t, t, p_block)
    t4 = _b_mul(t2, t2, p_block)
    t6 = _b_mul(t4, t2, p_block)
    return _b_mul(t6, t, p_block)


def _make_mimc_kernel_block(length: int, n_rounds: int):
    """Sublane-packed MiMC7 multi_hash: same schedule as
    _make_mimc_kernel, ~3x lower VPU latency per hash (see block math
    notes above).  Round constants arrive as a (n_rounds, 16, 128) VMEM
    block (broadcast host-side once per process)."""

    def kernel(x_ref, cts_ref, o_ref):
        sub16 = jax.lax.broadcasted_iota(jnp.uint32, (16, 128), 0)
        p_block = jnp.zeros((16, 128), jnp.uint32)
        for j in range(16):
            p_block = jnp.where(sub16 == j, jnp.uint32(P_INTS[j]), p_block)
        r = jnp.zeros((16, 128), jnp.uint32)
        for li in range(length):
            x = x_ref[li]                                # (16, 128)
            k_blk = r

            def round_body(rd, h, k_blk=k_blk):
                t, _ = _b_carry(h + k_blk + cts_ref[rd], 16)
                return _b_pow7(_b_cond_sub(t), p_block)

            t0, _ = _b_carry(x + k_blk, 16)
            h = _b_pow7(_b_cond_sub(t0), p_block)
            h = jax.lax.fori_loop(1, n_rounds, round_body, h)
            hk = _b_add(h, k_blk)
            r = _b_add(_b_add(r, x), hk)
        o_ref[:] = _b_cond_sub(r)

    return kernel


def _make_mimc_kernel(length: int, n_rounds: int):
    """MiMC7 multi_hash over `length` field elements, all 91 rounds per
    element inside one kernel (lax.fori_loop, constants from SMEM).  The
    XLA scan version costs ~60 ms per hash from per-op dispatch latency on
    tiny (16,) shapes; in-VMEM the chain runs in ~1 ms."""

    def kernel(x_ref, cts_ref, o_ref):
        r = [jnp.zeros_like(x_ref[0, 0])] * 16
        for li in range(length):
            x = [x_ref[li, i] for i in range(16)]
            k_rows = r

            def round_body(rd, h_stack, k_rows=k_rows):
                h = [h_stack[i] for i in range(16)]
                hk = _add_rows(h, k_rows)
                t = _norm_rows([hk[j] + cts_ref[rd, j] for j in range(16)])
                return jnp.stack(_pow7_rows(t))

            t0 = _add_rows(x, k_rows)
            h = jnp.stack(_pow7_rows(t0))
            h = jax.lax.fori_loop(1, n_rounds, round_body, h)
            hk = _add_rows([h[i] for i in range(16)], k_rows)
            r = _add_rows(_add_rows(r, x), hk)
        o_ref[:] = jnp.stack(r, axis=-2)

    return kernel


def _mimc_cts_smem():
    from .mimc_dev import CTS_MONT
    return CTS_MONT


_MIMC_PROGS: dict = {}

MIMC_BLOCK = False   # sublane-packed MiMC kernel (see block math notes).
                     # Measured on the v5e: 0.69 ms/hash vs 0.55 ms for the
                     # row kernel (chained marginal timing) — the roll +
                     # sublane-concat ops cost more than the op-count model
                     # predicts, so the row kernel stays the default; the
                     # block kernel is kept as a validated alternative
                     # (scripts/check_kernels.py covers both paths).


def pl_mimc_multi(x):
    """multi_hash(x, key=0) for x: (L, 16) Montgomery limbs -> (16,)."""
    length = x.shape[0]
    prog = _MIMC_PROGS.get((length, MIMC_BLOCK))
    if prog is None:
        from ..mimc import DEFAULT_ROUNDS
        if MIMC_BLOCK:
            kernel = _make_mimc_kernel_block(length, DEFAULT_ROUNDS)

            @jax.jit
            def prog(xin):
                xb = jnp.broadcast_to(xin[..., None], (length, 16, 128))
                cts = jnp.broadcast_to(
                    jnp.asarray(_mimc_cts_smem())[..., None],
                    (DEFAULT_ROUNDS, 16, 128))
                out = pl.pallas_call(
                    kernel,
                    grid=(1,),
                    in_specs=[
                        pl.BlockSpec((length, 16, 128), lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM),
                        pl.BlockSpec((DEFAULT_ROUNDS, 16, 128),
                                     lambda i: (0, 0, 0),
                                     memory_space=pltpu.VMEM)],
                    out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
                )(xb, cts)
                return out[:, 0]
        else:
            kernel = _make_mimc_kernel(length, DEFAULT_ROUNDS)

            @jax.jit
            def prog(xin):
                xb = jnp.broadcast_to(xin[..., None], (length, 16, 128))
                out = pl.pallas_call(
                    kernel,
                    grid=(1,),
                    in_specs=[pl.BlockSpec((length, 16, 128),
                                           lambda i: (0, 0, 0),
                                           memory_space=pltpu.VMEM),
                              pl.BlockSpec(memory_space=pltpu.SMEM)],
                    out_specs=pl.BlockSpec((16, 128), lambda i: (0, 0),
                                           memory_space=pltpu.VMEM),
                    out_shape=jax.ShapeDtypeStruct((16, 128), jnp.uint32),
                )(xb, _mimc_cts_smem())
                return out[:, 0]

        _MIMC_PROGS[(length, MIMC_BLOCK)] = prog
    return prog(x)


TR_BLK = 2048


def _tr_kernel(w_ref, o_ref):
    o_ref[:] = jnp.transpose(w_ref[:], (1, 0))


@jax.jit
def pl_transpose_T(w):
    """Materialized (n, 16) -> (16, n) u32 transpose as a Pallas kernel:
    0.9 ms per 2^20 rows on the v5e.  XLA fuses its transpose into the
    consumer (e.g. the build's table stack), turning a 64 MB copy into a
    ~18 ms strided write — materializing once per layer and stacking
    contiguous arrays removes that cost from BOTH phase builds."""
    n = w.shape[0]
    if n % TR_BLK:
        return jnp.transpose(w)
    return pl.pallas_call(
        _tr_kernel, grid=(n // TR_BLK,),
        in_specs=[pl.BlockSpec((TR_BLK, 16), lambda t: (t, 0))],
        out_specs=pl.BlockSpec((16, TR_BLK), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((16, n), jnp.uint32))(w)


@jax.jit
def to_T(S):
    """(n, T, 16) -> (T, 16, n)."""
    return jnp.transpose(S, (1, 2, 0))


@jax.jit
def from_T(S_T):
    return jnp.transpose(S_T, (2, 0, 1))
