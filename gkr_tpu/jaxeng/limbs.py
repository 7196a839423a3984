"""Exact BN254 Fr arithmetic on TPU: 16 limbs x 16 bits in uint32 lanes.

Design notes (why this maps well to TPU):
  * the VPU operates on 32-bit integer lanes; 16-bit limb products fit a
    uint32 exactly (no wrap), and column sums keep ~11 bits of headroom, so
    schoolbook multiply + Montgomery REDC run entirely in uint32 vector ops
    with static, unrolled carry chains (XLA fuses the whole chain);
  * partial-product columns are formed by one batched outer product plus a
    multiply by a constant 0/1 (256x32) column-selection matrix — a single
    integer contraction instead of 62 diagonal extractions;
  * all arrays carry a trailing limb axis of size 16; the batch axes in
    front vectorize across VPU lanes;
  * values are kept in Montgomery form (x*R mod p, R = 2^256) end-to-end;
    host<->device conversion happens only at pack/unpack boundaries;
  * additive accumulations (sumcheck reductions, wiring scatters) use
    RELAXED limbs: plain uint32 limb-wise sums with up to 2^15 summands,
    renormalized by a single wide REDC + multiply-by-R^2 — trading cheap
    vector adds for rare reductions (the HBM-bandwidth-friendly layout);
  * subtraction and the conditional-subtract both use complement-addition
    (a - b = a + (2^256-b) mod 2^256, overflow bit = compare) so the only
    sequential structure anywhere is the carry chain itself.

The reference's field layer is `halo2curves::bn256::Fr` (rust/Cargo.toml:21);
this module reproduces its arithmetic exactly (tests cross-check every op
against host big-int arithmetic).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..field import N_LIMBS, NPRIME16, P, R, R2

MASK = jnp.uint32(0xFFFF)
WIDE = 2 * N_LIMBS


def _int_to_limbs(x: int, n: int = N_LIMBS) -> np.ndarray:
    return np.array([(x >> (16 * i)) & 0xFFFF for i in range(n)],
                    dtype=np.uint32)


P_LIMBS_NP = _int_to_limbs(P)
P_LIMBS = jnp.asarray(P_LIMBS_NP)
NEG_P_LIMBS = jnp.asarray(_int_to_limbs((1 << 256) - P))
R2_LIMBS = jnp.asarray(_int_to_limbs(R2))
MONT_ONE = jnp.asarray(_int_to_limbs(R % P))          # 1 in Montgomery form
ZERO_LIMBS = jnp.zeros((N_LIMBS,), jnp.uint32)

# Column-selection matrices: flatten the (16,16) partial-product grid to 256
# and route product (i,j) into column i+j (lo parts) / i+j+1 (hi parts).
_sel_lo = np.zeros((N_LIMBS * N_LIMBS, WIDE), dtype=np.uint32)
_sel_hi = np.zeros((N_LIMBS * N_LIMBS, WIDE), dtype=np.uint32)
for _i in range(N_LIMBS):
    for _j in range(N_LIMBS):
        _sel_lo[_i * N_LIMBS + _j, _i + _j] = 1
        _sel_hi[_i * N_LIMBS + _j, _i + _j + 1] = 1
SEL_LO = jnp.asarray(_sel_lo)
SEL_HI = jnp.asarray(_sel_hi)


# --------------------------------------------------------------- host codec

PACK_DEVICE_MIN = 1 << 12    # below this the host does the *R % P directly


def pack(values, montgomery: bool = True) -> jnp.ndarray:
    """Python ints (canonical, [0,P)) -> uint32[..., 16] limb array.

    Large tables skip the host-side Montgomery conversion (a Python
    bigint modmul per element — ~3 s per 2^20 witness layer, the
    dominant stage of a full prove) and multiply by R^2 on device
    instead: v * R2 / R = v * R mod p, bit-identical."""
    import os as _os
    n = len(values)
    if (montgomery and n >= PACK_DEVICE_MIN
            and _os.environ.get("GKR_PACK_FAST", "1") == "1"):
        b = b"".join((int(v) % P).to_bytes(32, "little") for v in values)
        raw = np.frombuffer(b, dtype=np.uint16).astype(np.uint32)
        dev = jnp.asarray(raw.reshape(n, N_LIMBS))
        r2 = jnp.broadcast_to(R2_LIMBS, (n, N_LIMBS))
        try:
            import jax
            if (jax.devices()[0].platform not in ("cpu",)
                    and n % 2048 == 0):
                from . import pallas_kernels as PK
                return PK.pl_mont_mul(dev, r2)
        except Exception:  # pragma: no cover
            pass
        return jmul(dev, r2)
    vals = [int(v) % P for v in values]
    if montgomery:
        vals = [v * R % P for v in vals]
    out = np.empty((len(vals), N_LIMBS), dtype=np.uint32)
    for i, v in enumerate(vals):
        b = v.to_bytes(32, "little")
        out[i] = np.frombuffer(b, dtype=np.uint16).astype(np.uint32)
    return jnp.asarray(out)


def pack_scalar(v: int, montgomery: bool = True) -> jnp.ndarray:
    return pack([v], montgomery=montgomery)[0]


def unpack(arr, montgomery: bool = True) -> list[int]:
    """uint32[..., 16] -> list of canonical Python ints (leading axes
    flattened row-major)."""
    a = np.asarray(jax.device_get(arr), dtype=np.uint32).reshape(-1, N_LIMBS)
    out = []
    rinv = pow(R, P - 2, P)
    for row in a:
        v = int.from_bytes(row.astype(np.uint16).tobytes(), "little")
        if montgomery:
            v = v * rinv % P
        out.append(v % P)
    return out


def unpack_scalar(arr, montgomery: bool = True) -> int:
    return unpack(jnp.reshape(arr, (1, N_LIMBS)), montgomery=montgomery)[0]


# ------------------------------------------------------------- carry chains

def carry_canonical(t: jnp.ndarray, with_overflow: bool = False):
    """Propagate carries over 16 relaxed limbs -> clean 16-bit limbs
    (mod 2^256).  When `with_overflow`, also return the carry out of limb 15
    (the value div 2^256).  Wider values go through normalize_relaxed."""
    assert t.shape[-1] == N_LIMBS
    carry = jnp.zeros_like(t[..., 0])
    out = []
    for i in range(N_LIMBS):
        s = t[..., i] + carry
        out.append(s & MASK)
        carry = s >> 16
    res = jnp.stack(out, axis=-1)
    if with_overflow:
        return res, carry
    return res


def cond_sub_p(t: jnp.ndarray) -> jnp.ndarray:
    """If t >= p, subtract p (t clean, < 2p): complement-add + overflow test."""
    s, overflow = carry_canonical(t + NEG_P_LIMBS, with_overflow=True)
    return jnp.where((overflow > 0)[..., None], s, t)


# ------------------------------------------------------------ modular + / -

def add_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return cond_sub_p(carry_canonical(a + b))


def sub_mod(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a - b mod p via complement: a + p + (2^256-b), dropping the 2^256."""
    compl_b = (MASK - b)
    u = a + P_LIMBS + compl_b
    u = u.at[..., 0].add(1)
    return cond_sub_p(carry_canonical(u))   # mod-2^256 drop of the carry


def double_mod(a: jnp.ndarray) -> jnp.ndarray:
    return add_mod(a, a)


# -------------------------------------------------------- Montgomery multiply

def _pad_last(x: jnp.ndarray, before: int, after: int) -> jnp.ndarray:
    pads = [(0, 0)] * (x.ndim - 1) + [(before, after)]
    return jnp.pad(x, pads)


def _conv_columns(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Schoolbook product of two 16-limb values as 32 relaxed uint32 columns
    (each < 2^21): one batched outer product + one integer contraction."""
    p = a[..., :, None] * b[..., None, :]                 # exact in uint32
    lo = (p & MASK).reshape(*p.shape[:-2], N_LIMBS * N_LIMBS)
    hi = (p >> 16).reshape(*p.shape[:-2], N_LIMBS * N_LIMBS)
    cols = (lax.dot_general(lo, SEL_LO, (((lo.ndim - 1,), (0,)), ((), ())),
                            preferred_element_type=jnp.uint32)
            + lax.dot_general(hi, SEL_HI, (((hi.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.uint32))
    return cols


def _redc(t: jnp.ndarray) -> jnp.ndarray:
    """Montgomery reduction of (..., 32) relaxed columns (value < p*R, limbs
    < 2^31) -> canonical 16-limb value (< p), divided by R.

    Static 16-step loop; limb i is consumed at step i and never re-read, so
    its stale content after the step is irrelevant — only its carry is pushed
    to limb i+1.  Limb growth stays < 2^32 (2^31 input + 16*2^17 additions).
    """
    npr = jnp.uint32(NPRIME16)
    for i in range(N_LIMBS):
        ti_full = t[..., i]
        c = ti_full >> 16
        ti = ti_full & MASK
        m = (ti * npr) & MASK
        mp = m[..., None] * P_LIMBS          # (..., 16), exact in uint32
        lo = mp & MASK
        hi = mp >> 16
        # low 16 bits of (ti + lo[0]) are 0 by construction of m
        carry_i = ((ti + lo[..., 0]) >> 16) + c
        step = (_pad_last(lo[..., 1:], i + 1, N_LIMBS - i)
                + _pad_last(hi, i + 1, N_LIMBS - 1 - i))
        step = step.at[..., i + 1].add(carry_i)
        t = t + step
    return cond_sub_p(carry_canonical(t[..., N_LIMBS:]))


def mont_mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(aR)(bR) -> abR mod p."""
    return _redc(_conv_columns(a, b))


def normalize_relaxed(t: jnp.ndarray) -> jnp.ndarray:
    """Renormalize RELAXED limb accumulations (any limb count <= 32, limbs
    < 2^31; value < p*2^256) back to canonical Montgomery form:
    REDC(t) = t/R, then * R^2 / R = t mod p."""
    t_over_r = _redc(_pad_last(t, 0, WIDE - t.shape[-1]))
    return mont_mul(t_over_r, jnp.broadcast_to(R2_LIMBS, t_over_r.shape))


SUM_CHUNK = 1 << 15


def sum_mod(x: jnp.ndarray) -> jnp.ndarray:
    """Sum over the leading axis of (n, ..., 16) -> (..., 16), exact mod p.
    Graph size is independent of n: chunked relaxed sums + one lo/hi-split
    combine + one renormalization."""
    n = x.shape[0]
    if n == 0:
        return jnp.zeros(x.shape[1:], jnp.uint32)
    if n <= SUM_CHUNK:
        return normalize_relaxed(jnp.sum(x, axis=0, dtype=jnp.uint32))
    m = -(-n // SUM_CHUNK)
    assert m <= SUM_CHUNK, "table too large for two-stage sum"
    if m * SUM_CHUNK != n:
        x = jnp.concatenate(
            [x, jnp.zeros((m * SUM_CHUNK - n,) + x.shape[1:], jnp.uint32)], 0)
    part = jnp.sum(x.reshape((m, SUM_CHUNK) + x.shape[1:]), axis=1,
                   dtype=jnp.uint32)                     # relaxed < 2^31
    lo = jnp.sum(part & MASK, axis=0, dtype=jnp.uint32)   # < m * 2^16
    hi = jnp.sum(part >> 16, axis=0, dtype=jnp.uint32)    # < m * 2^15
    acc = _pad_last(lo, 0, 1) + _pad_last(hi, 1, 0)       # 17 relaxed limbs
    return normalize_relaxed(acc)


# ------------------------------------------------------------------- helpers

def mul_scalar(table: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Multiply every row of (..., 16) by a single (16,) scalar."""
    return mont_mul(table, jnp.broadcast_to(s, table.shape))


def fold_tables(t: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """Bind the MSB variable of a (n, ..., 16) MLE table at r: lo+r*(hi-lo).
    The fold axis is axis 0; extra batch axes (e.g. stacked tables) follow."""
    half = t.shape[0] // 2
    lo, hi = t[:half], t[half:]
    return add_mod(lo, mul_scalar(sub_mod(hi, lo), r))


def eval3_halves(t: jnp.ndarray):
    """Return (lo, hi, 2*hi - lo): the table evaluated at x_1 = 0, 1, 2."""
    half = t.shape[0] // 2
    lo, hi = t[:half], t[half:]
    at2 = add_mod(hi, sub_mod(hi, lo))
    return lo, hi, at2


def eq_table_device(z_limbs: jnp.ndarray) -> jnp.ndarray:
    """chi table over a point given as (k, 16) Montgomery limbs -> (2^k, 16).
    Built MSB-first like gkr_tpu.mle.eq_table."""
    k = z_limbs.shape[0]
    t = jnp.broadcast_to(MONT_ONE, (1, N_LIMBS))
    one = jnp.broadcast_to(MONT_ONE, (1, N_LIMBS))
    for j in range(k - 1, -1, -1):
        z = z_limbs[j]
        zc = sub_mod(one, z[None, :])[0]
        t = jnp.concatenate([mul_scalar(t, zc), mul_scalar(t, z)], axis=0)
    return t


# --------------------------------------------------------- jitted entrypoints
# The raw functions above are building blocks meant to be fused inside larger
# jitted programs (the layer sumcheck); these wrappers are for standalone use
# and tests — calling the raw versions eagerly dispatches thousands of tiny
# XLA ops and is orders of magnitude slower.

jadd = jax.jit(add_mod)
jsub = jax.jit(sub_mod)
jmul = jax.jit(mont_mul)
jsum = jax.jit(sum_mod)
jfold = jax.jit(fold_tables)
jeq_table = jax.jit(eq_table_device)
jnormalize = jax.jit(normalize_relaxed)
