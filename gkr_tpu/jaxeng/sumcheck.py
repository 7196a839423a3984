"""GKR layer sumcheck on the JAX device engine.

Same two-phase linear-time algorithm as the exact host engine
(gkr_tpu/sumcheck.py) with the tables held on device as Montgomery limb
arrays:

  * the four phase-1 tables (W, HA1, HA2, HM) are stacked on a trailing
    batch axis -> every fold / evaluate / multiply is ONE fused XLA program
    over a (n, t, 16) array;
  * per round, one jitted program produces the three evaluations
    g_j(0), g_j(1), g_j(2) (deg <= 2); the 96 bytes come back to the host,
    which derives the coefficient vector (structural-length rules shared
    with the host engine) and the MiMC challenge, then one jitted fold
    binds the round variable;
  * wiring tables are built by gather + scatter-add of per-gate eq weights
    in relaxed limb form, renormalized once per 2^15-gate chunk.

Programs are compiled once per (k, table-size) and cached (in-process +
persistent cache), so the Python-driven round loop costs two dispatches per
round.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from ..field import P
from ..mimc import Mimc7
from ..mle import MleStruct
from ..sumcheck import (coeffs_from_evals_deg2, make_emitter,
                        phase1_host_rounds, phase2_host_rounds,
                        round_poly_len, shape_coeffs)
from . import limbs as L

# Below this table size the remaining rounds run on the exact host engine:
# dispatch latency and per-shape compile cost dominate tiny tables, and the
# tail costs O(threshold) host multiplications total.
DEVICE_TAIL = 1 << 12


def _pallas_available() -> bool:
    """Pallas TPU kernels need a real TPU backend (no CPU interpret here)."""
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False

SCATTER_CHUNK = 1 << 15


# ------------------------------------------------------------ jitted kernels

@jax.jit
def _phase1_eval(S):
    """S: (n, 4, 16) stacked [W, HA1, HA2, HM] -> y: (3, 16) evaluations of
    the round polynomial at t = 0, 1, 2."""
    lo, hi, at2 = L.eval3_halves(S)              # each (n/2, 4, 16)
    T = jnp.stack([lo, hi, at2])                 # (3, n/2, 4, 16)
    w, ha1, ha2, hm = T[:, :, 0], T[:, :, 1], T[:, :, 2], T[:, :, 3]
    term = L.add_mod(L.mont_mul(L.add_mod(ha1, hm), w), ha2)   # (3, n/2, 16)
    return L.sum_mod(jnp.swapaxes(term, 0, 1))   # fold (n/2) leading -> (3,16)


@jax.jit
def _phase2_eval(S, wb):
    """S: (n, 3, 16) stacked [Wc, FA, FMwb]; wb: (16,) = W~(b*).
    y_t = sum FA_t*(wb + W_t) + FMwb_t*W_t."""
    lo, hi, at2 = L.eval3_halves(S)
    T = jnp.stack([lo, hi, at2])                 # (3, n/2, 3, 16)
    w, fa, fmwb = T[:, :, 0], T[:, :, 1], T[:, :, 2]
    wbb = jnp.broadcast_to(wb, w.shape)
    term = L.add_mod(L.mont_mul(fa, L.add_mod(wbb, w)),
                     L.mont_mul(fmwb, w))
    return L.sum_mod(jnp.swapaxes(term, 0, 1))


@jax.jit
def _fold(S, r):
    return L.fold_tables(S, r)


@jax.jit
def _fold_rep(S, r):
    """Shape-invariant fold ((N, t, 16) -> (N, t, 16)): fold the physical
    halves, then duplicate each entry so logical entry i occupies physical
    slots [i*rep, (i+1)*rep).  One compiled program serves every round of a
    phase (see pallas_kernels.pl_fold_rep for the rationale)."""
    half = L.fold_tables(S, r)
    return jnp.repeat(half, 2, axis=0)


@jax.jit
def _gather_weights(eqz, out_idx, mask):
    e = eqz[out_idx]
    return jnp.where(mask[:, None], e, jnp.uint32(0))


@partial(jax.jit, static_argnums=(4,))
def _scatter_pair(weights, w_table, l_idx, r_idx, n):
    """Phase-1 scatters for one gate chunk: returns (h_cnt, h_val) where
    h_cnt[b] += weight_g for l_g == b and h_val[b] += weight_g * W[r_g]."""
    zeros = jnp.zeros((n, 16), jnp.uint32)
    h_cnt = L.normalize_relaxed(zeros.at[l_idx].add(weights))
    prod = L.mont_mul(weights, w_table[r_idx])
    h_val = L.normalize_relaxed(zeros.at[l_idx].add(prod))
    return h_cnt, h_val


@partial(jax.jit, static_argnums=(4,))
def _scatter_phase2(weights, eqb, l_idx, r_idx, n):
    """F[c] += eq(z,out)*eq(b*,left) at c = right."""
    zeros = jnp.zeros((n, 16), jnp.uint32)
    e2 = L.mont_mul(weights, eqb[l_idx])
    return L.normalize_relaxed(zeros.at[r_idx].add(e2))


@jax.jit
def _add_tables(a, b):
    return L.add_mod(a, b)


@jax.jit
def _mul_tables(a, b):
    return L.mont_mul(a, b)


# --------------------------------------------------------------- gate arrays

def _gate_arrays(gates, pad_to=None):
    g = np.asarray(gates, dtype=np.int32).reshape(-1, 3)
    n = len(g)
    if pad_to is None:
        pad_to = max(1, 1 << (n - 1).bit_length()) if n else 1
    mask = np.zeros(pad_to, dtype=bool)
    mask[:n] = True
    padded = np.zeros((pad_to, 3), dtype=np.int32)
    padded[:n] = g
    return (jnp.asarray(padded[:, 0]), jnp.asarray(padded[:, 1]),
            jnp.asarray(padded[:, 2]), jnp.asarray(mask))


def _build_phase1_tables(eqz, w_dev, gates, n):
    """HA1/HVAL tables for a gate list, chunked for relaxed-limb headroom."""
    h_cnt_acc = None
    h_val_acc = None
    g = list(gates)
    if not g:
        z = jnp.zeros((n, 16), jnp.uint32)
        return z, z
    for s in range(0, len(g), SCATTER_CHUNK):
        chunk = g[s:s + SCATTER_CHUNK]
        out_i, l_i, r_i, mask = _gate_arrays(chunk)
        w = _gather_weights(eqz, out_i, mask)
        h_cnt, h_val = _scatter_pair(w, w_dev, l_i, r_i, n)
        h_cnt_acc = h_cnt if h_cnt_acc is None else _add_tables(h_cnt_acc, h_cnt)
        h_val_acc = h_val if h_val_acc is None else _add_tables(h_val_acc, h_val)
    return h_cnt_acc, h_val_acc


def _build_phase2_table(eqz, eqb, gates, n):
    acc = None
    g = list(gates)
    if not g:
        return jnp.zeros((n, 16), jnp.uint32)
    for s in range(0, len(g), SCATTER_CHUNK):
        chunk = g[s:s + SCATTER_CHUNK]
        out_i, l_i, r_i, mask = _gate_arrays(chunk)
        w = _gather_weights(eqz, out_i, mask)
        f = _scatter_phase2(w, eqb, l_i, r_i, n)
        acc = f if acc is None else _add_tables(acc, f)
    return acc


# ------------------------------------------------------------- layer prover

def _unstack_to_host(S, rep: int = 1):
    """(N, t, 16) device stack -> list of t host int tables, keeping every
    rep-th physical entry (the replicated-buffer invariant, see _fold_rep)."""
    arr = np.asarray(jax.device_get(S))[::rep]
    return [L.unpack(jnp.asarray(arr[:, ti, :])) for ti in range(arr.shape[1])]


def prove_layer_sumcheck_jax(
    z: list[int],
    w_next,                       # list[int] values OR pre-packed (n,16) dev
    add_gates, mult_gates,
    k_cur: int, k_next: int,
    w_struct: MleStruct,
    transcript: Mimc7,
    w_dev=None,
    tail_threshold: int = DEVICE_TAIL,
    use_pallas: bool | None = None,
):
    """Drop-in replacement for gkr_tpu.sumcheck.prove_layer_sumcheck running
    the table math on the JAX device.  Transcript-identical to the host
    engine (same structural-length + Fiat–Shamir logic).

    Rounds run on device while the tables are larger than `tail_threshold`;
    the residual small-table rounds finish on the exact host engine — this
    caps the number of per-shape compiled programs per layer while leaving
    only O(threshold) scalar work on the host.

    On TPU backends the per-round fold/evaluate use the fused Pallas kernels
    (gkr_tpu.jaxeng.pallas_kernels, tables transposed to limb-on-sublane
    layout); XLA kernels elsewhere."""
    k = k_next
    v = 2 * k
    assert v >= 2
    n = 1 << k
    sup = w_struct.support if not w_struct.empty else [False] * k
    has_add = len(add_gates) > 0
    has_mult = len(mult_gates) > 0

    if w_dev is None:
        w_dev = L.pack(w_next)
    eqz = L.jeq_table(L.pack(z)) if z else L.jeq_table(
        jnp.zeros((0, 16), jnp.uint32))

    ha1, ha2 = _build_phase1_tables(eqz, w_dev, add_gates, n)
    _, hm = _build_phase1_tables(eqz, w_dev, mult_gates, n)

    proof: list[list[int]] = []
    challenges: list[int] = []
    emit_host = make_emitter(proof, challenges, v, sup, has_add, has_mult,
                             transcript)

    # The device rounds run SHAPE-INVARIANT: the physical buffer keeps its
    # initial size and stores logical entry i replicated rep = 2^(round-1)
    # times (see _fold_rep).  Evaluations over the replicated buffer are
    # rep x the true sums; `scale` undoes that exactly on the host.
    inv2 = (P + 1) // 2

    def emit_dev(y, j, scale):
        y0, y1, y2 = L.unpack(y)
        emit_host(y0 * scale % P, y1 * scale % P, y2 * scale % P, j)

    if use_pallas is None:
        use_pallas = _pallas_available()
    if use_pallas:
        from . import pallas_kernels as PK

    # ---- phase 1 ----
    S1 = jnp.stack([w_dev, ha1, ha2, hm], axis=1)        # (n, 4, 16)
    if use_pallas:
        S1 = PK.to_T(S1)                                 # (4, 16, n)
    j = 1
    scale = 1
    while j <= k and (n >> (j - 1)) > tail_threshold:
        y = PK.pl_phase1_eval(S1) if use_pallas else _phase1_eval(S1)
        emit_dev(y, j, scale)
        r_dev = L.pack_scalar(challenges[-1])
        S1 = PK.pl_fold_rep(S1, r_dev) if use_pallas else _fold_rep(S1, r_dev)
        j += 1
        scale = scale * inv2 % P
    if j <= k:
        S1h = PK.from_T(S1) if use_pallas else S1
        W, HA1, HA2, HM = _unstack_to_host(S1h, rep=1 << (j - 1))
        W, *_ = phase1_host_rounds(W, HA1, HA2, HM, j, k, emit_host,
                                   challenges)
        wb_int = W[0]
        wb = L.pack_scalar(wb_int)
    else:
        wb = S1[0, :, 0] if use_pallas else S1[0, 0]     # (16,)
        wb_int = L.unpack_scalar(wb)

    b_star = challenges[:k]

    # ---- phase 2 ----
    eqb = L.jeq_table(L.pack(b_star))
    fa = _build_phase2_table(eqz, eqb, add_gates, n)
    fm = _build_phase2_table(eqz, eqb, mult_gates, n)
    fmwb = _mul_tables(fm, jnp.broadcast_to(wb, fm.shape))
    S2 = jnp.stack([w_dev, fa, fmwb], axis=1)            # (n, 3, 16)
    if use_pallas:
        S2 = PK.to_T(S2)
    j = k + 1
    scale = 1
    while j <= v and (n >> (j - k - 1)) > tail_threshold:
        y = (PK.pl_phase2_eval(S2, wb) if use_pallas
             else _phase2_eval(S2, wb))
        emit_dev(y, j, scale)
        r_dev = L.pack_scalar(challenges[-1])
        S2 = PK.pl_fold_rep(S2, r_dev) if use_pallas else _fold_rep(S2, r_dev)
        j += 1
        scale = scale * inv2 % P
    if j <= v:
        S2h = PK.from_T(S2) if use_pallas else S2
        Wc, FA, FMwb = _unstack_to_host(S2h, rep=1 << (j - k - 1))
        phase2_host_rounds(Wc, FA, FMwb, wb_int, j, v, emit_host, challenges)

    return proof, challenges
