"""Device-resident GKR layer sumcheck: the fused single-chip engine.

Per layer: two build programs (phase-1/phase-2 wiring tables), then the
round chain — large rounds as eager true-halving programs, the tail as ONE
lax.scan program — all intermediate values staying on device.  The host
never synchronizes mid-layer; per layer there is one upload of (w, z, gate
arrays) and one ~KB download of the stacked coefficients and challenges.

Why this shape (measured on the tunneled TPU v5e, scripts/profile_*.py):
  * device->host transfers run at ~0.5 MB/s through the tunnel (64 MB =
    124 s!) while uploads run ~1.2 GB/s — so the round-1 engine's
    per-round host MiMC round-trip is replaced by on-device MiMC7
    (gkr_tpu.jaxeng.mimc_dev / the Mosaic kernel) chained asynchronously;
  * XLA scatter-add is ~3.5 us/row — the round-1 chunked scatter build cost
    ~28 s of the 30 s layer time at 2^20.  Replaced by a sort+cumsum
    segment-sum (host-planned sort + limb cumsum + one boundary gather +
    shifted difference), ~25 ms per build at 2^20;
  * each program DISPATCH costs ~1 ms of enqueue latency through the
    tunnel; round 2's per-round programs (3 dispatches x 40 rounds =
    ~114 ms/layer of pure latency) are replaced by the hybrid chain
    (_run_phase_pallas): true-halving eager rounds while eval is
    VPU-compute-bound (table > SCAN_MAX), then one fixed-shape scan
    program with replicated folds for the dispatch-bound tail —
    271 ms -> 179 ms per 2^20 layer, and each Mosaic kernel compiles
    once per (n, phase) instead of once per halved size;
  * the expensive XLA MiMC scan program is compiled exactly twice (2- and
    3-coefficient variants) per process for the CPU path; the TPU path
    hashes in the in-VMEM Mosaic kernel.

The segment-sum build: for a table T[b] = sum_{g: key_g = b} weight_g,
sort gate indices by key, split each 16-bit limb of the gathered weights
into 8+8 bits so a uint32 cumulative sum cannot overflow for up to 2^23
gates, cumsum, then recover per-bucket sums as differences of the cumsum at
bucket boundaries found by searchsorted.  Exact for any gate distribution:
per-bucket totals fit in 2^29 per limb position, and differences of
monotone-per-column uint32 cumsums are exact even if the cumsum wraps.

Transcript parity: identical structural-length rules (round_poly_len /
shape_coeffs) and MiMC7-91 schedule as the exact host engine
(gkr_tpu/sumcheck.py); the host wrapper re-derives every challenge from the
returned coefficients and asserts equality, so a transcript divergence is
an immediate hard failure, never silent.

Semantics proved: the reference's per-layer sumcheck
(rust/src/gkr/sumcheck.rs:35-156 `prove_sumcheck_opt`), as the two-phase
linear-time dense equivalent.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..field import P
from ..mimc import Mimc7
from ..mle import MleStruct
from ..sumcheck import round_poly_len, shape_coeffs
from . import limbs as L
from . import mimc_dev as MD

INV2_MONT = L.pack_scalar(pow(2, P - 2, P))
SEG_CHUNK = 1 << 24          # wrap-exactness bound of one 8+8-split cumsum
MAX_GATES = 1 << 30          # int32 gate indexing (chunking removes the
                             # old 2^23 split-limb headroom wall)
PALLAS_MIN = 1 << 16         # smallest table size routed to Pallas kernels


def _pallas_platform() -> bool:
    try:
        return jax.devices()[0].platform not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


# ----------------------------------------------------------- segment build

def _seg_recombine(seg):
    """(n, 32) wrap-exact uint32 column sums (lo 8-bit parts in [:16], hi
    8-bit parts in [16:], each true value < 2^32) -> (n, 18) RELAXED
    base-2^16 limbs, each < 5 * 2^16.  value = sum lo[i] 2^16i
    + 2^8 sum hi[i] 2^16i, re-expressed limb-exactly."""
    lo = seg[:, :16]
    hi = seg[:, 16:32]
    l0 = lo & jnp.uint32(0xFFFF)                      # -> limb i
    l1 = lo >> 16                                     # -> limb i+1
    h0 = (hi & jnp.uint32(0xFF)) << 8                 # -> limb i
    h1 = (hi >> 8) & jnp.uint32(0xFFFF)               # -> limb i+1
    # top byte of the hi-part sum: (v>>24)*2^32 -> limb i+2.  (Round 4
    # placed (v>>24)<<8 at limb i+1 = *2^24 — wrong by 2^8 as soon as an
    # 8-bit column's bucket sum reached 2^24, i.e. >= ~2^16 gates in one
    # bucket: exactly the hot-bucket layers of real compiled circuits.)
    h2 = hi >> 24                                     # -> limb i+2
    return (L._pad_last(l0 + h0, 0, 2)
            + L._pad_last(l1 + h1, 1, 1)
            + L._pad_last(h2, 2, 0))


def _seg_build_planned(perm, hi_b, weights, n):
    """Segment-sum scatter replacement given a PRECOMPUTED plan.

    perm: (G,) int32 stable-sort permutation of the gate list by bucket id;
    hi_b: (n,) int32 with hi_b[b] = #gates whose bucket id is <= b (i.e.
    searchsorted(sorted_keys, b, side='right')).  weights: list of (G, 16)
    canonical Montgomery limb arrays.  Returns one (n, 18) RELAXED
    base-2^16 limb table per weight array (limbs < 2^31), such that
    normalize(T)[b] = sum_{g: keys_g == b} w_g.

    Exactness: each 16-bit limb is split into 8+8-bit columns, cumsum'd in
    wrapping uint32.  A difference of wrapped cumsums equals the true range
    sum whenever that sum < 2^32; one bucket sums at most G values < 2^8,
    so ranges of up to SEG_CHUNK = 2^24 gates are exact.  Larger gate lists
    take ceil(G / 2^24) clipped-boundary passes over the SAME cumsum (no
    recompute), accumulating per-chunk relaxed limbs (< 5 * 2^16 each, so
    up to 2^12 chunks = 2^36 gates before relaxed overflow; MAX_GATES caps
    at 2^30 for int32 indexing).  This removes the round-2 2^23 wall
    (VERDICT.md missing #3) and makes BASELINE.md's 2^24 config reachable.

    The plan depends only on the wiring (not on z or the witness), so it is
    computed once per layer on the host and cached (LayerWiring).
    """
    return _seg_sorted(hi_b, [w[perm] for w in weights], n)


def _seg_recombine_T(seg):
    """Transposed-layout _seg_recombine: (32, n) -> (18, n) relaxed limbs."""
    lo = seg[:16]
    hi = seg[16:32]
    l0 = lo & jnp.uint32(0xFFFF)
    l1 = lo >> 16
    h0 = (hi & jnp.uint32(0xFF)) << 8
    h1 = (hi >> 8) & jnp.uint32(0xFFFF)
    h2 = hi >> 24                # (v>>24)*2^32 -> limb i+2 (see row twin)
    pad = lambda x, b, a: jnp.pad(x, ((b, a), (0, 0)))  # noqa: E731
    return pad(l0 + h0, 0, 2) + pad(l1 + h1, 1, 1) + pad(h2, 2, 0)


def _shift_diff_T(H, first_col):
    """Per-bucket sums from gathered cumsum columns, (L, n) layout.

    The lo-boundary gather is redundant: lo_b[b] = hi_b[b-1], so the lo
    values are the hi-gather SHIFTED one bucket right with `first_col`
    (the cumsum at the chunk start) in front — one gather instead of two
    (measured 26 ms per (32, n) gather pair at 2^20)."""
    return H - jnp.concatenate([first_col, H[:, :-1]], axis=1)


def _shift_diff(H, first_row):
    return H - jnp.concatenate([first_row, H[:-1]], axis=0)


def _seg_sorted_T(hi_b, weights_T, n, fast: bool = False):
    """Segment-sum over (16, G) weights ALREADY SORTED by bucket key ->
    (18, n) relaxed tables feeding pl_normalize_T with no transposes.
    Sorting is pre-applied on the host (LayerWiring carries pre-permuted
    index arrays), saving one 64 MB random gather per table at 2^20.

    `fast` (static, from the wiring plan): every bucket holds < 2^16
    gates, so a per-bucket sum of 16-bit limbs is < 2^32 and the wrapping
    uint32 cumsum-difference is exact WITHOUT the 8+8 bit split or
    chunking — half the cumsum/gather traffic.  The general path splits
    limbs 8+8 and takes clipped-boundary passes per 2^24-gate chunk (see
    _seg_build_planned)."""
    G = weights_T[0].shape[-1]
    assert G <= MAX_GATES, "gate list exceeds int32 indexing cap"
    out = []
    if fast:
        for ws in weights_T:
            C = jnp.cumsum(ws, axis=1, dtype=jnp.uint32)  # wrapping
            Cz = jnp.concatenate(
                [jnp.zeros((16, 1), jnp.uint32), C], axis=1)
            seg = _shift_diff_T(Cz[:, hi_b],
                                jnp.zeros((16, 1), jnp.uint32))
            pad = lambda x, b, a: jnp.pad(x, ((b, a), (0, 0)))  # noqa: E731
            out.append(pad(seg & jnp.uint32(0xFFFF), 0, 2)
                       + pad(seg >> 16, 1, 1))
        return out
    nch = max(1, -(-G // SEG_CHUNK))
    for ws in weights_T:
        allc = jnp.concatenate(
            [ws & jnp.uint32(0xFF), ws >> 8], axis=0)     # (32, G)
        C = jnp.cumsum(allc, axis=1, dtype=jnp.uint32)    # wrapping
        Cz = jnp.concatenate(
            [jnp.zeros((32, 1), jnp.uint32), C], axis=1)
        acc = None
        for c in range(nch):
            s, e = c * SEG_CHUNK, min((c + 1) * SEG_CHUNK, G)
            hi_c = jnp.clip(hi_b, s, e)
            seg = _shift_diff_T(Cz[:, hi_c], Cz[:, s:s + 1])
            rel = _seg_recombine_T(seg)
            acc = rel if acc is None else acc + rel
        out.append(acc)
    return out


def _seg_sorted(hi_b, weights, n, fast: bool = False):
    """Row-layout _seg_sorted_T: (G, 16) sorted weights -> (n, 18)."""
    G = weights[0].shape[0]
    assert G <= MAX_GATES, "gate list exceeds int32 indexing cap"
    out = []
    if fast:
        for ws in weights:
            C = jnp.cumsum(ws, axis=0, dtype=jnp.uint32)
            Cz = jnp.concatenate(
                [jnp.zeros((1, 16), jnp.uint32), C], axis=0)
            seg = _shift_diff(Cz[hi_b], jnp.zeros((1, 16), jnp.uint32))
            out.append(L._pad_last(seg & jnp.uint32(0xFFFF), 0, 2)
                       + L._pad_last(seg >> 16, 1, 1))
        return out
    nch = max(1, -(-G // SEG_CHUNK))
    for ws in weights:
        allc = jnp.concatenate(
            [ws & jnp.uint32(0xFF), ws >> 8], axis=1)     # (G, 32)
        C = jnp.cumsum(allc, axis=0, dtype=jnp.uint32)    # wrapping
        Cz = jnp.concatenate(
            [jnp.zeros((1, 32), jnp.uint32), C], axis=0)
        acc = None
        for c in range(nch):
            s, e = c * SEG_CHUNK, min((c + 1) * SEG_CHUNK, G)
            hi_c = jnp.clip(hi_b, s, e)
            seg = _shift_diff(Cz[hi_c], Cz[s:s + 1])
            rel = _seg_recombine(seg)
            acc = rel if acc is None else acc + rel
        out.append(acc)
    return out


def _seg_build_relaxed(keys, weights, n):
    """In-trace variant of _seg_build_planned: sorts the (traced) keys and
    derives the plan on device.  Used where no host-side wiring cache is
    available (the sharded engine's per-device builds)."""
    G = keys.shape[0]
    sk, perm = lax.sort((keys, jnp.arange(G, dtype=jnp.int32)), num_keys=1)
    hi_b = jnp.searchsorted(sk, jnp.arange(n, dtype=jnp.int32), side="right")
    return _seg_build_planned(perm, hi_b, weights, n)


def _seg_build_relaxed_T(keys, weights_T, n):
    """Transposed-layout _seg_build_relaxed: weights (16, G), traced keys,
    -> (18, n) relaxed tables.  Feeds pl_normalize_T in the sharded
    engine's Pallas builds."""
    G = keys.shape[0]
    sk, perm = lax.sort((keys, jnp.arange(G, dtype=jnp.int32)), num_keys=1)
    hi_b = jnp.searchsorted(sk, jnp.arange(n, dtype=jnp.int32), side="right")
    return _seg_sorted_T(hi_b, [w[:, perm] for w in weights_T], n)


def _seg_build(keys, weights, n):
    """Canonical-table variant of _seg_build_relaxed (XLA normalize)."""
    return [L.normalize_relaxed(rel)
            for rel in _seg_build_relaxed(keys, weights, n)]


class LayerWiring(NamedTuple):
    """Per-layer wiring-derived device arrays: PRE-PERMUTED gate index
    columns plus segment boundaries for both phases.  For each phase the
    gate triples are sorted host-side by that phase's bucket key (left for
    phase 1, right for phase 2) and the companion index columns are stored
    already permuted, so the device never re-gathers gate weights by a
    sort permutation (a 64 MB random gather per table at 2^20).  Padding
    gates carry key = n, sorting past every bucket boundary — no masking
    needed anywhere.  Depends only on the circuit wiring — computed once
    per layer on the host and reused for every proof of that circuit,
    mirroring the reference's once-per-circuit wiring-MLE construction
    (rust/src/convert.rs:715-776)."""
    a1_out: jnp.ndarray       # phase 1 (keyed by left): out idx, sorted
    a1_in: jnp.ndarray        # right idx (W gather), sorted
    a1_hib: jnp.ndarray       # bucket boundaries
    m1_out: jnp.ndarray
    m1_in: jnp.ndarray
    m1_hib: jnp.ndarray
    a2_out: jnp.ndarray       # phase 2 (keyed by right): out idx, sorted
    a2_l: jnp.ndarray         # left idx (eq(b*) gather), sorted
    a2_hib: jnp.ndarray
    m2_out: jnp.ndarray
    m2_l: jnp.ndarray
    m2_hib: jnp.ndarray
    # MXU segment-sum plan (pl_seg_sum_T): sorted bucket keys (1, Gp) and
    # interleaved [bi, bi+1] window block indices per output tile.  None
    # when the plan is unavailable for that key column.
    a1_keys: jnp.ndarray | None = None
    a1_bi: jnp.ndarray | None = None
    m1_keys: jnp.ndarray | None = None
    m1_bi: jnp.ndarray | None = None
    a2_keys: jnp.ndarray | None = None
    a2_bi: jnp.ndarray | None = None
    m2_keys: jnp.ndarray | None = None
    m2_bi: jnp.ndarray | None = None
    # 4 bools (a1, m1, a2, m2): every bucket of that key column holds
    # < 2^16 gates, enabling the 16-bit segment-sum fast path.  Host-side
    # circuit constants; callers lift them into STATIC jit args (counts) —
    # as pytree leaves here they are traced-but-unused.
    fast: tuple = (False, False, False, False)
    # 4 ints (a1, m1, a2, m2): pl_seg_sum_T window block width Wb, or 0 =
    # use the cumsum fallback.  Same static-lift rule as `fast`.
    mxu: tuple = (0, 0, 0, 0)


def build_wiring(add_gates, mult_gates, n: int) -> LayerWiring:
    """Host-side wiring precompute: pad gate columns to a power of two
    (pad key = n, out of every bucket range), pre-sort the index columns
    by each phase's key, and lay out the MXU segment-sum plan (sorted
    keys + per-tile window block indices; see pl_seg_sum_T)."""
    from .pallas_kernels import SEG_NB, SEG_WB_CAP

    parts = {}
    fast = {}
    mxu = {}
    for name, gates in (("a", add_gates), ("m", mult_gates)):
        gp = _pad_pow2(len(gates))
        g = np.zeros((3, gp), dtype=np.int32)
        if gates:
            g[:, :len(gates)] = np.asarray(gates, dtype=np.int32).T
        for phase, keycol, othercol, oname in ((1, 1, 2, "in"),
                                               (2, 2, 1, "l")):
            keys = g[keycol].copy()
            keys[len(gates):] = n                  # padding: beyond buckets
            perm = np.argsort(keys, kind="stable")
            sk = keys[perm]
            hib = np.searchsorted(
                sk, np.arange(n, dtype=np.int64), side="right"
            ).astype(np.int32)
            maxb = int(np.max(np.diff(hib, prepend=0))) if n else 0
            fast[f"{name}{phase}"] = bool(maxb < (1 << 16))
            out_col = g[0][perm].astype(np.int32)
            oth_col = g[othercol][perm].astype(np.int32)
            # MXU plan: per NB-bucket tile, the sorted-gate window
            # [lo_g, hi_g) and the pow2 block width covering every span
            # (GKR_SEG_MXU=0 disables — cumsum fallback, for debugging)
            key = f"{name}{phase}"
            mxu[key] = 0
            if (n >= SEG_NB and n % SEG_NB == 0 and len(gates) > 0
                    and _os.environ.get("GKR_SEG_MXU", "1") == "1"):
                hib_z = np.concatenate([[0], hib])
                lo_g = hib_z[np.arange(0, n, SEG_NB)]
                hi_g = hib_z[np.arange(SEG_NB, n + 1, SEG_NB)]
                span = int(np.max(hi_g - lo_g)) if len(lo_g) else 0
                wb = max(512, 1 << max(0, int(span - 1).bit_length())) \
                    if span else 512
                if wb <= SEG_WB_CAP:
                    mxu[key] = wb
                    # two extra wb blocks past the last real gate: bi can
                    # point one past the last real block when a tile's
                    # window starts exactly at gp (trailing empty buckets),
                    # and the bi+1 fetch then needs a second all-pad block —
                    # both window fetches stay in bounds by construction.
                    # Then round to the downstream kernels' 2048-lane block
                    # so pl_mont_mul_T tiles evenly.
                    lane = max(wb, 2048)
                    gpad = -(-((-(-gp // wb)) * wb + 2 * wb) // lane) * lane
                    out_col = np.pad(out_col, (0, gpad - gp))
                    oth_col = np.pad(oth_col, (0, gpad - gp))
                    sk_pad = np.full(gpad, n, np.int32)
                    sk_pad[:gp] = sk
                    bi = (lo_g // wb).astype(np.int32)
                    biarr = np.empty(2 * (n // SEG_NB), np.int32)
                    biarr[0::2] = bi
                    biarr[1::2] = bi + 1
                    parts[f"{key}_keys"] = jnp.asarray(sk_pad[None, :])
                    parts[f"{key}_bi"] = jnp.asarray(biarr)
            parts[f"{key}_out"] = jnp.asarray(out_col)
            parts[f"{key}_{oname}"] = jnp.asarray(oth_col)
            parts[f"{key}_hib"] = jnp.asarray(hib)
    return LayerWiring(
        a1_out=parts["a1_out"], a1_in=parts["a1_in"], a1_hib=parts["a1_hib"],
        m1_out=parts["m1_out"], m1_in=parts["m1_in"], m1_hib=parts["m1_hib"],
        a2_out=parts["a2_out"], a2_l=parts["a2_l"], a2_hib=parts["a2_hib"],
        m2_out=parts["m2_out"], m2_l=parts["m2_l"], m2_hib=parts["m2_hib"],
        a1_keys=parts.get("a1_keys"), a1_bi=parts.get("a1_bi"),
        m1_keys=parts.get("m1_keys"), m1_bi=parts.get("m1_bi"),
        a2_keys=parts.get("a2_keys"), a2_bi=parts.get("a2_bi"),
        m2_keys=parts.get("m2_keys"), m2_bi=parts.get("m2_bi"),
        fast=(fast["a1"], fast["m1"], fast["a2"], fast["m2"]),
        mxu=(mxu["a1"], mxu["m1"], mxu["a2"], mxu["m2"]))


MUL_PALLAS_MIN = 1 << 10     # smallest (16, G) routed to the Pallas mul


def _mmul_T(aT, bT):
    """Montgomery product in (16, G) layout; Pallas above MUL_PALLAS_MIN
    (the XLA lowering costs ~42 ms per 2^20 muls, the kernel ~0.6 ms)."""
    from . import pallas_kernels as PK
    if aT.shape[-1] >= MUL_PALLAS_MIN:
        return PK.pl_mont_mul_T(aT, bT)
    return L.mont_mul(aT.T, bT.T).T


@partial(jax.jit, static_argnums=(3, 4))
def _b1_gm(w_T, z_dev, wiring, counts, n):
    """Phase-1 build stage 1 (its own dispatch): eq(z) + gathers + muls."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    eqz_T = PK.pl_eq_table_T(z_dev)
    out = [eqz_T]
    if na:
        wa = eqz_T[:, wiring.a1_out]
        out += [wa, _mmul_T(wa, w_T[:, wiring.a1_in])]
    if nm:
        wm = eqz_T[:, wiring.m1_out]
        out.append(_mmul_T(wm, w_T[:, wiring.m1_in]))
    return tuple(out)


@partial(jax.jit, static_argnums=(1, 2))
def _b1_seg(parts, counts, n, wiring):
    """Phase-1 build stage 2: segment sums (MXU plan or cumsum)."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    fa1, fm1 = counts[2], counts[3]
    wba1, wbm1 = counts[4], counts[5]
    i = 1
    out = []
    if na:
        wa, prod_a = parts[i], parts[i + 1]
        i += 2
        if wba1:
            out += PK.pl_seg_sum_T([wa, prod_a], wiring.a1_keys,
                                   wiring.a1_bi, n, wba1)
        else:
            out += _seg_sorted_T(wiring.a1_hib, [wa, prod_a], n, fast=fa1)
    if nm:
        prod_m = parts[i]
        if wbm1:
            out += PK.pl_seg_sum_T([prod_m], wiring.m1_keys,
                                   wiring.m1_bi, n, wbm1)
        else:
            out += _seg_sorted_T(wiring.m1_hib, [prod_m], n, fast=fm1)
    return tuple(out)


@partial(jax.jit, static_argnums=(2, 3))
def _b1_norm(w_T, rels, counts, n):
    """Phase-1 build stage 3: normalize + table stack."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    zt = jnp.zeros((16, n), jnp.uint32)
    i = 0
    if na:
        ha1 = PK.pl_normalize_T(rels[i])
        ha2 = PK.pl_normalize_T(rels[i + 1])
        i += 2
    else:
        ha1 = ha2 = zt
    hm = PK.pl_normalize_T(rels[i]) if nm else zt
    return jnp.stack([w_T, ha1, ha2, hm])                # (4, 16, n)


def _build_phase1(w, z_dev, wiring, counts, n, pallas=False):
    """Upload-once phase-1 prep: eqz + the HA1/HA2 (add) and HM (mult)
    tables, stacked with W into the round stack — (n, 4, 16) row layout,
    or (4, 16, n) limb-on-sublane layout when `pallas`.  On the Pallas path
    every Montgomery multiply, the eq-table build, and the normalization
    run in VMEM kernels; XLA keeps only the (pre-permuted, one-per-table)
    gathers, the cumsum, and the bit-plumbing (its lowering of the limb
    REDC chain is the round-2 build bottleneck: ~42 ms per 2^20 muls vs
    ~0.6 ms in-kernel).  Returns (S1, eqz) — the eq(z) table is reused by
    the phase-2 build.

    `counts` is STATIC: (n_add, n_mult, fast_a1, fast_m1, wb_a1, wb_m1)
    with the fast flags and MXU window widths from build_wiring.

    `w` is the (n, 16) witness table, or a ((n, 16), (16, n)) pair with
    the transpose PRE-MATERIALIZED (pl_transpose_T, once per layer).
    The Pallas path runs as THREE dispatched programs (gather+mul /
    segment sum / normalize+stack): measured 17.6 ms vs 34 ms for the
    same graph compiled as one program at 2^20 — XLA schedules the
    monolith ~2x worse around the Mosaic custom calls, and per-dispatch
    cost of a jitted program is ~0.1 ms."""
    w_dev, w_T_pre = w if isinstance(w, tuple) else (w, None)
    na, nm = counts[0], counts[1]
    fa1 = counts[2] if len(counts) > 2 else False
    fm1 = counts[3] if len(counts) > 3 else False
    wba1 = counts[4] if len(counts) > 4 else 0
    wbm1 = counts[5] if len(counts) > 5 else 0
    cfull = (na, nm, fa1, fm1, wba1, wbm1)
    if pallas:
        from . import pallas_kernels as PK
        w_T = w_T_pre if w_T_pre is not None else PK.pl_transpose_T(w_dev)
        parts = _b1_gm(w_T, z_dev, wiring, (na, nm), n)
        eqz_T = parts[0]
        rels = _b1_seg(parts, cfull, n, wiring)
        return _b1_norm(w_T, rels, (na, nm), n), eqz_T
    return _build_phase1_xla(w_dev, z_dev, wiring, cfull, n)


@partial(jax.jit, static_argnums=(3, 4))
def _build_phase1_xla(w_dev, z_dev, wiring, counts, n):
    """Row-layout (non-Pallas) phase-1 build — one program."""
    na, nm = counts[0], counts[1]
    fa1, fm1 = counts[2], counts[3]
    eqz = L.eq_table_device(z_dev)
    if na:
        wa = eqz[wiring.a1_out]
        prod_a = L.mont_mul(wa, w_dev[wiring.a1_in])
        ha1_rel, ha2_rel = _seg_sorted(wiring.a1_hib, [wa, prod_a], n,
                                       fast=fa1)
    if nm:
        wm = eqz[wiring.m1_out]
        prod_m = L.mont_mul(wm, w_dev[wiring.m1_in])
        (hm_rel,) = _seg_sorted(wiring.m1_hib, [prod_m], n, fast=fm1)
    zeros = jnp.zeros((n, 16), jnp.uint32)
    ha1 = L.normalize_relaxed(ha1_rel) if na else zeros
    ha2 = L.normalize_relaxed(ha2_rel) if na else zeros
    hm = L.normalize_relaxed(hm_rel) if nm else zeros
    S1 = jnp.stack([w_dev, ha1, ha2, hm], axis=1)        # (n, 4, 16)
    return S1, eqz


@partial(jax.jit, static_argnums=(4, 5))
def _b2_gm(w_T, b_star, eqz, wiring, counts, n):
    """Phase-2 build stage 1: eq(b*) + gathers + muls."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    eqb_T = PK.pl_eq_table_T(b_star)
    out = []
    if na:
        out.append(_mmul_T(eqz[:, wiring.a2_out], eqb_T[:, wiring.a2_l]))
    if nm:
        out.append(_mmul_T(eqz[:, wiring.m2_out], eqb_T[:, wiring.m2_l]))
    return tuple(out)


@partial(jax.jit, static_argnums=(1, 2))
def _b2_seg(parts, counts, n, wiring):
    """Phase-2 build stage 2: segment sums."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    fa2, fm2 = counts[2], counts[3]
    wba2, wbm2 = counts[4], counts[5]
    i = 0
    out = []
    if na:
        wa2 = parts[i]
        i += 1
        if wba2:
            out += PK.pl_seg_sum_T([wa2], wiring.a2_keys, wiring.a2_bi,
                                   n, wba2)
        else:
            out += _seg_sorted_T(wiring.a2_hib, [wa2], n, fast=fa2)
    if nm:
        wm2 = parts[i]
        if wbm2:
            out += PK.pl_seg_sum_T([wm2], wiring.m2_keys, wiring.m2_bi,
                                   n, wbm2)
        else:
            out += _seg_sorted_T(wiring.m2_hib, [wm2], n, fast=fm2)
    return tuple(out)


@partial(jax.jit, static_argnums=(3, 4))
def _b2_norm(w_T, rels, wb, counts, n):
    """Phase-2 build stage 3: normalize (+wb mul) + table stack."""
    from . import pallas_kernels as PK
    na, nm = counts[0], counts[1]
    zt = jnp.zeros((16, n), jnp.uint32)
    i = 0
    if na:
        fa = PK.pl_normalize_T(rels[i])
        i += 1
    else:
        fa = zt
    fmwb = PK.pl_normalize_mul_T(rels[i], wb) if nm else zt
    return jnp.stack([w_T, fa, fmwb])                    # (3, 16, n)


def _build_phase2(w, b_star, wb, eqz, wiring, counts, n, pallas=False):
    """Phase-2 prep: eq(b*) table + the FA and FM*W~(b*) tables, stacked
    with W — layouts as in _build_phase1 (`eqz` arrives in the matching
    layout: (16, 2^kc) when pallas, (2^kc, 16) otherwise).  `counts` is
    STATIC: (n_add, n_mult, fast_a2, fast_m2, wb_a2, wb_m2).  `w` as in
    _build_phase1 (bare table or (table, pre-materialized transpose));
    the Pallas path is staged into three dispatches for the same
    monolith-scheduling reason."""
    w_dev, w_T_pre = w if isinstance(w, tuple) else (w, None)
    na, nm = counts[0], counts[1]
    fa2 = counts[2] if len(counts) > 2 else False
    fm2 = counts[3] if len(counts) > 3 else False
    wba2 = counts[4] if len(counts) > 4 else 0
    wbm2 = counts[5] if len(counts) > 5 else 0
    cfull = (na, nm, fa2, fm2, wba2, wbm2)
    if pallas:
        from . import pallas_kernels as PK
        w_T = w_T_pre if w_T_pre is not None else PK.pl_transpose_T(w_dev)
        parts = _b2_gm(w_T, b_star, eqz, wiring, (na, nm), n)
        rels = _b2_seg(parts, cfull, n, wiring)
        return _b2_norm(w_T, rels, wb, (na, nm), n)
    return _build_phase2_xla(w_dev, b_star, wb, eqz, wiring, cfull, n)


@partial(jax.jit, static_argnums=(5, 6))
def _build_phase2_xla(w_dev, b_star, wb, eqz, wiring, counts, n):
    """Row-layout (non-Pallas) phase-2 build — one program."""
    na, nm = counts[0], counts[1]
    fa2, fm2 = counts[2], counts[3]
    eqb = L.eq_table_device(b_star)
    if na:
        wa2 = L.mont_mul(eqz[wiring.a2_out], eqb[wiring.a2_l])
        (fa_rel,) = _seg_sorted(wiring.a2_hib, [wa2], n, fast=fa2)
    if nm:
        wm2 = L.mont_mul(eqz[wiring.m2_out], eqb[wiring.m2_l])
        (fm_rel,) = _seg_sorted(wiring.m2_hib, [wm2], n, fast=fm2)
    zeros = jnp.zeros((n, 16), jnp.uint32)
    fa = L.normalize_relaxed(fa_rel) if na else zeros
    fm = L.normalize_relaxed(fm_rel) if nm else zeros
    fmwb = L.mont_mul(fm, jnp.broadcast_to(wb, fm.shape))
    return jnp.stack([w_dev, fa, fmwb], axis=1)          # (n, 3, 16)


# ------------------------------------------------------------- round math

def _interp3(y0, y1, y2):
    """Exact deg-2 interpolation at {0,1,2} in Montgomery limbs
    (coeffs_from_evals_deg2 on device): returns (c2, c1, c0)."""
    c2 = L.mont_mul(L.sub_mod(L.add_mod(y2, y0), L.add_mod(y1, y1)),
                    INV2_MONT)
    c1 = L.sub_mod(L.sub_mod(y1, y0), c2)
    return c2, c1, y0


@jax.jit
def _p1_round(S):
    """S: (m, 4, 16) stacked [W, HA1, HA2, HM] -> (c2, c1, c0)."""
    lo, hi, at2 = L.eval3_halves(S)
    T = jnp.stack([lo, hi, at2])                          # (3, m/2, 4, 16)
    w, ha1, ha2, hm = T[:, :, 0], T[:, :, 1], T[:, :, 2], T[:, :, 3]
    term = L.add_mod(L.mont_mul(L.add_mod(ha1, hm), w), ha2)
    y = L.sum_mod(jnp.swapaxes(term, 0, 1))               # (3, 16)
    return _interp3(y[0], y[1], y[2])


@jax.jit
def _p2_round(S, wb):
    """S: (m, 3, 16) stacked [Wc, FA, FMwb] -> (c2, c1, c0)."""
    lo, hi, at2 = L.eval3_halves(S)
    T = jnp.stack([lo, hi, at2])
    w, fa, fmwb = T[:, :, 0], T[:, :, 1], T[:, :, 2]
    wbb = jnp.broadcast_to(wb, w.shape)
    term = L.add_mod(L.mont_mul(fa, L.add_mod(wbb, w)), L.mont_mul(fmwb, w))
    y = L.sum_mod(jnp.swapaxes(term, 0, 1))
    return _interp3(y[0], y[1], y[2])


@jax.jit
def _p1_round_T(S_T):
    """Pallas-layout phase-1 round: S_T (4, 16, m) -> (3, 16) coeffs
    (c2, c1, c0) — block partial sums + one finalize kernel
    (pl_round_coeffs) instead of the ~0.4 ms of tiny XLA glue the
    normalize/sum/interp chain cost per round."""
    from . import pallas_kernels as PK
    return PK.pl_round_coeffs(PK.pl_phase1_partials(S_T), MONT_ONE_DEV())


@jax.jit
def _p2_round_T(S_T, wb):
    from . import pallas_kernels as PK
    return PK.pl_round_coeffs(PK.pl_phase2_partials(S_T, wb),
                              MONT_ONE_DEV())


_MONT_ONE_CACHE: list = []


def MONT_ONE_DEV():
    if not _MONT_ONE_CACHE:
        _MONT_ONE_CACHE.append(jnp.asarray(L.MONT_ONE))
    return _MONT_ONE_CACHE[0]


# Compiled exactly once each per process; reused for every round of every
# layer.  The MiMC scan is the only expensive-to-compile program here.
_hash2 = jax.jit(lambda c1, c0: MD.multi_hash_dev([c1, c0]))
_hash3 = jax.jit(lambda c2, c1, c0: MD.multi_hash_dev([c2, c1, c0]))

_fold = jax.jit(L.fold_tables)


PALLAS_HASH = True   # in-VMEM MiMC: 5.6 ms/hash vs 55 ms XLA scan (v5e)


def _hash_round(c2, c1, c0, length, use_pallas):
    assert length in (2, 3), "round polynomial degree out of protocol range"
    if use_pallas and PALLAS_HASH:
        from . import pallas_kernels as PK
        coeffs = [c2, c1, c0][3 - length:]
        return PK.pl_mimc_multi(jnp.stack(coeffs))
    return _hash3(c2, c1, c0) if length == 3 else _hash2(c1, c0)


from ..mimc import fast_transcript as _fast_transcript  # noqa: E402


_INV2_POWS_CACHE: dict = {}


def _inv2_pows(k: int):
    """(k, 16) Montgomery limbs of 2^-idx mod p, idx = 0..k-1 — the
    replication rescale factors for the scan phase program.  The cache
    holds HOST numpy (a jnp array created during an outer trace would
    cache a tracer)."""
    t = _INV2_POWS_CACHE.get(k)
    if t is None:
        from ..field import R
        inv2 = pow(2, P - 2, P)
        t = np.empty((k, 16), np.uint32)
        cur = 1
        for i in range(k):
            mont = cur * R % P
            t[i] = np.frombuffer(mont.to_bytes(32, "little"),
                                 dtype=np.uint16).astype(np.uint32)
            cur = cur * inv2 % P
        _INV2_POWS_CACHE[k] = t
    return jnp.asarray(t)


SCAN_MAX = 1 << 11   # table size at which the round chain enters the scan
                     # program.  The scan keeps the table at this FIXED
                     # physical size (replication), so every tail round
                     # pays SCAN_MAX-entry eval/fold work regardless of the
                     # true (halved) size; since round 4 the eager rounds
                     # are unrolled inside the SAME compiled phase program
                     # (_phase_full), so the old dispatch-cost argument for
                     # a large threshold is gone.  Lowering 2^15 -> 2^11
                     # cut the measured 2^20 layer by ~19 ms on the v5e
                     # (the scan tail was doing 15 x 2^15 entry-evals per
                     # phase where the honest halving chain does ~2^15
                     # total).


@partial(jax.jit, static_argnums=(4, 5))
def _phase_full(S_T, wb, inv_pows, is3, sched_eager, phase: int):
    """ONE compiled program for an ENTIRE sumcheck phase: the true-halving
    eager rounds UNROLLED (different table size each — still one trace)
    followed by the fixed-shape _phase_scan tail inline.  Round 3 drove
    each eager round as ~3 separate dispatches (eval, hash, fold); through
    the tunneled device each dispatch costs ~1 ms of host enqueue latency,
    so the 10 eager rounds of a 2^20 layer paid ~30 ms of pure dispatch.
    One program per phase = 2 dispatches per LAYER for the whole round
    chain.  The Mosaic kernel inventory is unchanged (the eager rounds
    already compiled one eval/fold pair per halved size).

    `sched_eager` is the static per-round coefficient-count schedule for
    the eager section; the scan tail keeps its TRACED `is3` schedule so
    one compiled tail serves every wiring of the same size."""
    from . import pallas_kernels as PK

    co_list, rs_list = [], []
    for ln in sched_eager:
        assert ln in (2, 3), "round polynomial degree out of protocol range"
        co = (_p1_round_T(S_T) if phase == 1
              else _p2_round_T(S_T, wb))               # (3, 16) c2,c1,c0
        r = PK.pl_mimc_multi(co[3 - ln:])
        co_list.append(co)
        rs_list.append(r)
        S_T = PK.pl_fold(S_T, r)
    rest = int(is3.shape[0])
    if rest:
        def body(S, xs):
            is3_j, inv_j = xs
            part = (PK.pl_phase1_partials(S) if phase == 1
                    else PK.pl_phase2_partials(S, wb))
            co = PK.pl_round_coeffs(part, inv_j)       # rescale + interp
            r = lax.cond(
                is3_j,
                lambda: PK.pl_mimc_multi(co),
                lambda: PK.pl_mimc_multi(co[1:]))
            return PK.pl_fold_rep(S, r), (co, r)

        S_T, (co_s, rs_s) = lax.scan(body, S_T, (is3, inv_pows))
        if co_list:
            co = jnp.concatenate([jnp.stack(co_list), co_s])
            rs = jnp.concatenate([jnp.stack(rs_list), rs_s])
        else:
            co, rs = co_s, rs_s
    else:
        co, rs = jnp.stack(co_list), jnp.stack(rs_list)
    return S_T, co, rs


import os as _os
FUSED_PHASE = _os.environ.get("GKR_FUSED_PHASE", "1")
if FUSED_PHASE not in ("0", "split"):
    FUSED_PHASE = "1"


def _run_phase_pallas(S_T, sched_phase, phase, wb):
    """Pallas round chain: eager true-halving rounds while the table is
    large (compute-bound), then the fixed-shape scan tail — all inside one
    compiled program (_phase_full).  Returns (final stack, (k,3,16) coeffs,
    (k,16) challenges) on device; the final stack is replication-invariant,
    so [t][:, 0] is the fully-bound value.

    GKR_FUSED_PHASE=0 drives the eager rounds as separate dispatches with
    only the tail in one scan program (the round-3 shape, for A/B)."""
    from . import pallas_kernels as PK

    kp = len(sched_phase)
    n_eager = 0
    m = S_T.shape[-1]
    while m > SCAN_MAX and n_eager < kp:
        m //= 2
        n_eager += 1
    rest = kp - n_eager
    is3 = jnp.asarray([sched_phase[n_eager + j] == 3 for j in range(rest)],
                      dtype=jnp.bool_)
    inv_pows = _inv2_pows(rest) if rest else jnp.zeros((0, 16), jnp.uint32)
    if FUSED_PHASE == "1":
        return _phase_full(S_T, wb, inv_pows, is3,
                           tuple(sched_phase[:n_eager]), phase)
    if FUSED_PHASE == "split" and n_eager and rest:
        # A/B: eager rounds as ONE program, scan tail as another — two
        # dispatches per phase instead of one
        empty3 = jnp.zeros((0,), jnp.bool_)
        empty_inv = jnp.zeros((0, 16), jnp.uint32)
        S_T, co_e, rs_e = _phase_full(S_T, wb, empty_inv, empty3,
                                      tuple(sched_phase[:n_eager]), phase)
        S_T, co_s, rs_s = _phase_full(S_T, wb, inv_pows, is3, (), phase)
        return (S_T, jnp.concatenate([co_e, co_s]),
                jnp.concatenate([rs_e, rs_s]))
    co_list, rs_list = [], []
    for idx in range(n_eager):
        co = (_p1_round_T(S_T) if phase == 1
              else _p2_round_T(S_T, wb))
        r = _hash_round(co[0], co[1], co[2], sched_phase[idx], True)
        co_list.append(co)
        rs_list.append(r)
        S_T = PK.pl_fold(S_T, r)
    S_T, co_s, rs_s = _phase_full(S_T, wb, inv_pows, is3, (), phase)
    if co_list:
        co = jnp.concatenate([jnp.stack(co_list), co_s])
        rs = jnp.concatenate([jnp.stack(rs_list), rs_s])
    else:
        co, rs = co_s, rs_s
    return S_T, co, rs


def _run_phase_xla(S, first_round, rounds, sched, phase2_wb=None,
                   use_pallas=False):
    """Eager per-round chain in row layout (XLA ops) — the CPU path and
    the small-table TPU path, where the per-size programs are cheap to
    compile and dispatch latency is negligible (CPU) or the table is tiny
    (TPU).  On TPU (`use_pallas`) the Fiat-Shamir hash still runs in the
    Mosaic MiMC kernel (the XLA scan costs ~55 ms/hash on a v5e)."""
    coeff_rows = []
    r_list = []
    for idx in range(rounds):
        j = first_round + idx
        c2, c1, c0 = (_p1_round(S) if phase2_wb is None
                      else _p2_round(S, phase2_wb))
        r = _hash_round(c2, c1, c0, sched[j - 1], use_pallas)
        coeff_rows.append(jnp.stack([c2, c1, c0]))
        r_list.append(r)
        S = _fold(S, r)
    return S, coeff_rows, r_list


def _gate_cols(gates, pad_to):
    g = np.zeros((3, pad_to), dtype=np.int32)
    if gates:
        a = np.asarray(gates, dtype=np.int32).reshape(-1, 3)
        g[:, :len(a)] = a.T
    return jnp.asarray(g)


def _pad_pow2(x: int, lo: int = 8) -> int:
    return max(lo, 1 << (max(x, 1) - 1).bit_length())


def prove_layer_sumcheck_fused(
    z: list[int],
    w_next,
    add_gates, mult_gates,
    k_cur: int, k_next: int,
    w_struct: MleStruct,
    transcript: Mimc7,
    w_dev=None,
    use_pallas: bool | None = None,
    wiring: LayerWiring | None = None,
    defer: bool = False,
    z_dev=None,
):
    """Drop-in replacement for gkr_tpu.sumcheck.prove_layer_sumcheck — a
    device-resident round chain with exactly one download per layer, the
    transcript asserted identical to the host engine's.

    `wiring` carries the circuit-static gate arrays + segment-sum plans;
    pass a cached LayerWiring to skip the per-proof host prep (the backend
    caches one per layer).

    `defer=True` returns (device_arrays, finish) WITHOUT synchronizing:
    `finish(jax.device_get(device_arrays))` produces (proof, challenges)
    with the same host Fiat-Shamir validation.  Steady-state pipelined
    proving (many instances of one circuit) enqueues every instance's
    layer programs back-to-back and pays the device->host sync once per
    BATCH instead of once per layer — on the tunneled bench host that
    sync is ~25 ms/layer, larger than the whole round chain."""
    k = k_next
    v = 2 * k
    assert v >= 2
    sup = w_struct.support if not w_struct.empty else [False] * k
    has_add = len(add_gates) > 0
    has_mult = len(mult_gates) > 0
    sched = tuple(round_poly_len(j, v, sup, has_add, has_mult)
                  for j in range(1, v + 1))

    if use_pallas is None:
        use_pallas = _pallas_platform()
    na, nm = len(add_gates), len(mult_gates)
    n = 1 << k

    if w_dev is None:
        w_dev = L.pack(w_next)
    if z_dev is None:
        # z may be a DEVICE (k_cur, 16) limb array already (the pipelined
        # prover's device-resident z-chain) — in that case pass z_dev
        z_dev = L.pack(z) if z else jnp.zeros((0, 16), jnp.uint32)
    if wiring is None:
        wiring = build_wiring(add_gates, mult_gates, n)

    pallas_build = use_pallas and n >= PALLAS_MIN
    fast = wiring.fast
    mxu = wiring.mxu
    if pallas_build:
        from . import pallas_kernels as PK
        # one materialized transpose per layer, shared by both builds
        w_arg = (w_dev, PK.pl_transpose_T(w_dev))
    else:
        w_arg = w_dev
    S1, eqz = _build_phase1(w_arg, z_dev, wiring,
                            (na, nm, fast[0], fast[1], mxu[0], mxu[1]),
                            n, pallas_build)
    if pallas_build:
        S1, co1, rs1 = _run_phase_pallas(S1, sched[:k], 1,
                                         jnp.zeros((16,), jnp.uint32))
        wb = S1[0, :, 0]          # replication-invariant final stack
        b_star = rs1
    else:
        S1, rows1, rs1_list = _run_phase_xla(S1, 1, k, sched,
                                             use_pallas=use_pallas)
        wb = S1[0, 0]
        b_star = jnp.stack(rs1_list)
        co1, rs1 = jnp.stack(rows1), b_star

    S2 = _build_phase2(w_arg, b_star, wb, eqz, wiring,
                       (na, nm, fast[2], fast[3], mxu[2], mxu[3]),
                       n, pallas_build)
    if pallas_build:
        _, co2, rs2 = _run_phase_pallas(S2, sched[k:], 2, wb)
    else:
        _, rows2, rs2_list = _run_phase_xla(S2, k + 1, k, sched, wb,
                                            use_pallas=use_pallas)
        co2, rs2 = jnp.stack(rows2), jnp.stack(rs2_list)

    def finish(host_arrays):
        h1, h2, hr1, hr2 = host_arrays
        hasher = _fast_transcript(transcript)
        flat = L.unpack(np.concatenate([h1, h2]))      # v * 3 ints
        rs_device = L.unpack(np.concatenate([hr1, hr2]))   # v ints
        proof: list[list[int]] = []
        challenges: list[int] = []
        for j in range(1, v + 1):
            full = flat[3 * (j - 1): 3 * j]
            coeffs = shape_coeffs(full, sched[j - 1])
            proof.append(coeffs)
            r = hasher.multi_hash(coeffs, 0)
            if r != rs_device[j - 1]:
                # explicit exception (not assert): must fire under -O too
                raise RuntimeError(
                    f"device/host Fiat-Shamir divergence at round {j}")
            challenges.append(r)
        return proof, challenges

    if defer:
        return (co1, co2, rs1, rs2), finish
    # ONE small download for the whole layer.
    return finish(jax.device_get((co1, co2, rs1, rs2)))
