"""JaxBackend: device-resident implementation of the prover's compute
interface (layer sumcheck, MLE structure, line restriction, sparse forms).

Small tables (k <= host_threshold) fall back to the exact host engine —
dispatch latency dominates below ~2^12 entries; the device path pays off on
the large layers where the reference's rayon hot loop lives
(rust/src/gkr/sumcheck.rs:50-124)."""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from ..field import P, interpolate
from ..mle import MleStruct, line, mle_struct, restrict_to_line, sparse_from_dense
from ..sumcheck import prove_layer_sumcheck
from . import limbs as L
from .fused import LayerWiring, build_wiring, prove_layer_sumcheck_fused
from .sumcheck import prove_layer_sumcheck_jax


@jax.jit
def _mobius_dev(C):
    n = C.shape[0]
    k = n.bit_length() - 1
    for j in range(k):
        C = C.reshape((1 << j, 2, n >> (j + 1), 16))
        lo, hi = C[:, 0], C[:, 1]
        C = jnp.stack([lo, L.sub_mod(hi, lo)], axis=1)
    return C.reshape(n, 16)


@jax.jit
def _nonzero_bitmap(C):
    return jnp.any(C != 0, axis=-1)


@jax.jit
def _struct_scalars(C):
    """Reduce the Möbius coefficient table to the MleStruct ingredients ON
    DEVICE: (k,) support bits (MSB-first), max popcount over nonzero
    indices, and emptiness — k+2 scalars instead of the (n,) bitmap (a
    1 MB download per 2^20 layer on a tunneled host)."""
    n = C.shape[0]
    k = n.bit_length() - 1
    nz = jnp.any(C != 0, axis=-1)
    idx = jnp.arange(n, dtype=jnp.uint32)
    sup = jnp.stack([jnp.any(nz & (((idx >> (k - 1 - j)) & 1) == 1))
                     for j in range(k)]) if k else jnp.zeros((0,), bool)
    # SWAR popcount (n < 2^32)
    v = idx
    v = v - ((v >> 1) & jnp.uint32(0x55555555))
    v = (v & jnp.uint32(0x33333333)) + ((v >> 2) & jnp.uint32(0x33333333))
    v = (v + (v >> 4)) & jnp.uint32(0x0F0F0F0F)
    pop = (v * jnp.uint32(0x01010101)) >> 24
    maxdeg = jnp.max(jnp.where(nz, pop, jnp.uint32(0)))
    return sup, maxdeg, jnp.any(nz)


@jax.jit
def _from_mont(C):
    """(xR) limbs -> canonical x limbs: one REDC (divide by R)."""
    return L._redc(L._pad_last(C, 0, 16))


def _multi_point_fold(W, pts):
    """Evaluate the MLE of W (n, 16) at npts points (npts, k, 16).
    The per-step Montgomery multiplies route through the Pallas kernel
    on TPU (the XLA limb lowering costs ~42 ms per 2^20 muls — the
    dominant restrict_to_line cost at 2^20).  GKR_FOLD_PALLAS=0 routes
    the multiplies through the XLA lowering instead (A/B knob); it is
    read here, OUTSIDE the jit, and passed as a static argument so
    toggling it between calls takes effect (the compiled program is
    cached per flag value, not stuck at whatever the first trace saw)."""
    from .fused import _pallas_platform

    import os as _os
    use_pallas = (_pallas_platform()
                  and _os.environ.get("GKR_FOLD_PALLAS", "1") == "1")
    return _multi_point_fold_impl(W, pts, use_pallas)


@functools.partial(jax.jit, static_argnums=(2,))
def _multi_point_fold_impl(W, pts, use_pallas):
    npts = pts.shape[0]
    n = W.shape[0]
    k = pts.shape[1]
    T = jnp.broadcast_to(W, (npts, n, 16))
    for j in range(k):
        half = T.shape[1] // 2
        lo, hi = T[:, :half], T[:, half:]
        diff = L.sub_mod(hi, lo)
        r = jnp.broadcast_to(pts[:, j][:, None, :], diff.shape)
        flat = npts * half
        if use_pallas and flat % 2048 == 0:
            from . import pallas_kernels as PK
            prod = PK.pl_mont_mul(
                diff.reshape(flat, 16), r.reshape(flat, 16)
            ).reshape(npts, half, 16)
        else:
            prod = L.mont_mul(diff, r)
        T = L.add_mod(lo, prod)
    return T[:, 0]


class JaxBackend:
    """Device compute backend.  Caches packed tables per layer index."""

    def __init__(self, host_threshold: int = 10, tail_threshold: int | None = None,
                 fused: bool = True):
        from .sumcheck import DEVICE_TAIL
        self.host_threshold = host_threshold
        self.tail_threshold = DEVICE_TAIL if tail_threshold is None else tail_threshold
        self.fused = fused
        self._packed: dict[int, jnp.ndarray] = {}
        # circuit-static wiring plans; guarded by gate-list identity, so it
        # survives reset_cache() (stale reuse across circuits is impossible:
        # a different circuit passes different list objects)
        self._wiring: dict[int, tuple] = {}

    # -- helpers ----------------------------------------------------------

    def _use_host(self, k: int) -> bool:
        return k <= self.host_threshold

    def reset_cache(self) -> None:
        """Called by prove() at proof start: the per-layer packed-table
        cache must not leak between circuits (two same-sized layers of
        different circuits would otherwise silently share a table)."""
        self._packed = {}

    def wiring(self, layer_idx, add_gates, mult_gates, n) -> LayerWiring:
        """Circuit-static wiring plans, keyed by gate-list IDENTITY plus
        lengths and table size.  Gate lists are treated as immutable once a
        layer is proved — mutating a layer's gate lists in place between
        proofs of the same Circuit object is unsupported (the extra length
        key below catches the append/remove case, but an in-place element
        overwrite on the same list object is undetectable without hashing
        every gate; build a fresh Circuit instead)."""
        ent = self._wiring.get(layer_idx)
        if (ent is not None and ent[0] is add_gates and ent[1] is mult_gates
                and ent[3] == n
                and ent[4] == (len(add_gates), len(mult_gates))):
            return ent[2]
        w = build_wiring(add_gates, mult_gates, n)
        self._wiring[layer_idx] = (add_gates, mult_gates, w, n,
                                   (len(add_gates), len(mult_gates)))
        return w

    def packed(self, layer_idx: int, w_values) -> jnp.ndarray:
        t = self._packed.get(layer_idx)
        if t is None or t.shape[0] != len(w_values):
            t = L.pack(w_values)
            self._packed[layer_idx] = t
        return t

    # -- prover interface -------------------------------------------------

    def mle_struct(self, w_values, layer_idx: int | None = None) -> MleStruct:
        k = (len(w_values)).bit_length() - 1
        if self._use_host(k):
            return mle_struct(w_values)
        W = self.packed(layer_idx, w_values) if layer_idx is not None else L.pack(w_values)
        sup, maxdeg, any_nz = jax.device_get(_struct_scalars(_mobius_dev(W)))
        if not bool(any_nz):
            return MleStruct(k, True, [False] * k, 0)
        return MleStruct(k, False, [bool(x) for x in np.asarray(sup)],
                         int(maxdeg))

    def layer_sumcheck(self, z, w_next, add_gates, mult_gates,
                       k_cur, k_next, w_struct, transcript,
                       layer_idx: int | None = None):
        if self._use_host(k_next):
            return prove_layer_sumcheck(z, w_next, add_gates, mult_gates,
                                        k_cur, k_next, w_struct, transcript)
        w_dev = self.packed(layer_idx, w_next) if layer_idx is not None else None
        if self.fused:
            wiring = (self.wiring(layer_idx, add_gates, mult_gates,
                                  1 << k_next)
                      if layer_idx is not None else None)
            return prove_layer_sumcheck_fused(z, w_next, add_gates,
                                              mult_gates, k_cur, k_next,
                                              w_struct, transcript,
                                              w_dev=w_dev, wiring=wiring)
        return prove_layer_sumcheck_jax(z, w_next, add_gates, mult_gates,
                                        k_cur, k_next, w_struct, transcript,
                                        w_dev=w_dev,
                                        tail_threshold=self.tail_threshold)

    def restrict_to_line(self, w_values, b, c, struct,
                         layer_idx: int | None = None):
        k = len(b)
        if self._use_host(k):
            return restrict_to_line(w_values, b, c, struct)
        if struct.empty:
            return [0]
        deg = struct.maxdeg
        pts = [line(b, c, t) for t in range(deg + 1)]
        flat = [x for pt in pts for x in pt]
        pts_dev = L.pack(flat).reshape(deg + 1, k, 16)
        W = self.packed(layer_idx, w_values) if layer_idx is not None else L.pack(w_values)
        ys = L.unpack(_multi_point_fold(W, pts_dev))
        return interpolate(list(zip(range(deg + 1), ys)))

    def sparse_from_dense(self, w_values):
        """Möbius transform + nonzero compaction -> lazy SparseMle.

        The RESULT must live on the host (it goes into the serialized
        proof), and the source values already do — so the C++ transform
        (native.engine.sparse_from_dense_native) wins whenever libgkrhost
        is available: a device transform downloads the whole table
        (~8 s per 2^16 layer through the tunneled link).  Fallbacks:
        device Möbius + compaction, then the exact host path for small
        tables (dispatch latency dominates)."""
        from ..mle import SparseMle

        n = len(w_values)
        k = n.bit_length() - 1
        if self._use_host(k):
            return sparse_from_dense(w_values)
        try:
            from ..native.engine import sparse_from_dense_native
            sp = sparse_from_dense_native(w_values)
            if sp is not None:
                return sp
        except Exception:
            pass
        C = _mobius_dev(L.pack(w_values))
        nz = np.nonzero(np.asarray(jax.device_get(_nonzero_bitmap(C))))[0]
        rows = np.asarray(jax.device_get(
            _from_mont(C[jnp.asarray(nz, dtype=jnp.int32)])))
        return SparseMle(k, nz, rows)


# ------------------------------------------------------- pipelined prover

def prove_pipelined(circuit, w_values, transcript=None,
                    backend: "JaxBackend | None" = None,
                    z0=None, materialize_sparse: bool = True):
    """Device-resident full prove with BATCHED synchronization.

    `gkr_tpu.prover.prove` syncs the device once per layer (struct fetch,
    coefficient download, and the host z-chain feeding the next build);
    through the tunneled bench host each sync costs ~25 ms — more than an
    entire small layer's round chain.  This walk keeps the whole
    z-chain ON DEVICE (z_{i+1} = b* + (c* - b*) * r*, with r* = the
    in-VMEM MiMC hash of the final round coefficients) and enqueues every
    layer's programs back-to-back, paying exactly TWO device->host syncs
    per proof:

      1. the struct pass (per-layer Möbius support scalars — needed on
         the host to fix the structural round-length schedule before the
         chain is enqueued), and
      2. one download of every layer's coefficients/challenges/q-points
         at the end.

    The host then re-validates the complete Fiat-Shamir transcript
    (coefficients re-hashed with the host MiMC; divergence raises) and
    assembles the same `Proof` object `prove` produces — transcripts are
    bit-identical (tests/test_pipelined.py).

    Mirrors the layer walk of rust/src/gkr/prover.rs:6-96 with the
    aggregation loop's batching (rust/src/aggregator.rs:350-355) folded
    into the device queue.
    """
    from ..field import interpolate
    from ..mimc import Mimc7
    from ..mle import line
    from ..proof import Proof
    from ..sumcheck import shape_coeffs
    from . import fused as F

    if transcript is None:
        transcript = Mimc7()
    if backend is None:
        backend = JaxBackend()
    backend.reset_cache()
    depth = circuit.depth()
    assert len(w_values) == depth + 1

    # ---- pass 1: packed tables + struct scalars, ONE sync --------------
    packed = [None] + [backend.packed(i, w_values[i])
                       for i in range(1, depth + 1)]
    struct_dev = [_struct_scalars(_mobius_dev(packed[i + 1]))
                  for i in range(depth)]
    struct_host = jax.device_get(struct_dev)
    structs = []
    for (sup, maxdeg, any_nz), wv in zip(struct_host, w_values[1:]):
        k = len(wv).bit_length() - 1
        if not bool(any_nz):
            structs.append(MleStruct(k, True, [False] * k, 0))
        else:
            structs.append(MleStruct(k, False,
                                     [bool(x) for x in np.asarray(sup)],
                                     int(maxdeg)))

    # ---- pass 2: enqueue the full layer chain, no syncs ----------------
    use_pallas = F._pallas_platform()
    k0 = circuit.k(0)
    z0_host = list(z0) if z0 is not None else [0] * k0
    z_dev = L.pack(z0_host) if k0 else jnp.zeros((0, 16), jnp.uint32)
    per_layer = []
    for i in range(depth):
        layer = circuit.layers[i]
        k_next = circuit.k(i + 1)
        struct = structs[i]
        wiring = backend.wiring(i + 1, layer.add_gates, layer.mult_gates,
                                1 << k_next)
        dev_arrays, finish = F.prove_layer_sumcheck_fused(
            None, w_values[i + 1], layer.add_gates, layer.mult_gates,
            layer.k_cur, k_next, struct, transcript,
            w_dev=packed[i + 1], wiring=wiring, defer=True, z_dev=z_dev)
        co1, co2, rs1, rs2 = dev_arrays
        # r* = MiMC(final round coeffs) — the line challenge, on device
        sup = struct.support if not struct.empty else [False] * k_next
        from ..sumcheck import round_poly_len
        ln_last = round_poly_len(2 * k_next, 2 * k_next, sup,
                                 len(layer.add_gates) > 0,
                                 len(layer.mult_gates) > 0)
        last = co2[-1]
        r_star_dev = F._hash_round(last[0], last[1], last[2], ln_last,
                                   use_pallas)
        # z_{i+1} = b* + (c* - b*) r*  (device limbs, feeds next build)
        b_dev, c_dev = rs1, rs2
        diff = L.sub_mod(c_dev, b_dev)
        z_dev = L.add_mod(b_dev, L.mont_mul(
            diff, jnp.broadcast_to(r_star_dev, diff.shape)))
        # q_i = W~ restricted to the line: evaluate at deg+1 points of
        # l(t) = b* + (c* - b*) t and interpolate on the host later
        if struct.empty:
            ys_dev = None
        else:
            deg = struct.maxdeg
            t_rows = [L.pack_scalar(t) for t in range(deg + 1)]
            pts = jnp.stack([
                L.add_mod(b_dev, L.mont_mul(
                    diff, jnp.broadcast_to(t_rows[t], diff.shape)))
                for t in range(deg + 1)])
            ys_dev = _multi_point_fold(packed[i + 1], pts)
        per_layer.append((dev_arrays, finish, r_star_dev, ys_dev, struct))

    # ---- one download for the whole proof ------------------------------
    fetch = [(da, rsd, ys) for (da, _fin, rsd, ys, _s) in per_layer]
    host = jax.device_get(fetch)

    # ---- host-side Fiat-Shamir validation + assembly -------------------
    from ..mimc import fast_transcript
    hasher = fast_transcript(transcript)
    z_chain = [z0_host]
    sumcheck_proofs, sumcheck_r, q, r_stars = [], [], [], []
    for i in range(depth):
        (_da, finish, _rsd, _ysd, struct) = per_layer[i]
        (host_da, host_rstar, host_ys) = host[i]
        proof_i, chal_i = finish(host_da)
        sumcheck_proofs.append(proof_i)
        sumcheck_r.append(chal_i)
        k_next = circuit.k(i + 1)
        b_star, c_star = chal_i[:k_next], chal_i[k_next:]
        r_star = hasher.multi_hash(proof_i[-1], 0)
        if r_star != L.unpack(host_rstar.reshape(1, 16))[0]:
            raise RuntimeError(
                f"device/host Fiat-Shamir divergence at layer {i} r*")
        r_stars.append(r_star)
        z_chain.append(line(b_star, c_star, r_star))
        if struct.empty:
            q.append([0])
        else:
            ys = L.unpack(host_ys)
            q.append(interpolate(list(zip(range(struct.maxdeg + 1), ys))))

    if materialize_sparse:
        d_sparse = backend.sparse_from_dense(w_values[0])
        input_sparse = backend.sparse_from_dense(w_values[depth])
    else:
        d_sparse, input_sparse = [], []

    return Proof(
        sumcheck_proofs=sumcheck_proofs,
        sumcheck_r=sumcheck_r,
        d=d_sparse,
        q=q,
        z=z_chain,
        r=r_stars,
        depth=depth + 1,
        input_func=input_sparse,
        k=circuit.k_list(),
    )
