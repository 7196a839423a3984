"""Multi-chip sharded sumcheck: MLE tables distributed over a device mesh.

Sharding layout (the key design decision): the global hypercube index is
split g = row * D + dev — the mesh axis carries the LOW bits (the LAST
sumcheck variables), rows carry the high bits.  Tables are stored as
(rows, D, t, 16) with NamedSharding P(None, 'x', None, None):

  * binding a round variable folds axis 0 (the global MSB) — a purely LOCAL
    operation on every chip for the first k - log2(D) rounds of each phase;
    no re-sharding, no collectives (the reference's rayon work-stealing
    analog, SURVEY §2 parallelism inventory, maps to this);
  * the per-round evaluations g_j(0),g_j(1),g_j(2) reduce over both axes:
    axis 0 locally, axis 1 across the mesh — XLA inserts the psum over
    ICI automatically from the sharding annotations;
  * once rows == 1 the surviving table has one element per chip (D values
    total): it is gathered to the host and the remaining log2(D) rounds run
    on the exact host engine — identical math, byte-identical transcript.

This mirrors the scaling recipe: annotate shardings, let XLA place the
collectives; communication volume is ~D field elements per phase.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from ..field import P
from ..mimc import Mimc7
from ..mle import MleStruct, fold_msb
from ..sumcheck import (coeffs_from_evals_deg2, prove_layer_sumcheck,
                        round_poly_len, shape_coeffs)
from ..jaxeng import limbs as L
from ..jaxeng.backend import JaxBackend
from ..jaxeng.sumcheck import (_build_phase1_tables, _build_phase2_table,
                               _mul_tables)


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("x",))


# ------------------------------------------------------------ round kernels

@jax.jit
def _sum2(term):
    """(rows, D, ..., 16) -> (..., 16): local row sum then cross-shard sum
    (XLA inserts the mesh collective from the sharding)."""
    part = L.sum_mod(term)          # over rows (local)
    return L.sum_mod(part)          # over D (sharded -> psum)


@jax.jit
def _sharded_phase1_eval(S):
    """S: (rows, D, 4, 16) -> y (3, 16) replicated."""
    lo, hi, at2 = L.eval3_halves(S)
    T = jnp.stack([lo, hi, at2])                     # (3, rows/2, D, 4, 16)
    w, ha1, ha2, hm = T[..., 0, :], T[..., 1, :], T[..., 2, :], T[..., 3, :]
    term = L.add_mod(L.mont_mul(L.add_mod(ha1, hm), w), ha2)
    return _sum2(jnp.moveaxis(term, 0, 2))           # (rows/2, D, 3, 16) -> (3,16)


@jax.jit
def _sharded_phase2_eval(S, wb):
    lo, hi, at2 = L.eval3_halves(S)
    T = jnp.stack([lo, hi, at2])
    w, fa, fmwb = T[..., 0, :], T[..., 1, :], T[..., 2, :]
    wbb = jnp.broadcast_to(wb, w.shape)
    term = L.add_mod(L.mont_mul(fa, L.add_mod(wbb, w)),
                     L.mont_mul(fmwb, w))
    return _sum2(jnp.moveaxis(term, 0, 2))


@jax.jit
def _sharded_fold(S, r):
    return L.fold_tables(S, r)


class ShardedSumcheck:
    """Layer sumcheck over a 1-D mesh; drop-in for prove_layer_sumcheck."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh
        self.D = mesh.devices.size
        assert self.D & (self.D - 1) == 0, "mesh size must be a power of two"
        self.spec = NamedSharding(mesh, PSpec(None, "x"))

    def _shard(self, table: jnp.ndarray):
        """(n, t, 16) -> (rows, D, t, 16) with the mesh axis on dim 1."""
        n = table.shape[0]
        rows = n // self.D
        resh = table.reshape(rows, self.D, *table.shape[1:])
        return jax.device_put(resh, NamedSharding(
            self.mesh, PSpec(None, "x", *([None] * (resh.ndim - 2)))))

    def prove_layer_sumcheck(self, z, w_next, add_gates, mult_gates,
                             k_cur, k_next, w_struct: MleStruct,
                             transcript: Mimc7, w_dev=None):
        k, v = k_next, 2 * k_next
        n = 1 << k
        D = self.D
        if n // D < 2:
            # table too small to shard: run the exact host engine
            return prove_layer_sumcheck(z, w_next, add_gates, mult_gates,
                                        k_cur, k_next, w_struct, transcript)
        log_d = D.bit_length() - 1
        sup = w_struct.support if not w_struct.empty else [False] * k
        has_add = len(add_gates) > 0
        has_mult = len(mult_gates) > 0

        if w_dev is None:
            w_dev = L.pack(w_next)
        eqz = L.jeq_table(L.pack(z)) if z else L.jeq_table(
            jnp.zeros((0, 16), jnp.uint32))
        ha1, ha2 = _build_phase1_tables(eqz, w_dev, add_gates, n)
        _, hm = _build_phase1_tables(eqz, w_dev, mult_gates, n)

        proof, challenges = [], []

        def emit(y0, y1, y2, j):
            coeffs = shape_coeffs(
                coeffs_from_evals_deg2(y0, y1, y2),
                round_poly_len(j, v, sup, has_add, has_mult))
            proof.append(coeffs)
            challenges.append(transcript.multi_hash(coeffs, 0))

        def run_phase(S_flat, eval_fn, first_round, extra=()):
            """S_flat: (n, t, 16) stacked tables; returns the host-side
            residual tables once rows == 1."""
            S = self._shard(S_flat)
            j = first_round
            while S.shape[0] >= 2:
                y = eval_fn(S, *extra)
                y0, y1, y2 = L.unpack(y)
                emit(y0, y1, y2, j)
                S = _sharded_fold(S, L.pack_scalar(challenges[-1]))
                j += 1
            # rows == 1: D elements left, one per chip — finish on host
            tail = np.asarray(jax.device_get(S))     # (1, D, t, 16)
            t_cnt = tail.shape[2]
            tables = [L.unpack(jnp.asarray(tail[0, :, ti, :]))
                      for ti in range(t_cnt)]
            return j, tables

        # ---- phase 1 ----
        S1 = jnp.stack([w_dev, ha1, ha2, hm], axis=1)
        j, (W_t, HA1_t, HA2_t, HM_t) = run_phase(S1, _sharded_phase1_eval, 1)
        for jj in range(j, k + 1):
            half = len(W_t) // 2
            ys = []
            for t in (0, 1, 2):
                total = 0
                for s in range(half):
                    wt = W_t[s] + t * (W_t[s + half] - W_t[s])
                    at = HA1_t[s] + t * (HA1_t[s + half] - HA1_t[s])
                    ht = HA2_t[s] + t * (HA2_t[s + half] - HA2_t[s])
                    mt = HM_t[s] + t * (HM_t[s + half] - HM_t[s])
                    total = (total + (at + mt) * wt + ht) % P
                ys.append(total)
            emit(ys[0], ys[1], ys[2], jj)
            r = challenges[-1]
            W_t = fold_msb(W_t, r)
            HA1_t = fold_msb(HA1_t, r)
            HA2_t = fold_msb(HA2_t, r)
            HM_t = fold_msb(HM_t, r)

        b_star = challenges[:k]
        wb_int = W_t[0]

        # ---- phase 2 ----
        eqb = L.jeq_table(L.pack(b_star))
        fa = _build_phase2_table(eqz, eqb, add_gates, n)
        fm = _build_phase2_table(eqz, eqb, mult_gates, n)
        wb_dev = L.pack_scalar(wb_int)
        fmwb = _mul_tables(fm, jnp.broadcast_to(wb_dev, fm.shape))
        S2 = jnp.stack([w_dev, fa, fmwb], axis=1)
        j, (Wc_t, FA_t, FMwb_t) = run_phase(
            S2, _sharded_phase2_eval, k + 1, extra=(wb_dev,))
        for jj in range(j, v + 1):
            half = len(Wc_t) // 2
            ys = []
            for t in (0, 1, 2):
                total = 0
                for s in range(half):
                    wt = Wc_t[s] + t * (Wc_t[s + half] - Wc_t[s])
                    fat = FA_t[s] + t * (FA_t[s + half] - FA_t[s])
                    fmt = FMwb_t[s] + t * (FMwb_t[s + half] - FMwb_t[s])
                    total = (total + fat * (wb_int + wt) + fmt * wt) % P
                ys.append(total)
            emit(ys[0], ys[1], ys[2], jj)
            r = challenges[-1]
            Wc_t = fold_msb(Wc_t, r)
            FA_t = fold_msb(FA_t, r)
            FMwb_t = fold_msb(FMwb_t, r)

        return proof, challenges


class ShardedBackend(JaxBackend):
    """JaxBackend with the layer sumcheck sharded over a device mesh."""

    def __init__(self, mesh: Mesh | None = None, host_threshold: int = 10):
        super().__init__(host_threshold=host_threshold)
        self.mesh = mesh or make_mesh()
        self._sharded = ShardedSumcheck(self.mesh)

    def layer_sumcheck(self, z, w_next, add_gates, mult_gates,
                       k_cur, k_next, w_struct, transcript, layer_idx=None):
        if self._use_host(k_next):
            return prove_layer_sumcheck(z, w_next, add_gates, mult_gates,
                                        k_cur, k_next, w_struct, transcript)
        w_dev = self.packed(layer_idx, w_next) if layer_idx is not None else None
        return self._sharded.prove_layer_sumcheck(
            z, w_next, add_gates, mult_gates, k_cur, k_next, w_struct,
            transcript, w_dev=w_dev)
