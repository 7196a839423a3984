"""Device-engine validation: limb arithmetic vs host big ints, and JAX-backend
proofs transcript-identical to the exact host engine."""

import itertools
import random

import pytest

from gkr_tpu import prove, verify
from gkr_tpu.field import P
from gkr_tpu.jaxeng import limbs as L
from gkr_tpu.jaxeng.backend import JaxBackend

from test_gkr_e2e import (assert_proofs_identical, random_circuit,
                           reference_toy_circuit)


def test_limb_roundtrip_and_ops():
    rng = random.Random(10)
    xs = [rng.randrange(P) for _ in range(32)]
    ys = [rng.randrange(P) for _ in range(32)]
    ax, ay = L.pack(xs), L.pack(ys)
    assert L.unpack(ax) == xs
    assert L.unpack(L.jadd(ax, ay)) == [(a + b) % P for a, b in zip(xs, ys)]
    assert L.unpack(L.jsub(ax, ay)) == [(a - b) % P for a, b in zip(xs, ys)]
    assert L.unpack(L.jmul(ax, ay)) == [a * b % P for a, b in zip(xs, ys)]


def test_limb_edge_values():
    edge = [0, 1, 2, P - 1, P - 2, P // 2, (P + 1) // 2]
    pairs = list(itertools.product(edge, edge))
    pa = L.pack([a for a, _ in pairs])
    pb = L.pack([b for _, b in pairs])
    assert L.unpack(L.jmul(pa, pb)) == [a * b % P for a, b in pairs]
    assert L.unpack(L.jadd(pa, pb)) == [(a + b) % P for a, b in pairs]
    assert L.unpack(L.jsub(pa, pb)) == [(a - b) % P for a, b in pairs]


def test_limb_sums():
    rng = random.Random(11)
    for n in (1, 100, (1 << 15), (1 << 15) + 3):
        vals = [rng.randrange(P) for _ in range(n)]
        assert L.unpack_scalar(L.jsum(L.pack(vals))) == sum(vals) % P


def test_eq_fold_eval():
    from gkr_tpu.mle import eq_table, fold_msb
    rng = random.Random(12)
    z = [rng.randrange(P) for _ in range(3)]
    assert L.unpack(L.jeq_table(L.pack(z))) == eq_table(z)
    t = [rng.randrange(P) for _ in range(8)]
    r = rng.randrange(P)
    assert L.unpack(L.jfold(L.pack(t), L.pack_scalar(r))) == fold_msb(t, r)


def test_device_mobius_and_multieval():
    import jax.numpy as jnp

    from gkr_tpu.jaxeng.backend import _mobius_dev, _multi_point_fold
    from gkr_tpu.mle import mobius, table_eval
    rng = random.Random(13)
    k = 3
    table = [rng.randrange(P) for _ in range(1 << k)]
    assert L.unpack(_mobius_dev(L.pack(table))) == mobius(table)
    pts = [[rng.randrange(P) for _ in range(k)] for _ in range(4)]
    flat = L.pack([x for pt in pts for x in pt]).reshape(4, k, 16)
    got = L.unpack(_multi_point_fold(L.pack(table), flat))
    assert got == [table_eval(table, pt) for pt in pts]


def test_device_mimc_matches_host():
    """mimc_dev (the on-device Fiat-Shamir used by the fused engine) is
    bit-identical to the host Mimc7 (the reference's mimc-rs scheme,
    rust/src/gkr/sumcheck.rs:45,83-85)."""
    import jax

    from gkr_tpu.jaxeng import mimc_dev as MD
    from gkr_tpu.mimc import Mimc7
    m = Mimc7()
    rng = random.Random(21)
    x, k = rng.randrange(P), rng.randrange(P)
    got = L.unpack_scalar(jax.jit(MD.mimc_hash_dev)(
        L.pack_scalar(x), L.pack_scalar(k)))
    assert got == m.hash(x, k)
    for length in (1, 2, 3):
        arr = [rng.randrange(P) for _ in range(length)]
        fn = jax.jit(lambda xs: MD.multi_hash_dev(
            [xs[i] for i in range(length)]))
        assert L.unpack_scalar(fn(L.pack(arr))) == m.multi_hash(arr, 0)
    # edge inputs that stress the Montgomery carries
    for arr in ([0], [P - 1, P - 1], [0, 1, P - 1]):
        fn = jax.jit(lambda xs, n=len(arr): MD.multi_hash_dev(
            [xs[i] for i in range(n)]))
        assert L.unpack_scalar(fn(L.pack(arr))) == m.multi_hash(arr, 0)


def test_seg_build_matches_scatter():
    """The sort+cumsum segment-sum build equals a direct host scatter,
    including collision-heavy and empty buckets."""
    import jax
    import jax.numpy as jnp

    from gkr_tpu.jaxeng.fused import _seg_build
    rng = random.Random(22)
    n, G = 16, 64
    keys = [rng.randrange(n) for _ in range(G)]
    # collision stress: many gates into one bucket with near-max limbs
    for i in range(20):
        keys[i] = 3
    w1 = [P - 1 - rng.randrange(4) for _ in range(G)]
    w2 = [rng.randrange(P) for _ in range(G)]
    t1, t2 = jax.jit(lambda k_, a, b: _seg_build(k_, [a, b], n))(
        jnp.asarray(keys, jnp.int32), L.pack(w1), L.pack(w2))
    want1 = [0] * n
    want2 = [0] * n
    for g in range(G):
        want1[keys[g]] = (want1[keys[g]] + w1[g]) % P
        want2[keys[g]] = (want2[keys[g]] + w2[g]) % P
    assert L.unpack(t1) == want1
    assert L.unpack(t2) == want2


def test_seg_build_hot_bucket_carry():
    """>= 2^16 gates in ONE bucket with max-byte limb values: the 8+8
    split's hi-part bucket sum exceeds 2^24 and its top byte must land at
    limb i+2 (x 2^32).  Round 4 placed it at limb i+1 (x 2^24), corrupting
    every hot-bucket table of real compiled circuits (the aggregation
    subcircuits put ~2^18 gates on one wire) while staying invisible to
    random sparse wirings — this is the regression pin."""
    import jax
    import jax.numpy as jnp

    from gkr_tpu.jaxeng.fused import _seg_build

    n = 4
    G = 70000                       # > 2^16 gates, all in bucket 1
    keys = [1] * G
    val = P - 1                     # every 16-bit limb near 0xFFFF
    w1 = [val] * G
    t1, = jax.jit(lambda k_, a: _seg_build(k_, [a], n))(
        jnp.asarray(keys, jnp.int32), L.pack(w1))
    got = L.unpack(t1)
    want = [0, (G * val) % P, 0, 0]
    assert got == want


def test_seg_build_chunked_path(monkeypatch):
    """The multi-chunk clipped-boundary path (gate lists past SEG_CHUNK)
    agrees with a host scatter.  SEG_CHUNK is shrunk so the chunking logic
    runs at test size; exactness is chunk-local so a small chunk bound
    exercises the identical code path as 2^24."""
    import jax
    import jax.numpy as jnp

    from gkr_tpu.jaxeng import fused as F
    monkeypatch.setattr(F, "SEG_CHUNK", 16)
    rng = random.Random(23)
    n, G = 8, 100          # 7 chunks; buckets straddle chunk boundaries
    keys = [rng.randrange(n) for _ in range(G)]
    for i in range(40):
        keys[i] = 5        # one hot bucket spanning multiple chunks
    w1 = [P - 1 - rng.randrange(3) for _ in range(G)]
    t1, = jax.jit(lambda k_, a: F._seg_build(k_, [a], n))(
        jnp.asarray(keys, jnp.int32), L.pack(w1))
    want = [0] * n
    for g in range(G):
        want[keys[g]] = (want[keys[g]] + w1[g]) % P
    assert L.unpack(t1) == want


def test_fused_layer_sumcheck_parity():
    """Fused device-resident layer sumcheck vs the exact host engine:
    identical round polynomials AND challenges (the fused wrapper itself
    asserts the on-device MiMC challenges match the host recomputation)."""
    from gkr_tpu.jaxeng.fused import prove_layer_sumcheck_fused
    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.mle import mle_struct
    from gkr_tpu.sumcheck import prove_layer_sumcheck

    rng = random.Random(23)
    for (k, kc, na, nm) in [(3, 2, 5, 7), (4, 3, 16, 0), (5, 1, 0, 9)]:
        n = 1 << k
        w = [rng.randrange(P) for _ in range(n)]
        if k >= 4:
            for i in range(0, n, 3):
                w[i] = 0                  # exercise structural-length rules
        ag = [(rng.randrange(1 << kc), rng.randrange(n), rng.randrange(n))
              for _ in range(na)]
        mg = [(rng.randrange(1 << kc), rng.randrange(n), rng.randrange(n))
              for _ in range(nm)]
        z = [rng.randrange(P) for _ in range(kc)]
        st = mle_struct(w)
        p_host, c_host = prove_layer_sumcheck(z, w, ag, mg, kc, k, st,
                                              Mimc7())
        p_dev, c_dev = prove_layer_sumcheck_fused(z, w, ag, mg, kc, k, st,
                                                  Mimc7())
        assert p_host == p_dev
        assert c_host == c_dev


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_jax_backend_matches_host(seed):
    """Transcript parity host-engine vs device-engine (fused path),
    forcing the device path for every layer (host_threshold=0)."""
    rng = random.Random(seed)
    circuit, inputs = random_circuit(rng, depth=2, max_k=3)
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_jax = prove(circuit, w, backend=JaxBackend(host_threshold=0, tail_threshold=1))
    assert_proofs_identical(p_host, p_jax)
    assert verify(p_jax, circuit, raise_on_fail=True)


def test_jax_backend_toy_circuit():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_jax = prove(circuit, w, backend=JaxBackend(host_threshold=0, tail_threshold=1))
    assert_proofs_identical(p_host, p_jax)


def test_jax_backend_legacy_engine_matches_host():
    """The round-1 per-round engine (fused=False) stays transcript-correct."""
    rng = random.Random(5)
    circuit, inputs = random_circuit(rng, depth=2, max_k=3)
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_jax = prove(circuit, w, backend=JaxBackend(host_threshold=0,
                                                 tail_threshold=1,
                                                 fused=False))
    assert_proofs_identical(p_host, p_jax)


def test_sparse_from_dense_device_parity():
    """JaxBackend.sparse_from_dense (device Möbius + lazy SparseMle) must
    equal the exact host transform row-for-row, including all-zero rows."""
    import random

    from gkr_tpu.field import P
    from gkr_tpu.jaxeng.backend import JaxBackend
    from gkr_tpu.mle import SparseMle, sparse_from_dense

    rng = random.Random(7)
    backend = JaxBackend(host_threshold=0)
    for k, style in ((4, "random"), (6, "sparse"), (5, "zero")):
        n = 1 << k
        if style == "random":
            table = [rng.randrange(P) for _ in range(n)]
        elif style == "sparse":
            table = [0] * n
            for _ in range(5):
                table[rng.randrange(n)] = rng.randrange(P)
        else:
            table = [0] * n
        got = backend.sparse_from_dense(table)
        want = sparse_from_dense(table)
        assert isinstance(got, SparseMle)
        assert len(got) == len(want)
        assert got == want
        assert list(got) == want


def test_build_wiring_mxu_plan_invariants():
    """Host-side MXU segment-sum plan (pl_seg_sum_T feed): window blocks
    cover every tile's gate range, the pad block never aliases a real
    one, and keys/index columns stay consistent with the hib fallback."""
    import numpy as np

    from gkr_tpu.jaxeng.fused import build_wiring
    from gkr_tpu.jaxeng.pallas_kernels import SEG_NB

    rng = random.Random(3)
    k = 11
    n = 1 << k
    ag = [(g & 15, rng.randrange(n), rng.randrange(n))
          for g in range(n // 2)]
    mg = [(g & 15, rng.randrange(n), rng.randrange(n))
          for g in range(n // 3)]
    _check_mxu_plan(build_wiring(ag, mg, n), n, ag, mg, SEG_NB)

    # Edge case: exact power-of-two gate counts that all land in the LOW
    # output buckets, leaving every trailing bucket empty — the last
    # tiles' windows start exactly at gp and both fetched blocks must
    # still be all-pad blocks inside the padded array (advisor r04).
    ag2 = [(g & 7, rng.randrange(n), rng.randrange(n))
           for g in range(n // 2)]
    mg2 = [(g & 7, rng.randrange(n), rng.randrange(n))
           for g in range(n // 2)]
    _check_mxu_plan(build_wiring(ag2, mg2, n), n, ag2, mg2, SEG_NB)


def _check_mxu_plan(w, n, ag, mg, SEG_NB):
    import numpy as np
    assert n >= SEG_NB
    for keys, bi, wb, hib, out_col, n_gates in (
            (w.a1_keys, w.a1_bi, w.mxu[0], w.a1_hib, w.a1_out, len(ag)),
            (w.m1_keys, w.m1_bi, w.mxu[1], w.m1_hib, w.m1_out, len(mg)),
            (w.a2_keys, w.a2_bi, w.mxu[2], w.a2_hib, w.a2_out, len(ag)),
            (w.m2_keys, w.m2_bi, w.mxu[3], w.m2_hib, w.m2_out, len(mg))):
        assert wb > 0, "MXU plan expected for this size"
        keys_np = np.asarray(keys)[0]
        bi_np = np.asarray(bi)
        hib_np = np.asarray(hib)
        gp = keys_np.shape[0]
        # padded/aligned: multiple of the window block, sorted keys, pad=n
        assert gp % wb == 0
        assert np.all(np.diff(keys_np) >= 0)
        # real/pad boundary: exactly this column's gates are real (<n);
        # everything after is the pad key n
        n_real = int(np.searchsorted(keys_np, n, side="left"))
        assert n_real == n_gates
        assert np.all(keys_np[n_real:] == n)
        assert np.all(keys_np[hib_np[-1]:] == n)
        # index columns padded to the same length
        assert np.asarray(out_col).shape[0] == gp
        # per-tile coverage: gates of tile t live in blocks [bi, bi+1]
        hib_z = np.concatenate([[0], hib_np])
        n_tiles = n // SEG_NB
        assert bi_np.shape[0] == 2 * n_tiles
        for t in range(n_tiles):
            lo_g = int(hib_z[t * SEG_NB])
            hi_g = int(hib_z[(t + 1) * SEG_NB])
            b0 = int(bi_np[2 * t])
            b1 = int(bi_np[2 * t + 1])
            assert b1 == b0 + 1
            assert b0 * wb <= lo_g
            assert hi_g <= (b0 + 2) * wb, \
                f"tile {t} gates [{lo_g},{hi_g}) not covered by " \
                f"blocks [{b0 * wb},{(b0 + 2) * wb})"
            # the fetched blocks exist in the padded array
            assert (b1 + 1) * wb <= gp


def test_env_knob_parity(monkeypatch):
    """Host-reachable A/B env knobs produce identical results to the
    defaults (round-4 advisor: untested debug forks of the hot path).
    The TPU-only forks (GKR_FUSED_PHASE, GKR_FOLD_PALLAS, MIMC_BLOCK,
    and GKR_SEG_MXU's Pallas consumer pl_seg_sum_T) are pinned on-chip
    by the A/B section of scripts/check_kernels.py — the CPU engine
    never reads the MXU plan, so transcript parity here would be
    vacuous (and the k>=10 CPU compile it needs is enormous)."""
    import numpy as np

    from gkr_tpu.jaxeng.fused import build_wiring

    rng = random.Random(31)
    # GKR_PACK_FAST=0: slow per-int packing must match the fast path
    vals = [rng.randrange(P) for _ in range(64)] + [0, 1, P - 1]
    fast = np.asarray(L.pack(vals))
    monkeypatch.setenv("GKR_PACK_FAST", "0")
    slow = np.asarray(L.pack(vals))
    monkeypatch.delenv("GKR_PACK_FAST")
    assert (fast == slow).all()

    # GKR_SEG_MXU=0: the wiring plan falls back to cumsum (mxu all zero)
    # and ONLY the plan differs — every fallback column (sorted keys via
    # hib, gather indices) is bitwise identical to the default build's,
    # so the knob cannot change what the non-MXU consumers see
    k = 11
    n = 1 << k
    ag = [(g & 15, rng.randrange(n), rng.randrange(n))
          for g in range(n // 2)]
    mg = [(g & 15, rng.randrange(n), rng.randrange(n))
          for g in range(n // 3)]
    w_mxu = build_wiring(ag, mg, n)
    assert any(w_mxu.mxu)
    monkeypatch.setenv("GKR_SEG_MXU", "0")
    w_nomxu = build_wiring(ag, mg, n)
    monkeypatch.delenv("GKR_SEG_MXU")
    assert w_nomxu.mxu == (0, 0, 0, 0)
    assert all(x is None for x in (w_nomxu.a1_keys, w_nomxu.m1_keys,
                                   w_nomxu.a2_keys, w_nomxu.m2_keys))
    for col in ("a1_out", "a1_in", "a1_hib", "m1_out", "m1_in", "m1_hib",
                "a2_out", "a2_l", "a2_hib", "m2_out", "m2_l", "m2_hib"):
        d, f = np.asarray(getattr(w_mxu, col)), \
            np.asarray(getattr(w_nomxu, col))
        # the MXU build pads index columns further (window blocks); the
        # shared real prefix must be identical
        m = min(d.shape[0], f.shape[0])
        assert (d[:m] == f[:m]).all(), col
