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


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_jax_backend_matches_host(seed):
    """Transcript parity host-engine vs device-engine, forcing the device
    path for every layer (host_threshold=0)."""
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
