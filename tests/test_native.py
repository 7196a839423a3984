"""Native (C++) host runtime tests: field ops, MiMC7 and full layer-sumcheck
transcript parity with the pure-Python engine."""

import random

import pytest

from gkr_tpu import Mimc7, prove, verify
from gkr_tpu.field import P
from gkr_tpu.native import available

pytestmark = pytest.mark.skipif(not available(),
                                reason="libgkrhost unavailable")

from test_gkr_e2e import (assert_proofs_identical, random_circuit,
                          reference_toy_circuit)


def test_batch_ops():
    import ctypes
    from gkr_tpu.native import lib
    from gkr_tpu.native.engine import _buf, buf_to_ints, ints_to_buf
    L = lib()
    rng = random.Random(0)
    xs = [rng.randrange(P) for _ in range(100)]
    ys = [rng.randrange(P) for _ in range(100)]
    a, b = ints_to_buf(xs), ints_to_buf(ys)
    out = bytearray(32 * 100)
    L.gkr_batch_mul(_buf(a), _buf(b), _buf(out), 100)
    assert buf_to_ints(out) == [x * y % P for x, y in zip(xs, ys)]
    L.gkr_batch_add(_buf(a), _buf(b), _buf(out), 100)
    assert buf_to_ints(out) == [(x + y) % P for x, y in zip(xs, ys)]


def test_native_mimc_matches_python():
    from gkr_tpu.native.engine import NativeMimc7
    m_py = Mimc7()
    m_c = NativeMimc7()
    rng = random.Random(1)
    for _ in range(5):
        arr = [rng.randrange(P) for _ in range(rng.randrange(1, 5))]
        assert m_c.multi_hash(arr, 0) == m_py.multi_hash(arr, 0)


def test_native_eq_table():
    from gkr_tpu.mle import eq_table
    from gkr_tpu.native import lib
    from gkr_tpu.native.engine import _buf, buf_to_ints, ints_to_buf
    L = lib()
    rng = random.Random(2)
    z = [rng.randrange(P) for _ in range(4)]
    zb = ints_to_buf(z)
    L.gkr_to_mont(_buf(zb), 4)
    out = bytearray(32 * 16)
    L.gkr_eq_table(_buf(zb), 4, _buf(out))
    L.gkr_from_mont(_buf(out), 16)
    assert buf_to_ints(out) == eq_table(z)


@pytest.mark.parametrize("seed", [0, 3, 11])
def test_cpp_backend_matches_host(seed):
    from gkr_tpu.native.engine import CppBackend
    rng = random.Random(seed)
    circuit, inputs = random_circuit(rng, depth=rng.randrange(1, 4))
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_cpp = prove(circuit, w, backend=CppBackend())
    assert_proofs_identical(p_host, p_cpp)
    assert verify(p_cpp, circuit, raise_on_fail=True)


def test_cpp_backend_toy():
    from gkr_tpu.native.engine import CppBackend
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    assert_proofs_identical(prove(circuit, w),
                            prove(circuit, w, backend=CppBackend()))
