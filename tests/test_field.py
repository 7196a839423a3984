import random

from gkr_tpu.field import (P, add_univariate, batch_inv, eval_univariate,
                           finv, interpolate, mult_univariate)


def test_field_basics():
    assert (P - 1 + 1) % P == 0
    a = 123456789123456789 % P
    assert finv(a) * a % P == 1
    xs = [random.Random(0).randrange(1, P) for _ in range(20)]
    invs = batch_inv(xs)
    for x, ix in zip(xs, invs):
        assert x * ix % P == 1


def test_univariate_ops():
    rng = random.Random(1)
    # coeffs highest-first
    p = [rng.randrange(P) for _ in range(4)]
    q = [rng.randrange(P) for _ in range(3)]
    x = rng.randrange(P)
    s = add_univariate(p, q)
    m = mult_univariate(p, q)
    assert len(m) == len(p) + len(q) - 1
    assert eval_univariate(s, x) == (eval_univariate(p, x) + eval_univariate(q, x)) % P
    assert eval_univariate(m, x) == eval_univariate(p, x) * eval_univariate(q, x) % P
    assert add_univariate([], p) == p
    assert eval_univariate([], x) == 0


def test_interpolate_roundtrip():
    rng = random.Random(2)
    coeffs = [rng.randrange(P) for _ in range(5)]  # deg 4, highest-first
    pts = [(t, eval_univariate(coeffs, t)) for t in range(5)]
    rec = interpolate(pts)
    assert rec == coeffs
