import random

from gkr_tpu.field import P, eval_univariate
from gkr_tpu.mle import (eq_bits, eq_table, fold_msb, line, mle_struct,
                         mobius, restrict_to_line, sparse_eval,
                         sparse_from_dense, table_eval)


def brute_mle_eval(table, point):
    """Direct sum_w table[w] * chi(w, point)."""
    k = len(point)
    acc = 0
    for idx, v in enumerate(table):
        acc = (acc + v * eq_bits(point, idx)) % P
    return acc


def test_fold_and_eval_match_bruteforce():
    rng = random.Random(3)
    k = 4
    table = [rng.randrange(P) for _ in range(1 << k)]
    point = [rng.randrange(P) for _ in range(k)]
    assert table_eval(table, point) == brute_mle_eval(table, point)
    # eq_table consistency
    et = eq_table(point)
    assert all(et[i] == eq_bits(point, i) for i in range(1 << k))
    # fold_msb binds x_1
    t2 = fold_msb(table, point[0])
    assert table_eval(t2, point[1:]) == table_eval(table, point)


def test_mobius_sparse_roundtrip():
    rng = random.Random(4)
    k = 3
    table = [rng.randrange(P) for _ in range(1 << k)]
    sparse = sparse_from_dense(table)
    point = [rng.randrange(P) for _ in range(k)]
    assert sparse_eval(sparse, point) == table_eval(table, point)
    # hypercube values reproduce the table
    for idx in range(1 << k):
        pt = [(idx >> (k - 1 - j)) & 1 for j in range(k)]
        assert sparse_eval(sparse, pt) == table[idx]


def test_mle_struct():
    # table independent of x_2: W(x1,x2) = 5*x1 + 1
    table = [1, 1, 6, 6]
    st = mle_struct(table)
    assert st.support == [True, False]
    assert st.maxdeg == 1
    assert not st.empty
    st0 = mle_struct([0, 0, 0, 0])
    assert st0.empty and st0.maxdeg == 0
    stc = mle_struct([7, 7, 7, 7])
    assert stc.support == [False, False] and stc.maxdeg == 0


def test_restrict_to_line():
    rng = random.Random(5)
    k = 3
    table = [rng.randrange(P) for _ in range(1 << k)]
    b = [rng.randrange(P) for _ in range(k)]
    c = [rng.randrange(P) for _ in range(k)]
    q = restrict_to_line(table, b, c)
    for t in [0, 1, rng.randrange(P)]:
        assert eval_univariate(q, t) == table_eval(table, line(b, c, t))
    assert restrict_to_line([0] * 8, b, c) == [0]


def test_mobius_zero_and_constant():
    assert mobius([3, 3, 3, 3]) == [3, 0, 0, 0]
    assert mobius([0, 1]) == [0, 1]
