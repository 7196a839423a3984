"""Frontend tests: r1cs/wtns parsing, constraint->circuit compilation,
witness sweep, end-to-end prove+verify of compiled circuits."""

import os
import random

import pytest

from gkr_tpu import prove, verify
from gkr_tpu.field import P
from gkr_tpu.frontend import R1csFile, WtnsFile, compile_r1cs_to_gkr, parse_sym
from gkr_tpu.frontend.compiler import (convert_constraints_to_nodes,
                                       compile_nodes, merge_nodes, var_node)


def mimc_like_constraints(rng, n_rounds=5):
    """Synthetic quadratic constraint system in circom wire convention:
    wire 0 = 1, wire 1 = public out, wires 2.. = internals.

    t_{i+1} = (t_i + c_i)^2  (squaring chain), out = t_n.
    Constraints: (t_i + c_i) * (t_i + c_i) - t_{i+1} = 0
                 out - t_n = 0  (linear)
    """
    cs = []
    consts = [rng.randrange(P) for _ in range(n_rounds)]
    t0 = rng.randrange(P)
    # wires: 0:one, 1:out, 2:t0, 3..: t_i
    witness = [1, 0, t0]
    t = t0
    for i, c in enumerate(consts):
        cur_wire = 2 + i
        nxt = pow((t + c) % P, 2, P)
        witness.append(nxt)
        nxt_wire = 3 + i
        a = [(1, cur_wire), (c, 0)]
        b = [(1, cur_wire), (c, 0)]
        cc = [(1, nxt_wire)]
        cs.append((a, b, cc))
        t = nxt
    witness[1] = t
    cs.append(([], [], [(1, 1), (P - 1, 2 + n_rounds)]))  # linear: out - t_n
    return cs, witness


def test_r1cs_wtns_roundtrip(tmp_path):
    rng = random.Random(0)
    cs, witness = mimc_like_constraints(rng)
    r1cs_path = os.path.join(tmp_path, "c.r1cs")
    wtns_path = os.path.join(tmp_path, "c.wtns")
    R1csFile.write(r1cs_path, P, n_wires=len(witness), n_pub_out=1,
                   n_pub_in=0, n_prv_in=1, constraints=cs)
    WtnsFile.write(wtns_path, P, witness)
    r = R1csFile.read(r1cs_path)
    w = WtnsFile.read(wtns_path)
    assert r.header.prime == P
    assert r.header.n_constraints == len(cs)
    assert [tuple(c) for c in r.constraints] == [tuple(c) for c in cs]
    assert w.values == [v % P for v in witness]


def test_compile_and_prove_synthetic():
    rng = random.Random(1)
    cs, witness = mimc_like_constraints(rng, n_rounds=4)
    from gkr_tpu.frontend.r1cs import R1csFile as RF, R1csHeader
    header = R1csHeader(32, P, len(witness), 1, 0, 1, len(witness), len(cs))
    r1cs = RF(header, cs)
    wtns = WtnsFile(P, witness)
    circuits, w_values_list, public = compile_r1cs_to_gkr(r1cs, wtns)
    assert len(circuits) >= 1
    for circuit, w in zip(circuits, w_values_list):
        circuit.validate()
        assert w[0][0] == 0  # constraint satisfaction
        proof = prove(circuit, w)
        assert verify(proof, circuit, raise_on_fail=True)
    assert public[1][1] == witness[1]


def test_unsatisfied_witness_rejected():
    rng = random.Random(2)
    cs, witness = mimc_like_constraints(rng, n_rounds=3)
    witness = list(witness)
    witness[2] = (witness[2] + 1) % P  # break it
    from gkr_tpu.frontend.r1cs import R1csFile as RF, R1csHeader
    header = R1csHeader(32, P, len(witness), 1, 0, 1, len(witness), len(cs))
    with pytest.raises(AssertionError):
        compile_r1cs_to_gkr(RF(header, cs), WtnsFile(P, witness))


def test_width_limit_merging():
    """More than WIDTH_LIMIT constraints collapse into <= 20 subcircuits."""
    rng = random.Random(3)
    cs = []
    witness = [1]
    # 50 independent x_i * x_i = y_i constraints
    for i in range(50):
        x = rng.randrange(P)
        witness.append(x)
    xs_off = 1
    ys_off = 51
    for i in range(50):
        witness.append(pow(witness[xs_off + i], 2, P))
    for i in range(50):
        cs.append(([(1, xs_off + i)], [(1, xs_off + i)], [(1, ys_off + i)]))
    from gkr_tpu.frontend.r1cs import R1csFile as RF, R1csHeader
    header = R1csHeader(32, P, len(witness), 0, 0, 50, len(witness), len(cs))
    circuits, w_values_list, _ = compile_r1cs_to_gkr(RF(header, cs),
                                                     WtnsFile(P, witness))
    assert 1 <= len(circuits) <= 20
    for circuit, w in zip(circuits, w_values_list):
        proof = prove(circuit, w)
        assert verify(proof, circuit, raise_on_fail=True)


def test_parse_sym_text():
    text = "1,1,0,main.out\n2,2,0,main.in1\n3,3,0,main.hidden\n"
    assert parse_sym(text, 2, is_text=True) == ["out", "in1"]
    assert parse_sym(text, 0, is_text=True) == []


def test_merge_nodes_shapes():
    nodes = [var_node(i) for i in range(5)]
    root = merge_nodes(nodes)
    # 5 -> pairs (0+1),(2+3) -> merge -> +4 : depth structure deterministic
    assert root.kind == "add"
    assert root.right.expr == ("var", 4)
