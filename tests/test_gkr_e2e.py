"""End-to-end GKR prove/verify, and dense-engine vs sparse-spec transcript
parity (the bit-exactness oracle standing in for the reference, which needs
toolchains absent from this environment — see SURVEY §4)."""

import random

import pytest

from gkr_tpu import GateLayer, GKRCircuit, Mimc7, prove, verify
from gkr_tpu.field import P
from gkr_tpu.spec import prove_spec


def reference_toy_circuit():
    """The depth-3 circuit from python/test_gkr.py:7-116 (4 inputs, 4 mult
    gates, 2 outputs 36 and 6) in gate-list form."""
    layer0 = GateLayer(k_cur=1, k_next=2,
                       mult_gates=[(0, 0, 1), (1, 2, 3)])
    layer1 = GateLayer(k_cur=2, k_next=2,
                       mult_gates=[(0, 0, 0), (1, 1, 1), (2, 1, 2), (3, 3, 3)])
    circuit = GKRCircuit(layers=[layer0, layer1], input_k=2)
    circuit.validate()
    inputs = [3, 2, 3, 1]
    return circuit, inputs


def random_circuit(rng: random.Random, depth: int, max_k: int = 3,
                   degenerate: bool = False):
    ks = [rng.randrange(0, max_k + 1)] + [rng.randrange(1, max_k + 1)
                                          for _ in range(depth)]
    layers = []
    for i in range(depth):
        kc, kn = ks[i], ks[i + 1]
        add_gates, mult_gates = [], []
        style = rng.randrange(3)  # 0: both, 1: add only, 2: mult only
        for o in range(1 << kc):
            if rng.random() < 0.8:
                g = (o, rng.randrange(1 << kn), rng.randrange(1 << kn))
                if style == 1 or (style == 0 and rng.random() < 0.5):
                    add_gates.append(g)
                else:
                    mult_gates.append(g)
        if not add_gates and not mult_gates:
            mult_gates.append((0, 0, 0))
        layers.append(GateLayer(kc, kn, add_gates, mult_gates))
    circuit = GKRCircuit(layers, ks[depth])
    if degenerate:
        choice = rng.randrange(3)
        if choice == 0:
            inputs = [0] * (1 << ks[depth])            # all-zero input layer
        elif choice == 1:
            inputs = [7] * (1 << ks[depth])            # constant input layer
        else:
            inputs = [rng.randrange(2) for _ in range(1 << ks[depth])]
    else:
        inputs = [rng.randrange(P) for _ in range(1 << ks[depth])]
    return circuit, inputs


def assert_proofs_identical(p1, p2):
    assert p1.sumcheck_proofs == p2.sumcheck_proofs, "round polys differ"
    assert p1.sumcheck_r == p2.sumcheck_r
    assert p1.q == p2.q
    assert p1.z == p2.z
    assert p1.r == p2.r
    assert p1.depth == p2.depth
    assert p1.k == p2.k
    # sparse term lists: order-insensitive comparison
    assert sorted(map(tuple, p1.d)) == sorted(map(tuple, p2.d))
    assert sorted(map(tuple, p1.input_func)) == sorted(map(tuple, p2.input_func))


def test_toy_circuit_prove_verify():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    assert w[0] == [36, 6]
    assert w[1] == [9, 4, 6, 1]
    proof = prove(circuit, w)
    assert proof.depth == 3
    assert verify(proof, circuit, raise_on_fail=True)
    # verifier without circuit (circom-parity subset) also passes
    assert verify(proof)


def test_toy_circuit_dense_matches_spec():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    assert_proofs_identical(prove(circuit, w), prove_spec(circuit, w))


@pytest.mark.parametrize("seed", range(8))
def test_random_circuits_dense_matches_spec(seed):
    rng = random.Random(seed)
    circuit, inputs = random_circuit(rng, depth=rng.randrange(1, 4))
    w = circuit.evaluate(inputs)
    p_dense = prove(circuit, w)
    p_spec = prove_spec(circuit, w)
    assert_proofs_identical(p_dense, p_spec)
    assert verify(p_dense, circuit, raise_on_fail=True)


@pytest.mark.parametrize("seed", range(8, 16))
def test_degenerate_circuits_dense_matches_spec(seed):
    """All-zero / constant layers exercise the structural-length rules."""
    rng = random.Random(seed)
    circuit, inputs = random_circuit(rng, depth=rng.randrange(1, 4),
                                     degenerate=True)
    w = circuit.evaluate(inputs)
    p_dense = prove(circuit, w)
    p_spec = prove_spec(circuit, w)
    assert_proofs_identical(p_dense, p_spec)
    assert verify(p_dense, circuit, raise_on_fail=True)


def test_random_z0_mode():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    rng = random.Random(99)
    z0 = [rng.randrange(P) for _ in range(circuit.k(0))]
    proof = prove(circuit, w, z0=z0)
    assert verify(proof, circuit, raise_on_fail=True)
    assert_proofs_identical(proof, prove_spec(circuit, w, z0=z0))


def test_tampered_proofs_fail():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    proof = prove(circuit, w)

    import copy
    for mutate in [
        lambda p: p.sumcheck_proofs[0][0].__setitem__(0, (p.sumcheck_proofs[0][0][0] + 1) % P),
        lambda p: p.q[0].__setitem__(0, (p.q[0][0] + 1) % P),
        lambda p: p.r.__setitem__(0, (p.r[0] + 1) % P),
        lambda p: p.z[1].__setitem__(0, (p.z[1][0] + 1) % P),
        lambda p: p.d[0].__setitem__(0, (p.d[0][0] + 1) % P),
        lambda p: p.input_func[0].__setitem__(0, (p.input_func[0][0] + 1) % P),
    ]:
        bad = copy.deepcopy(proof)
        mutate(bad)
        assert not verify(bad, circuit)


def test_wrong_witness_fails():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    w[1][0] = (w[1][0] + 1) % P  # inconsistent intermediate layer
    proof = prove(circuit, w)
    assert not verify(proof, circuit)


def test_proof_json_roundtrip():
    from gkr_tpu.proof import Proof
    circuit, inputs = reference_toy_circuit()
    proof = prove(circuit, circuit.evaluate(inputs))
    s = proof.to_json()
    p2 = Proof.from_json(s)
    assert_proofs_identical(proof, p2)
    assert verify(p2, circuit, raise_on_fail=True)


def test_generic_sumcheck_prove_verify():
    """Generic textbook sumcheck (spec counterpart of python/sumcheck.py:6-70
    and the reference's dead-code rust/src/gkr/sumcheck.rs:158-214)."""
    from gkr_tpu.field import eval_univariate
    from gkr_tpu.spec import prove_sumcheck_generic, verify_sumcheck_generic
    from gkr_tpu.spec.gkr_spec import partial_eval

    rng = random.Random(7)
    for v, nterms, maxdeg in [(2, 3, 1), (3, 5, 2), (4, 8, 3)]:
        g = [[rng.randrange(1, P)] + [rng.randrange(maxdeg + 1)
                                      for _ in range(v)]
             for _ in range(nterms)]
        claim = 0
        for a_int in range(1 << v):
            a = [(a_int >> (v - 1 - i)) & 1 for i in range(v)]
            claim = (claim + partial_eval(g, a)[0][0]
                     + sum(t[0] for t in partial_eval(g, a)[1:])) % P
        t = Mimc7()
        proof, r = prove_sumcheck_generic(g, v, Mimc7())
        assert verify_sumcheck_generic(claim, proof, r, v, t)
        # final binding: g_v(r_v) == g(r)
        full = partial_eval(g, r)
        g_at_r = sum(row[0] for row in full) % P
        assert eval_univariate(proof[-1], r[-1]) == g_at_r
        # tampered claim must fail
        assert not verify_sumcheck_generic((claim + 1) % P, proof, r, v,
                                           Mimc7())
