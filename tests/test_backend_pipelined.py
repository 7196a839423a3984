"""The pipelined device-resident prover produces byte-identical proofs.

prove_pipelined keeps the z-chain on device (device MiMC r*, device line
evaluation) and syncs twice per proof instead of once per layer; the
transcripts must be bit-identical to the reference host walk
(gkr_tpu/prover.py mirroring rust/src/gkr/prover.rs:6-96)."""

import random

import pytest

from gkr_tpu import prove, verify
from gkr_tpu.field import P
from gkr_tpu.jaxeng.backend import JaxBackend, prove_pipelined

from test_gkr_e2e import (assert_proofs_identical, random_circuit,
                          reference_toy_circuit)


@pytest.mark.parametrize("seed", [1, 4, 8])
def test_pipelined_matches_host(seed):
    rng = random.Random(seed)
    circuit, inputs = random_circuit(rng, depth=2, max_k=3)
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_pipe = prove_pipelined(circuit, w, backend=JaxBackend())
    assert_proofs_identical(p_host, p_pipe)
    assert verify(p_pipe, circuit, raise_on_fail=True)


def test_pipelined_toy_circuit():
    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    p_pipe = prove_pipelined(circuit, w)
    assert_proofs_identical(p_host, p_pipe)


def test_pipelined_zero_heavy_layers():
    """Empty/partial-support inner tables (struct.empty and dropped
    vars) through the device z-chain."""
    from gkr_tpu.circuit import GKRCircuit, GateLayer

    l0 = GateLayer(1, 2, mult_gates=[(0, 0, 1), (1, 2, 3)])
    l1 = GateLayer(2, 2, add_gates=[(0, 0, 1), (1, 1, 2),
                                    (2, 2, 3), (3, 3, 0)])
    circuit = GKRCircuit(layers=[l0, l1], input_k=2)
    w = circuit.evaluate([5, 7, 5, 7])      # x_1 unsupported in input MLE
    p_host = prove(circuit, w)
    p_pipe = prove_pipelined(circuit, w)
    assert_proofs_identical(p_host, p_pipe)
    assert verify(p_pipe, circuit, raise_on_fail=True)


def test_pipelined_random_z0():
    rng = random.Random(3)
    circuit, inputs = random_circuit(rng, depth=2, max_k=3)
    w = circuit.evaluate(inputs)
    z0 = [rng.randrange(P) for _ in range(circuit.k(0))]
    p_host = prove(circuit, w, z0=z0)
    p_pipe = prove_pipelined(circuit, w, z0=z0)
    assert_proofs_identical(p_host, p_pipe)
