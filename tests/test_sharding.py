"""Sharded-backend tests on the virtual 8-device CPU mesh: transcript parity
with the host engine and full-prove equivalence."""

import random

import jax
import pytest

from gkr_tpu import GateLayer, GKRCircuit, prove, verify
from gkr_tpu.field import P
from gkr_tpu.parallel import ShardedBackend, make_mesh

from test_gkr_e2e import assert_proofs_identical


def wide_circuit(rng, k=5, depth=2):
    """Random circuit with k-sized inner layers (shardable over 8 devices)."""
    ks = [1] + [k] * depth
    layers = []
    for i in range(depth):
        kc, kn = ks[i], ks[i + 1]
        add_gates, mult_gates = [], []
        for o in range(1 << kc):
            (add_gates if rng.random() < 0.5 else mult_gates).append(
                (o, rng.randrange(1 << kn), rng.randrange(1 << kn)))
        if not add_gates and not mult_gates:
            mult_gates.append((0, 0, 0))
        layers.append(GateLayer(kc, kn, add_gates, mult_gates))
    circuit = GKRCircuit(layers, ks[depth])
    inputs = [rng.randrange(P) for _ in range(1 << k)]
    return circuit, inputs


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.parametrize("seed,k", [(0, 4), (1, 5)])
def test_sharded_matches_host(seed, k):
    rng = random.Random(seed)
    circuit, inputs = wide_circuit(rng, k=k)
    w = circuit.evaluate(inputs)
    p_host = prove(circuit, w)
    backend = ShardedBackend(make_mesh(), host_threshold=0)
    p_shard = prove(circuit, w, backend=backend)
    assert_proofs_identical(p_host, p_shard)
    assert verify(p_shard, circuit, raise_on_fail=True)


def test_sharded_small_mesh():
    """2-device mesh exercises a different rows/D split."""
    rng = random.Random(2)
    circuit, inputs = wide_circuit(rng, k=4)
    w = circuit.evaluate(inputs)
    backend = ShardedBackend(make_mesh(2), host_threshold=0)
    p_shard = prove(circuit, w, backend=backend)
    assert_proofs_identical(prove(circuit, w), p_shard)
