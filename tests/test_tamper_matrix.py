"""Adversarial tamper matrix over BOTH in-circuit verifier executors.

The circom-subset interpreter (executing the templated verifier circuits)
and the native gadget (`verify_gkr_gadget`) are two independent
implementations of the same in-circuit verifier.  Divergence between them
is the bug class nothing else catches (round-4 verdict #7): a proof field
the gadget checks but the circuit text doesn't (or vice versa) would ship
a recursion step whose embedded verifier silently accepts forgeries.

For every proof field (round coefficients, q, z, r, sumcheckr, D,
input_func) this module tampers one value and asserts:

  * the STRONG executors (full_fs gadget / VerifyGKRStrongFS circuit)
    both reject, and
  * the WEAK executors (reference-parity gadget / VerifyGKR circuit,
    free challenge inputs — rust verifier.circom:22-29) AGREE with each
    other (both accept or both reject).

Plus the self-consistent forged-transcript case: a proof generated with a
non-MiMC challenge schedule is internally consistent, so the weak
executors must BOTH accept it (the reference's soundness gap,
SURVEY §5 footnote 2) while the strong executors both reject it at the
in-circuit Fiat-Shamir recomputation.
"""

import copy
import json
import os

import pytest

from gkr_tpu.field import P
from gkr_tpu.mimc import Mimc7
from gkr_tpu.recursion.circom_interp import ConstraintFailure, run_circuit
from gkr_tpu.recursion.native import (ConstraintBuilder, proof_shape,
                                      verify_gkr_gadget)
from gkr_tpu.recursion.serialize import (CircomInputProof, get_meta,
                                         modify_proof_for_circom,
                                         write_aggregated_input)
from gkr_tpu.recursion.templating import modify_circom_file, structural_lens

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
FIX = os.path.join(HERE, "fixtures", "circom_mimc")
CIRCUITS = os.path.join(REPO, "gkr_tpu", "circuits")
EXAMPLES = os.path.join(REPO, "examples", "mimc")


class _EvilTranscript(Mimc7):
    """Deterministic NON-MiMC challenge schedule: every challenge is the
    true hash + 12345, so the transcript is self-consistent (the prover
    folds with exactly these values) but fails any Fiat-Shamir
    recomputation."""

    def multi_hash(self, xs, key=0):
        return (super().multi_hash(xs, key) + 12345) % P


def _prove_fixture(transcript=None):
    from gkr_tpu.frontend import R1csFile, WtnsFile, compile_r1cs_to_gkr
    from gkr_tpu.prover import prove

    r1cs = R1csFile.read(os.path.join(FIX, "circuit.r1cs"))
    wtns = WtnsFile.read(os.path.join(FIX, "witness.wtns"))
    circuits, w_values, _public = compile_r1cs_to_gkr(r1cs, wtns)
    return prove(circuits[0], w_values[0],
                 transcript=transcript or Mimc7()), circuits[0]


def _make_base(proof, circuit, tag):
    """Honest proof + both templated circuit texts (values don't change
    shapes, so one circuit text serves every tampered json)."""
    metas = get_meta([proof])
    lens = structural_lens([proof])
    import tempfile
    d = tempfile.mkdtemp(prefix=f"tamper_matrix_{tag}_")
    strong = modify_circom_file(
        os.path.join(EXAMPLES, "circuit.circom"), metas,
        os.path.join(d, "strong.circom"), lens=lens)
    weak = modify_circom_file(
        os.path.join(EXAMPLES, "circuit.circom"), metas,
        os.path.join(d, "weak.circom"))
    return {"proof": proof, "circuit": circuit, "metas": metas,
            "dir": d, "strong": strong, "weak": weak}


@pytest.fixture(scope="module")
def base():
    proof, circuit = _prove_fixture()
    return _make_base(proof, circuit, "mimc")


@pytest.fixture(scope="module")
def base_padmix():
    """A shape with REAL coefficient padding: the input table [5,7,5,7]
    leaves var x_1 unsupported in its MLE, so the add-only layer's round
    polys have structural length 2, front-padded to the proof-wide max of
    3 (leading high-degree zero) — the shape the padding-pinning
    constraints exist for."""
    from gkr_tpu.circuit import GKRCircuit, GateLayer
    from gkr_tpu.prover import prove

    l0 = GateLayer(1, 2, mult_gates=[(0, 0, 1), (1, 2, 3)])
    l1 = GateLayer(2, 2, add_gates=[(0, 0, 1), (1, 1, 2),
                                    (2, 2, 3), (3, 3, 0)])
    circuit = GKRCircuit(layers=[l0, l1], input_k=2)
    w = circuit.evaluate([5, 7, 5, 7])
    return _make_base(prove(circuit, w), circuit, "padmix")


@pytest.fixture(scope="module")
def base_toy():
    """The reference toy circuit (outputs 36, 6 — python/test_gkr.py):
    NONZERO outputs give a nonempty sparse D, and the heterogeneous layer
    sizes give round polys with real padding prefixes — the shapes the
    r1cs fixture (all-zero outputs, uniform rounds) cannot produce."""
    from gkr_tpu.prover import prove
    from test_gkr_e2e import reference_toy_circuit

    circuit, inputs = reference_toy_circuit()
    w = circuit.evaluate(inputs)
    return _make_base(prove(circuit, w), circuit, "toy")


def _interp_inputs(base, padded, tag):
    """aggregated.json for a (possibly tampered) PADDED proof."""
    cips = [CircomInputProof(padded)]
    path = write_aggregated_input(
        os.path.join(EXAMPLES, "input1.json"), cips,
        os.path.join(base["dir"], f"agg_{tag}.json"))
    with open(path) as f:
        return json.load(f)


def _interp_accepts(circ_path, inputs):
    try:
        run_circuit(circ_path, inputs, include_dirs=[CIRCUITS])
        return True
    except ConstraintFailure:
        return False


def _gadget_accepts(base, padded, full_fs):
    b = ConstraintBuilder()
    try:
        verify_gkr_gadget(
            b, padded, base["metas"][0],
            circuit=base["circuit"] if full_fs else None,
            full_fs=full_fs,
            shape=proof_shape(base["proof"]) if full_fs else None)
        return True
    except AssertionError:
        return False


def _padded(base, proof=None):
    return modify_proof_for_circom([proof or base["proof"]],
                                   base["metas"])[0]


# Tampers applied to the PADDED proof — the exact object both executors
# consume.  Each targets a STRUCTURAL (non-padding) position: round polys
# and q are front-padded with high-degree zeros, so index -1 is the real
# constant coefficient; z is back-padded, so index 0 is real.
TAMPERS = {
    "coeffs": lambda p: p.sumcheck_proofs[0][1].__setitem__(
        -1, (p.sumcheck_proofs[0][1][-1] + 1) % P),
    "q": lambda p: p.q[0].__setitem__(-1, (p.q[0][-1] + 1) % P),
    "z": lambda p: p.z[1].__setitem__(0, (p.z[1][0] + 1) % P),
    "r": lambda p: p.r.__setitem__(0, (p.r[0] + 1) % P),
    "sumcheckr": lambda p: p.sumcheck_r[0].__setitem__(
        1, (p.sumcheck_r[0][1] + 1) % P),
    # a degree-0 D term is visible at z_0 = 0-vector, so flipping its
    # coefficient shifts the initial claim Dtilde(z_0)
    "d": lambda p: p.d[0].__setitem__(0, (p.d[0][0] + 1) % P),
    "input_func": lambda p: p.input_func[0].__setitem__(
        0, (p.input_func[0][0] + 1) % P),
}


def test_honest_proof_accepted_everywhere(base):
    padded = _padded(base)
    assert _gadget_accepts(base, padded, full_fs=True)
    assert _gadget_accepts(base, padded, full_fs=False)
    inputs = _interp_inputs(base, padded, "honest")
    assert _interp_accepts(base["strong"], inputs)
    assert _interp_accepts(base["weak"], inputs)


@pytest.mark.parametrize("which", ["mimc", "toy", "padmix"])
@pytest.mark.parametrize("field_name", sorted(TAMPERS))
def test_tamper_matrix(base, base_toy, base_padmix, field_name, which):
    base = {"mimc": base, "toy": base_toy, "padmix": base_padmix}[which]
    padded = _padded(base)
    field = {"coeffs": padded.sumcheck_proofs, "d": padded.d}.get(field_name)
    if field is not None and not (field and field[0]):
        pytest.skip(f"padded proof has no {field_name} rows to tamper")
    TAMPERS[field_name](padded)
    # strong executors: BOTH must reject every tamper
    assert not _gadget_accepts(base, padded, full_fs=True), \
        f"strong gadget accepted tampered {field_name}"
    inputs = _interp_inputs(base, padded, field_name)
    assert not _interp_accepts(base["strong"], inputs), \
        f"strong circuit accepted tampered {field_name}"
    # weak executors: must AGREE with each other (the reference-parity
    # soundness envelope — some tampers are invisible to free-challenge
    # verification, and both implementations must draw the line in the
    # same place)
    g = _gadget_accepts(base, padded, full_fs=False)
    c = _interp_accepts(base["weak"], inputs)
    assert g == c, (f"weak executors diverge on tampered {field_name}: "
                    f"gadget={'accept' if g else 'reject'} "
                    f"circuit={'accept' if c else 'reject'}")


def test_padding_tamper_strong_rejects(base_padmix):
    """Smuggling a value into the PADDING prefix of a round poly (a fake
    high-degree coefficient): the strong executors pin every padding wire
    to zero and must reject; the weak pair must agree with each other."""
    base = base_padmix
    padded = _padded(base)
    shape = proof_shape(base["proof"])
    target = None
    for i, layer in enumerate(padded.sumcheck_proofs):
        for j, rnd in enumerate(layer):
            if (j < len(shape.round_lens[i])
                    and len(rnd) - shape.round_lens[i][j] > 0):
                target = rnd
                break
        if target is not None:
            break
    assert target is not None, "padmix fixture lost its padding prefix"
    target[0] = (target[0] + 1) % P
    assert not _gadget_accepts(base, padded, full_fs=True)
    inputs = _interp_inputs(base, padded, "padsmuggle")
    assert not _interp_accepts(base["strong"], inputs)
    g = _gadget_accepts(base, padded, full_fs=False)
    c = _interp_accepts(base["weak"], inputs)
    assert g == c, ("weak executors diverge on padding tamper: "
                    f"gadget={'accept' if g else 'reject'} "
                    f"circuit={'accept' if c else 'reject'}")


def test_forged_transcript_weak_accepts_strong_rejects(base):
    """The self-consistent forged-challenge transcript: weak executors
    (free challenges, the reference's shape) both ACCEPT; strong
    executors both reject at the in-circuit FS recomputation."""
    proof, _circuit = _prove_fixture(transcript=_EvilTranscript())
    # same circuit, same shapes -> the templated circuits are reusable
    assert get_meta([proof]) == base["metas"]
    padded = _padded(base, proof)
    inputs = _interp_inputs(base, padded, "evil")
    assert not _gadget_accepts(base, padded, full_fs=True)
    assert not _interp_accepts(base["strong"], inputs)
    assert _gadget_accepts(base, padded, full_fs=False), \
        "weak gadget rejected a self-consistent transcript"
    assert _interp_accepts(base["weak"], inputs), \
        "weak circuit rejected a self-consistent transcript"
