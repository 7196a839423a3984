"""Generate the committed circom-toolchain fixtures (tests/fixtures/).

The reference's integration tests drive circom + node subprocesses
(rust/src/aggregator.rs:437-458); those binaries are absent here, so the
files they would produce for the mimc example are generated ONCE by this
script from the native constraint builder (bit-compatible r1cs/wtns/sym
binary formats) and committed.  tests/test_circom_fixture.py then exercises
the full aggregator path (_convert_and_prove, templating, aggregated.json)
against them with no subprocess anywhere.

Deterministic: re-running reproduces the committed bytes.

Usage: PYTHONPATH=/root/repo python scripts/gen_circom_fixture.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FIXDIR = os.path.join(REPO, "tests", "fixtures", "circom_mimc")

MULTI_TEMPLATE = """\
pragma circom 2.0.0;

// Multi-template user circuit: the main template is NOT the first one in
// the file, so the reference's insert-at-first-bare-brace rule
// (aggregator.rs:298-306) would corrupt it by splicing the verifier block
// into Helper.  Exercises templating._main_template_close.

template Helper() {
    signal input x;
    signal output y;
    y <== x * x;
}

template TopLevel() {
    signal input in1;
    signal input in2;
    signal output out;

    component h = Helper();
    h.x <== in1;
    out <== h.y + in2;
}

component main {public [in1]} = TopLevel();
"""


def main() -> int:
    from gkr_tpu.examples import mimc_example
    from gkr_tpu.field import P
    from gkr_tpu.frontend.r1cs import R1csFile
    from gkr_tpu.frontend.symfile import write_sym
    from gkr_tpu.frontend.wtns import WtnsFile
    from gkr_tpu.recursion.aggregator import _convert_and_prove
    from gkr_tpu.recursion.native import ConstraintBuilder
    from gkr_tpu.recursion.serialize import (CircomInputProof, get_meta,
                                             modify_proof_for_circom,
                                             write_aggregated_input)
    from gkr_tpu.recursion.templating import modify_circom_file

    os.makedirs(FIXDIR, exist_ok=True)
    example_dir = os.path.join(REPO, "examples", "mimc")
    with open(os.path.join(example_dir, "input1.json")) as f:
        inputs = json.load(f)

    # what `circom circuit.circom --r1cs --sym --wasm` + node would emit
    b = ConstraintBuilder()
    mimc_example(b, inputs)
    b.n_public = 1                       # {public [in1]}, wire 1
    R1csFile.write(os.path.join(FIXDIR, "circuit.r1cs"), P,
                   n_wires=len(b.witness), n_pub_out=0, n_pub_in=1,
                   n_prv_in=len(b.witness) - 2, constraints=b.constraints)
    WtnsFile.write(os.path.join(FIXDIR, "witness.wtns"), P, b.witness)
    write_sym(os.path.join(FIXDIR, "circuit.sym"), ["in1"])

    # run the aggregator's convert+prove over the fixture files, then
    # freeze the round-boundary artifacts (aggregated.circom/.json goldens)
    proofs = _convert_and_prove("circuit", ".", "input1", FIXDIR)
    metas = get_meta(proofs)
    padded = modify_proof_for_circom(proofs, metas)
    cips = [CircomInputProof(p) for p in padded]
    write_aggregated_input(os.path.join(example_dir, "input2.json"), cips,
                           os.path.join(FIXDIR, "aggregated.json"))
    modify_circom_file(os.path.join(example_dir, "circuit.circom"), metas,
                       os.path.join(FIXDIR, "aggregated.circom"),
                       verifier_include="gkr_verifier.circom")

    with open(os.path.join(FIXDIR, "multi_template.circom"), "w") as f:
        f.write(MULTI_TEMPLATE)
    modify_circom_file(os.path.join(FIXDIR, "multi_template.circom"), metas,
                       os.path.join(FIXDIR, "aggregated_multi.circom"),
                       verifier_include="gkr_verifier.circom")
    print("fixture files written to", FIXDIR)
    for name in sorted(os.listdir(FIXDIR)):
        print(" ", name, os.path.getsize(os.path.join(FIXDIR, name)), "B")
    return 0


if __name__ == "__main__":
    sys.exit(main())
