pragma circom 2.0.0;

// Example circuit for the aggregation CLI — behavioral counterpart of the
// reference's example (rust/t.circom: out <== MiMC7(91)(in1, key 0), public
// in1, declared-but-unused in2).  Needs circomlib on the include path.
include "circomlib/circuits/mimc.circom";

template HashOne() {
    signal input in1;
    signal input in2;   // unused, kept for input-file shape parity
    signal output out;

    component h = MiMC7(91);
    h.x_in <== in1;
    h.k <== 0;
    out <== h.out;
}

component main {public [in1]} = HashOne();
