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
