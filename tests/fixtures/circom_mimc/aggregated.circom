pragma circom 2.0.0;
include "gkr_verifier.circom";

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

    component verifier[12];

    var d0 = 4;
    var largest_k0 = 6;
    signal input sumcheckProof0[d0 - 1][2 * largest_k0][3];
    signal input sumcheckr0[d0 - 1][2 * largest_k0];
    signal input q0[d0 - 1][7];
    signal input D0[0][5 + 1];
    signal input z0[d0][largest_k0];
    signal input r0[d0 - 1];
    signal input inputFunc0[63][6 + 1];
    verifier[0] = VerifyGKR([4, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6]);
    for (var a = 0; a < d0 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[0].sumcheckProof[a][b][c] <== sumcheckProof0[a][b][c];
            }
        }
    }
    for (var a = 0; a < d0 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[0].sumcheckr[a][b] <== sumcheckr0[a][b];
        }
    }
    for (var a = 0; a < d0 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[0].q[a][b] <== q0[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[0].D[a][b] <== D0[a][b];
        }
    }
    for (var a = 0; a < d0; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[0].z[a][b] <== z0[a][b];
        }
    }
    for (var a = 0; a < d0 - 1; a++) {
        verifier[0].r[a] <== r0[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[0].inputFunc[a][b] <== inputFunc0[a][b];
        }
    }

    var d1 = 4;
    var largest_k1 = 6;
    signal input sumcheckProof1[d1 - 1][2 * largest_k1][3];
    signal input sumcheckr1[d1 - 1][2 * largest_k1];
    signal input q1[d1 - 1][7];
    signal input D1[0][5 + 1];
    signal input z1[d1][largest_k1];
    signal input r1[d1 - 1];
    signal input inputFunc1[63][6 + 1];
    verifier[1] = VerifyGKR([4, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6]);
    for (var a = 0; a < d1 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[1].sumcheckProof[a][b][c] <== sumcheckProof1[a][b][c];
            }
        }
    }
    for (var a = 0; a < d1 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[1].sumcheckr[a][b] <== sumcheckr1[a][b];
        }
    }
    for (var a = 0; a < d1 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[1].q[a][b] <== q1[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[1].D[a][b] <== D1[a][b];
        }
    }
    for (var a = 0; a < d1; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[1].z[a][b] <== z1[a][b];
        }
    }
    for (var a = 0; a < d1 - 1; a++) {
        verifier[1].r[a] <== r1[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[1].inputFunc[a][b] <== inputFunc1[a][b];
        }
    }

    var d2 = 4;
    var largest_k2 = 6;
    signal input sumcheckProof2[d2 - 1][2 * largest_k2][3];
    signal input sumcheckr2[d2 - 1][2 * largest_k2];
    signal input q2[d2 - 1][7];
    signal input D2[0][5 + 1];
    signal input z2[d2][largest_k2];
    signal input r2[d2 - 1];
    signal input inputFunc2[63][6 + 1];
    verifier[2] = VerifyGKR([4, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6]);
    for (var a = 0; a < d2 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[2].sumcheckProof[a][b][c] <== sumcheckProof2[a][b][c];
            }
        }
    }
    for (var a = 0; a < d2 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[2].sumcheckr[a][b] <== sumcheckr2[a][b];
        }
    }
    for (var a = 0; a < d2 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[2].q[a][b] <== q2[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[2].D[a][b] <== D2[a][b];
        }
    }
    for (var a = 0; a < d2; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[2].z[a][b] <== z2[a][b];
        }
    }
    for (var a = 0; a < d2 - 1; a++) {
        verifier[2].r[a] <== r2[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[2].inputFunc[a][b] <== inputFunc2[a][b];
        }
    }

    var d3 = 4;
    var largest_k3 = 6;
    signal input sumcheckProof3[d3 - 1][2 * largest_k3][3];
    signal input sumcheckr3[d3 - 1][2 * largest_k3];
    signal input q3[d3 - 1][7];
    signal input D3[0][5 + 1];
    signal input z3[d3][largest_k3];
    signal input r3[d3 - 1];
    signal input inputFunc3[63][6 + 1];
    verifier[3] = VerifyGKR([4, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6]);
    for (var a = 0; a < d3 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[3].sumcheckProof[a][b][c] <== sumcheckProof3[a][b][c];
            }
        }
    }
    for (var a = 0; a < d3 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[3].sumcheckr[a][b] <== sumcheckr3[a][b];
        }
    }
    for (var a = 0; a < d3 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[3].q[a][b] <== q3[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[3].D[a][b] <== D3[a][b];
        }
    }
    for (var a = 0; a < d3; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[3].z[a][b] <== z3[a][b];
        }
    }
    for (var a = 0; a < d3 - 1; a++) {
        verifier[3].r[a] <== r3[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[3].inputFunc[a][b] <== inputFunc3[a][b];
        }
    }

    var d4 = 4;
    var largest_k4 = 6;
    signal input sumcheckProof4[d4 - 1][2 * largest_k4][3];
    signal input sumcheckr4[d4 - 1][2 * largest_k4];
    signal input q4[d4 - 1][7];
    signal input D4[0][5 + 1];
    signal input z4[d4][largest_k4];
    signal input r4[d4 - 1];
    signal input inputFunc4[63][6 + 1];
    verifier[4] = VerifyGKR([4, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6]);
    for (var a = 0; a < d4 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[4].sumcheckProof[a][b][c] <== sumcheckProof4[a][b][c];
            }
        }
    }
    for (var a = 0; a < d4 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[4].sumcheckr[a][b] <== sumcheckr4[a][b];
        }
    }
    for (var a = 0; a < d4 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[4].q[a][b] <== q4[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[4].D[a][b] <== D4[a][b];
        }
    }
    for (var a = 0; a < d4; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[4].z[a][b] <== z4[a][b];
        }
    }
    for (var a = 0; a < d4 - 1; a++) {
        verifier[4].r[a] <== r4[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[4].inputFunc[a][b] <== inputFunc4[a][b];
        }
    }

    var d5 = 6;
    var largest_k5 = 6;
    signal input sumcheckProof5[d5 - 1][2 * largest_k5][3];
    signal input sumcheckr5[d5 - 1][2 * largest_k5];
    signal input q5[d5 - 1][7];
    signal input D5[0][5 + 1];
    signal input z5[d5][largest_k5];
    signal input r5[d5 - 1];
    signal input inputFunc5[63][6 + 1];
    verifier[5] = VerifyGKR([6, 6, 5, 0, 3, 7, 63, 6, 5, 6, 6, 6, 6, 6]);
    for (var a = 0; a < d5 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[5].sumcheckProof[a][b][c] <== sumcheckProof5[a][b][c];
            }
        }
    }
    for (var a = 0; a < d5 - 1; a++) {
        for (var b = 0; b < 2 * 6; b++) {
            verifier[5].sumcheckr[a][b] <== sumcheckr5[a][b];
        }
    }
    for (var a = 0; a < d5 - 1; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[5].q[a][b] <== q5[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[5].D[a][b] <== D5[a][b];
        }
    }
    for (var a = 0; a < d5; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[5].z[a][b] <== z5[a][b];
        }
    }
    for (var a = 0; a < d5 - 1; a++) {
        verifier[5].r[a] <== r5[a];
    }
    for (var a = 0; a < 63; a++) {
        for (var b = 0; b < 6 + 1; b++) {
            verifier[5].inputFunc[a][b] <== inputFunc5[a][b];
        }
    }

    var d6 = 6;
    var largest_k6 = 7;
    signal input sumcheckProof6[d6 - 1][2 * largest_k6][3];
    signal input sumcheckr6[d6 - 1][2 * largest_k6];
    signal input q6[d6 - 1][8];
    signal input D6[0][5 + 1];
    signal input z6[d6][largest_k6];
    signal input r6[d6 - 1];
    signal input inputFunc6[127][7 + 1];
    verifier[6] = VerifyGKR([6, 7, 5, 0, 3, 8, 127, 7, 5, 6, 7, 7, 7, 7]);
    for (var a = 0; a < d6 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[6].sumcheckProof[a][b][c] <== sumcheckProof6[a][b][c];
            }
        }
    }
    for (var a = 0; a < d6 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            verifier[6].sumcheckr[a][b] <== sumcheckr6[a][b];
        }
    }
    for (var a = 0; a < d6 - 1; a++) {
        for (var b = 0; b < 8; b++) {
            verifier[6].q[a][b] <== q6[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[6].D[a][b] <== D6[a][b];
        }
    }
    for (var a = 0; a < d6; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[6].z[a][b] <== z6[a][b];
        }
    }
    for (var a = 0; a < d6 - 1; a++) {
        verifier[6].r[a] <== r6[a];
    }
    for (var a = 0; a < 127; a++) {
        for (var b = 0; b < 7 + 1; b++) {
            verifier[6].inputFunc[a][b] <== inputFunc6[a][b];
        }
    }

    var d7 = 6;
    var largest_k7 = 7;
    signal input sumcheckProof7[d7 - 1][2 * largest_k7][3];
    signal input sumcheckr7[d7 - 1][2 * largest_k7];
    signal input q7[d7 - 1][8];
    signal input D7[0][5 + 1];
    signal input z7[d7][largest_k7];
    signal input r7[d7 - 1];
    signal input inputFunc7[127][7 + 1];
    verifier[7] = VerifyGKR([6, 7, 5, 0, 3, 8, 127, 7, 5, 6, 7, 7, 7, 7]);
    for (var a = 0; a < d7 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[7].sumcheckProof[a][b][c] <== sumcheckProof7[a][b][c];
            }
        }
    }
    for (var a = 0; a < d7 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            verifier[7].sumcheckr[a][b] <== sumcheckr7[a][b];
        }
    }
    for (var a = 0; a < d7 - 1; a++) {
        for (var b = 0; b < 8; b++) {
            verifier[7].q[a][b] <== q7[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[7].D[a][b] <== D7[a][b];
        }
    }
    for (var a = 0; a < d7; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[7].z[a][b] <== z7[a][b];
        }
    }
    for (var a = 0; a < d7 - 1; a++) {
        verifier[7].r[a] <== r7[a];
    }
    for (var a = 0; a < 127; a++) {
        for (var b = 0; b < 7 + 1; b++) {
            verifier[7].inputFunc[a][b] <== inputFunc7[a][b];
        }
    }

    var d8 = 6;
    var largest_k8 = 7;
    signal input sumcheckProof8[d8 - 1][2 * largest_k8][3];
    signal input sumcheckr8[d8 - 1][2 * largest_k8];
    signal input q8[d8 - 1][8];
    signal input D8[0][5 + 1];
    signal input z8[d8][largest_k8];
    signal input r8[d8 - 1];
    signal input inputFunc8[127][7 + 1];
    verifier[8] = VerifyGKR([6, 7, 5, 0, 3, 8, 127, 7, 5, 6, 7, 7, 7, 7]);
    for (var a = 0; a < d8 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[8].sumcheckProof[a][b][c] <== sumcheckProof8[a][b][c];
            }
        }
    }
    for (var a = 0; a < d8 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            verifier[8].sumcheckr[a][b] <== sumcheckr8[a][b];
        }
    }
    for (var a = 0; a < d8 - 1; a++) {
        for (var b = 0; b < 8; b++) {
            verifier[8].q[a][b] <== q8[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[8].D[a][b] <== D8[a][b];
        }
    }
    for (var a = 0; a < d8; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[8].z[a][b] <== z8[a][b];
        }
    }
    for (var a = 0; a < d8 - 1; a++) {
        verifier[8].r[a] <== r8[a];
    }
    for (var a = 0; a < 127; a++) {
        for (var b = 0; b < 7 + 1; b++) {
            verifier[8].inputFunc[a][b] <== inputFunc8[a][b];
        }
    }

    var d9 = 6;
    var largest_k9 = 7;
    signal input sumcheckProof9[d9 - 1][2 * largest_k9][3];
    signal input sumcheckr9[d9 - 1][2 * largest_k9];
    signal input q9[d9 - 1][8];
    signal input D9[0][5 + 1];
    signal input z9[d9][largest_k9];
    signal input r9[d9 - 1];
    signal input inputFunc9[127][7 + 1];
    verifier[9] = VerifyGKR([6, 7, 5, 0, 3, 8, 127, 7, 5, 6, 7, 7, 7, 7]);
    for (var a = 0; a < d9 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[9].sumcheckProof[a][b][c] <== sumcheckProof9[a][b][c];
            }
        }
    }
    for (var a = 0; a < d9 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            verifier[9].sumcheckr[a][b] <== sumcheckr9[a][b];
        }
    }
    for (var a = 0; a < d9 - 1; a++) {
        for (var b = 0; b < 8; b++) {
            verifier[9].q[a][b] <== q9[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[9].D[a][b] <== D9[a][b];
        }
    }
    for (var a = 0; a < d9; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[9].z[a][b] <== z9[a][b];
        }
    }
    for (var a = 0; a < d9 - 1; a++) {
        verifier[9].r[a] <== r9[a];
    }
    for (var a = 0; a < 127; a++) {
        for (var b = 0; b < 7 + 1; b++) {
            verifier[9].inputFunc[a][b] <== inputFunc9[a][b];
        }
    }

    var d10 = 6;
    var largest_k10 = 7;
    signal input sumcheckProof10[d10 - 1][2 * largest_k10][3];
    signal input sumcheckr10[d10 - 1][2 * largest_k10];
    signal input q10[d10 - 1][8];
    signal input D10[0][5 + 1];
    signal input z10[d10][largest_k10];
    signal input r10[d10 - 1];
    signal input inputFunc10[127][7 + 1];
    verifier[10] = VerifyGKR([6, 7, 5, 0, 3, 8, 127, 7, 5, 6, 7, 7, 7, 7]);
    for (var a = 0; a < d10 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[10].sumcheckProof[a][b][c] <== sumcheckProof10[a][b][c];
            }
        }
    }
    for (var a = 0; a < d10 - 1; a++) {
        for (var b = 0; b < 2 * 7; b++) {
            verifier[10].sumcheckr[a][b] <== sumcheckr10[a][b];
        }
    }
    for (var a = 0; a < d10 - 1; a++) {
        for (var b = 0; b < 8; b++) {
            verifier[10].q[a][b] <== q10[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[10].D[a][b] <== D10[a][b];
        }
    }
    for (var a = 0; a < d10; a++) {
        for (var b = 0; b < 7; b++) {
            verifier[10].z[a][b] <== z10[a][b];
        }
    }
    for (var a = 0; a < d10 - 1; a++) {
        verifier[10].r[a] <== r10[a];
    }
    for (var a = 0; a < 127; a++) {
        for (var b = 0; b < 7 + 1; b++) {
            verifier[10].inputFunc[a][b] <== inputFunc10[a][b];
        }
    }

    var d11 = 6;
    var largest_k11 = 5;
    signal input sumcheckProof11[d11 - 1][2 * largest_k11][3];
    signal input sumcheckr11[d11 - 1][2 * largest_k11];
    signal input q11[d11 - 1][6];
    signal input D11[0][4 + 1];
    signal input z11[d11][largest_k11];
    signal input r11[d11 - 1];
    signal input inputFunc11[31][5 + 1];
    verifier[11] = VerifyGKR([6, 5, 4, 0, 3, 6, 31, 5, 4, 5, 5, 5, 5, 5]);
    for (var a = 0; a < d11 - 1; a++) {
        for (var b = 0; b < 2 * 5; b++) {
            for (var c = 0; c < 3; c++) {
                verifier[11].sumcheckProof[a][b][c] <== sumcheckProof11[a][b][c];
            }
        }
    }
    for (var a = 0; a < d11 - 1; a++) {
        for (var b = 0; b < 2 * 5; b++) {
            verifier[11].sumcheckr[a][b] <== sumcheckr11[a][b];
        }
    }
    for (var a = 0; a < d11 - 1; a++) {
        for (var b = 0; b < 6; b++) {
            verifier[11].q[a][b] <== q11[a][b];
        }
    }
    for (var a = 0; a < 0; a++) {
        for (var b = 0; b < 4 + 1; b++) {
            verifier[11].D[a][b] <== D11[a][b];
        }
    }
    for (var a = 0; a < d11; a++) {
        for (var b = 0; b < 5; b++) {
            verifier[11].z[a][b] <== z11[a][b];
        }
    }
    for (var a = 0; a < d11 - 1; a++) {
        verifier[11].r[a] <== r11[a];
    }
    for (var a = 0; a < 31; a++) {
        for (var b = 0; b < 5 + 1; b++) {
            verifier[11].inputFunc[a][b] <== inputFunc11[a][b];
        }
    }

}

component main {public [in1]} = HashOne();
