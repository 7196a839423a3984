pragma circom 2.0.0;

include "circomlib/circuits/mimc.circom";
include "gkr_verifier.circom";

/*
 * In-circuit Fiat-Shamir strengthening of VerifyGKR.
 *
 * The reference's verifier circuit takes every challenge (sumcheckr, r) as
 * a FREE input (gkr-verifier-circuits/circom/circom/verifier.circom:22-29)
 * — a prover choosing its own challenges defeats the sumcheck.  The native
 * gadget (gkr_tpu/recursion/native.py verify_gkr_gadget, full_fs=True)
 * closes this; this file is the same closure in circom form, using
 * circomlib's MiMC7 (available in the reference's own example,
 * rust/t.circom:2).
 *
 * Separate file so the base gkr_verifier.circom keeps zero external
 * includes (the weak/reference-parity aggregation mode doesn't need
 * circomlib).
 *
 * Template args mirror ProofShape (native.py): padding is LEADING zeros
 * (serialize.py modify_proof_for_circom), so the structural-length suffix
 * of each padded row is the true coefficient list; padding wires are
 * pinned to zero and the hash consumes only the suffix — the one mode that
 * is both circom-shape-compatible and transcript-sound.
 */

// MiMC7-91 multi_hash with key 0 (Miyaguchi-Preneel chaining), matching
// gkr_tpu.mimc.Mimc7.multi_hash / mimc-rs multi_hash / ethsnarks.mimc.
template GkrMultiHash(n) {
    signal input xs[n];
    signal output out;

    component h[n];
    signal r[n + 1];
    r[0] <== 0;
    for (var i = 0; i < n; i++) {
        h[i] = MiMC7(91);
        h[i].x_in <== xs[i];
        h[i].k <== r[i];
        r[i + 1] <== r[i] + xs[i] + h[i].out;
    }
    out <== r[n];
}

// VerifyGKR + in-circuit Fiat-Shamir + z-chain binding.
//   meta:      as VerifyGKR (aggregator.rs:92-141 layout)
//   roundLens: structural (unpadded) length of round j of layer i
//   qLens:     structural length of q_i
// d = meta[0], largest_k = meta[1]; arrays are the padded circom shapes.
template VerifyGKRStrongFS(meta, roundLens, qLens) {
    var d = meta[0];
    var largest_k = meta[1];

    signal input sumcheckProof[d - 1][2 * largest_k][meta[4]];
    signal input sumcheckr[d - 1][2 * largest_k];
    signal input q[d - 1][meta[5]];
    signal input D[meta[3]][meta[2] + 1];
    signal input z[d][largest_k];
    signal input r[d - 1];
    signal input inputFunc[meta[6]][meta[7] + 1];

    // base checks: sumcheck chaining, Dtilde(z_0) claim, final inputFunc
    component base = VerifyGKR(meta);
    for (var i = 0; i < d - 1; i++) {
        for (var b = 0; b < 2 * largest_k; b++) {
            for (var c = 0; c < meta[4]; c++) {
                base.sumcheckProof[i][b][c] <== sumcheckProof[i][b][c];
            }
            base.sumcheckr[i][b] <== sumcheckr[i][b];
        }
        for (var b = 0; b < meta[5]; b++) {
            base.q[i][b] <== q[i][b];
        }
        base.r[i] <== r[i];
    }
    for (var i = 0; i < meta[3]; i++) {
        for (var b = 0; b < meta[2] + 1; b++) {
            base.D[i][b] <== D[i][b];
        }
    }
    for (var i = 0; i < d; i++) {
        for (var b = 0; b < largest_k; b++) {
            base.z[i][b] <== z[i][b];
        }
    }
    for (var i = 0; i < meta[6]; i++) {
        for (var b = 0; b < meta[7] + 1; b++) {
            base.inputFunc[i][b] <== inputFunc[i][b];
        }
    }

    // z_0 is the protocol constant 0-vector (rust/src/gkr/prover.rs:17-21)
    for (var b = 0; b < largest_k; b++) {
        z[0][b] === 0;
    }

    // Fiat-Shamir: every challenge recomputed over the structural-length
    // coefficient suffix; leading padding pinned to zero.
    component fs[d - 1][2 * largest_k];
    for (var i = 0; i < d - 1; i++) {
        var v = 2 * meta[i + 9];
        for (var j = 0; j < v; j++) {
            var len = roundLens[i][j];
            var pad = meta[4] - len;
            for (var c = 0; c < pad; c++) {
                sumcheckProof[i][j][c] === 0;
            }
            fs[i][j] = GkrMultiHash(len);
            for (var c = 0; c < len; c++) {
                fs[i][j].xs[c] <== sumcheckProof[i][j][pad + c];
            }
            sumcheckr[i][j] === fs[i][j].out;
        }
        // padding rows beyond v must be inert, and q's padded prefix zero
        for (var c = 0; c < meta[5] - qLens[i]; c++) {
            q[i][c] === 0;
        }
        // line challenge r*_i = multi_hash(last round coeffs) = r_{i,v}
        r[i] === sumcheckr[i][v - 1];
        // z-chain: z_{i+1}[t] = b*[t] + (c*[t] - b*[t]) * r*_i
        for (var t = 0; t < meta[i + 9]; t++) {
            z[i + 1][t] === sumcheckr[i][t]
                + (sumcheckr[i][meta[i + 9] + t] - sumcheckr[i][t]) * r[i];
        }
    }
}
