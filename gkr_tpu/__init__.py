"""gkr_tpu — a TPU-native GKR proving framework.

A from-scratch re-design of jeong0982/gkr (recursive GKR proof aggregation
over BN254 with MiMC7 Fiat–Shamir and circom/groth16 hand-off) built
TPU-first: dense multilinear-extension tables, linear-time two-phase layer
sumcheck, JAX/XLA/Pallas device kernels with pjit/shard_map scale-out, and a
host runtime for circuit compilation, aggregation and serialization.
"""

from .circuit import GateLayer, GKRCircuit, get_k
from .field import P
from .mimc import EthsnarksMimc, Mimc7
from .proof import Proof
from .prover import prove, prove_from_input
from .verifier import VerifyError, verify

__all__ = [
    "GateLayer", "GKRCircuit", "get_k", "P", "Mimc7", "EthsnarksMimc",
    "Proof", "prove", "prove_from_input", "verify", "VerifyError",
]

__version__ = "0.1.0"
