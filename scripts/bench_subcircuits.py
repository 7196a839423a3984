"""N-subcircuit proving wall-clock vs worker count (rayon par_iter analog).

The reference proves a round's <= 20 subcircuits with rayon
(rust/src/aggregator.rs:350-355).  Our default HostBackend is pure-Python
big-int arithmetic, which the GIL serializes — so prove_subcircuits uses a
spawn PROCESS pool.  This script measures the actual wall-clock of proving
N identical subcircuits at 1/2/4/8 workers and records the speedup; the
result is committed as PARALLEL_r04.json at the repo root.

Usage: python scripts/bench_subcircuits.py [n_sub] [k]
"""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json
import os
import random
import sys
import time


def synth_subcircuit(seed: int, k: int):
    from gkr_tpu.circuit import GateLayer, GKRCircuit
    from gkr_tpu.field import P

    rng = random.Random(seed)
    n = 1 << k
    l0 = GateLayer(2, k, add_gates=[(o, rng.randrange(n), rng.randrange(n))
                                    for o in range(4)])
    add, mult = [], []
    for g in range(n):
        trip = (g, rng.randrange(n), rng.randrange(n))
        (add if g & 1 else mult).append(trip)
    l1 = GateLayer(k, k, add_gates=add, mult_gates=mult)
    circuit = GKRCircuit(layers=[l0, l1], input_k=k)
    inputs = [rng.randrange(P) for _ in range(n)]
    return circuit, circuit.evaluate(inputs)


def main() -> int:
    from gkr_tpu.recursion.aggregator import prove_subcircuits

    n_sub = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 11
    pairs = [synth_subcircuit(s, k) for s in range(n_sub)]
    circuits = [c for c, _ in pairs]
    w_lists = [w for _, w in pairs]
    gates = sum(sum(layer.n_gates() for layer in c.layers)
                for c in circuits)

    from gkr_tpu.prover import HostBackend

    t0 = time.time()
    prove_subcircuits(circuits, w_lists, backend=HostBackend())
    t_seq = time.time() - t0            # in-process sequential baseline
    print(f"sequential (in-process): {t_seq:.2f}s", flush=True)

    walls = {}
    for workers in (1, 2, 4, 8):
        t0 = time.time()
        proofs = prove_subcircuits(circuits, w_lists,
                                   max_workers=workers)
        walls[workers] = time.time() - t0
        assert len(proofs) == n_sub
        print(f"workers={workers}: {walls[workers]:.2f}s", flush=True)
    out = {
        "metric": f"subcircuit_prove_scaling_{n_sub}x2e{k}",
        "pool": "process (spawn), prove_subcircuits",
        "host_cpus": os.cpu_count(),
        "total_gates": gates,
        "sequential_s": round(t_seq, 2),
        "wall_s": {str(w): round(t, 2) for w, t in walls.items()},
        "speedup_vs_sequential": {str(w): round(t_seq / t, 2)
                                  for w, t in walls.items()},
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARALLEL_r04.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"recorded to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
