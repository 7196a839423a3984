"""Multi-HOST sharded prove: two jax.distributed processes, one mesh.

Executes the ("dcn", "ici") multi-host story of gkr_tpu.parallel.sharding
as REAL multiple controllers — not a single-process mesh-shape assertion:
two `jax.distributed.initialize` processes x 4 virtual CPU devices each,
`make_mesh(hosts=2)` -> a (2, 4) ("dcn", "ici") mesh over 8 global
devices, a full ShardedSumcheck layer prove with every collective (per
-round psum, tail all_gather) crossing the process boundary, and
transcript parity asserted against the exact host engine.  Array placement
goes through ShardedSumcheck._put -> jax.make_array_from_callback (each
process provides only its addressable shards).

This is the SURVEY §4 "JAX multi-process CPU simulation of meshes"
prescription; the recorded run is committed as MULTIHOST_r04.json at the
repo root.  On real multi-host TPU hardware the same child code runs with
jax.distributed.initialize() (auto-detected) and make_mesh(hosts=
jax.process_count()).

Usage:
    python scripts/run_multihost.py [k]          (default k=8; parent)
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
import subprocess
import sys
import time

HOSTS = 2
DEV_PER_HOST = 4
PORT = 9733


def synth(k: int, k_cur: int = 4):
    from gkr_tpu.field import P
    from gkr_tpu.mle import MleStruct

    rng = random.Random(1)
    n = 1 << k
    w = [rng.randrange(P) for _ in range(n)]
    add_gates, mult_gates = [], []
    for g in range(n):
        o = g & ((1 << k_cur) - 1)
        trip = (o, rng.randrange(n), rng.randrange(n))
        (add_gates if g & 1 else mult_gates).append(trip)
    z = [rng.randrange(P) for _ in range(k_cur)]
    struct = MleStruct(k, False, [True] * k, k)
    return z, w, add_gates, mult_gates, k_cur, struct


def child(pid: int, k: int) -> int:
    # jax is pre-imported by the environment's sitecustomize, so the CPU
    # platform and device count must be forced via config, not env alone
    # (same pattern as tests/conftest.py)
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={DEV_PER_HOST}").strip()
    import jax
    if "cpu" not in jax.config.jax_platforms.split(",")[0]:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(f"localhost:{PORT}", num_processes=HOSTS,
                               process_id=pid)
    assert jax.process_count() == HOSTS
    assert len(jax.devices()) == HOSTS * DEV_PER_HOST

    from gkr_tpu.mimc import Mimc7
    from gkr_tpu.parallel.sharding import ShardedSumcheck, make_mesh

    z, w, ag, mg, kc, struct = synth(k)
    mesh = make_mesh(hosts=HOSTS)
    assert mesh.axis_names == ("dcn", "ici")
    eng = ShardedSumcheck(mesh)

    t0 = time.time()
    proof, challenges = eng.prove_layer_sumcheck(z, w, ag, mg, kc, k,
                                                 struct, Mimc7())
    compile_and_first_s = time.time() - t0
    t0 = time.time()
    proof, challenges = eng.prove_layer_sumcheck(z, w, ag, mg, kc, k,
                                                 struct, Mimc7())
    wall_s = time.time() - t0

    if pid == 0:
        # transcript parity vs the exact host engine, on the coordinator
        from gkr_tpu.sumcheck import prove_layer_sumcheck as host_prove
        h_proof, h_chal = host_prove(z, w, ag, mg, kc, k, struct, Mimc7())
        ok = (proof == h_proof and challenges == h_chal)
        print("RESULT " + json.dumps({
            "ok": bool(ok),
            "wall_ms": round(wall_s * 1000, 1),
            "first_run_s": round(compile_and_first_s, 1),
            "hosts": HOSTS,
            "devices_per_host": DEV_PER_HOST,
            "mesh": "dcn=2 x ici=4 (multi-controller, gloo collectives)",
            "global_gates": 1 << k,
            "transcript_matches_host_engine": bool(ok),
        }), flush=True)
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--child"]
    if "--child" in sys.argv[1:]:
        return child(int(args[0]), int(args[1]))
    k = int(args[0]) if len(args) > 0 else 8
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child",
         str(pid), str(k)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in range(HOSTS)]
    outs = [p.communicate()[0] for p in procs]
    rcs = [p.returncode for p in procs]
    result = None
    for line in outs[0].splitlines():
        if line.startswith("RESULT "):
            result = json.loads(line[len("RESULT "):])
    if any(rcs) or result is None:
        for i, o in enumerate(outs):
            print(f"--- child {i} (rc={rcs[i]}) ---\n{o}", file=sys.stderr)
        raise RuntimeError("multi-host run failed")
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "MULTIHOST_r04.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
        f.write("\n")
    print(f"recorded to {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
