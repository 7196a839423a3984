"""Quick on-TPU correctness check of every Pallas kernel vs host math.

Usage: PYTHONPATH=/root/.axon_site:/root/repo timeout 1700 python -u scripts/check_kernels.py
"""


from __future__ import annotations

# Make `python scripts/<name>.py` work from any cwd: the repo root (one
# level up) must be importable before `import gkr_tpu`.
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import os

import jax

# persistent compile cache: configured by gkr_tpu.jaxeng at import
# (GKR_TPU_JAX_CACHE, default ~/.cache/gkr_tpu_jax)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from gkr_tpu.field import P, R  # noqa: E402
from gkr_tpu.jaxeng import pallas_kernels as PK  # noqa: E402
from gkr_tpu.mimc import Mimc7  # noqa: E402

rng = np.random.default_rng(7)
N = 1 << 13


def rand_fr(n):
    return np.array([int.from_bytes(rng.bytes(32), "little") % P
                     for _ in range(n)], dtype=object)


def to_limbs(vals):
    out = np.zeros((len(vals), 16), dtype=np.uint32)
    for r_i, v in enumerate(vals):
        m = (int(v) * R) % P
        for i in range(16):
            out[r_i, i] = (m >> (16 * i)) & 0xFFFF
    return out


def from_limbs(arr):
    arr = np.asarray(arr)
    vals = []
    for row in arr.reshape(-1, 16):
        m = sum(int(x) << (16 * i) for i, x in enumerate(row))
        vals.append((m * pow(R, P - 2, P)) % P)
    return vals


a_v = rand_fr(N)
b_v = rand_fr(N)
a = jnp.asarray(to_limbs(a_v))
b = jnp.asarray(to_limbs(b_v))

# mont mul
out = np.asarray(jax.device_get(PK.pl_mont_mul(a, b)))
got = from_limbs(out[:4])
want = [(int(x) * int(y)) % P for x, y in zip(a_v[:4], b_v[:4])]
assert got == want, (got[:2], want[:2])
print("pl_mont_mul OK")

# fold
T = 4
S = jnp.asarray(to_limbs(rand_fr(T * N)).reshape(N, T, 16))
S_T = PK.to_T(S)
r_v = rand_fr(1)[0]
r_l = jnp.asarray(to_limbs([r_v])[0])
folded = np.asarray(jax.device_get(PK.pl_fold(S_T, r_l)))
S_host = np.asarray(jax.device_get(S))
half = N // 2
for t in range(T):
    lo = from_limbs(S_host[:2, t])
    hi = from_limbs(S_host[half:half + 2, t])
    want = [(l + int(r_v) * (h - l)) % P for l, h in zip(lo, hi)]
    got = from_limbs(folded[t, :, :2].T)
    assert got == want, (t, got, want)
print("pl_fold OK")

# phase1 eval
S4 = jnp.asarray(to_limbs(rand_fr(4 * N)).reshape(N, 4, 16))
S4_T = PK.to_T(S4)
y = np.asarray(jax.device_get(PK.pl_phase1_eval(S4_T)))
S4h = np.asarray(jax.device_get(S4))
w, ad, h, m = (from_limbs(S4h[:, 0]), from_limbs(S4h[:, 1]),
               from_limbs(S4h[:, 2]), from_limbs(S4h[:, 3]))
for t in range(3):
    tot = 0
    for i in range(half):
        wt = (w[i] + t * (w[half + i] - w[i])) % P
        at = (ad[i] + t * (ad[half + i] - ad[i])) % P
        ht = (h[i] + t * (h[half + i] - h[i])) % P
        mt = (m[i] + t * (m[half + i] - m[i])) % P
        tot = (tot + (at + mt) * wt + ht) % P
    got = from_limbs(y[t])[0]
    assert got == tot, (t, got, tot)
print("pl_phase1_eval OK")

# phase2 eval
S3 = jnp.asarray(to_limbs(rand_fr(3 * N)).reshape(N, 3, 16))
S3_T = PK.to_T(S3)
wb_v = rand_fr(1)[0]
wb_l = jnp.asarray(to_limbs([wb_v])[0])
y2 = np.asarray(jax.device_get(PK.pl_phase2_eval(S3_T, wb_l)))
S3h = np.asarray(jax.device_get(S3))
w2, f2, g2 = from_limbs(S3h[:, 0]), from_limbs(S3h[:, 1]), from_limbs(S3h[:, 2])
for t in range(3):
    tot = 0
    for i in range(half):
        wt = (w2[i] + t * (w2[half + i] - w2[i])) % P
        ft = (f2[i] + t * (f2[half + i] - f2[i])) % P
        gt = (g2[i] + t * (g2[half + i] - g2[i])) % P
        tot = (tot + ft * (int(wb_v) + wt) + gt * wt) % P
    got = from_limbs(y2[t])[0]
    assert got == tot, (t, got, tot)
print("pl_phase2_eval OK")

# normalize (relaxed 24-limb input)
lin = 24
t_relax = rng.integers(0, 1 << 30, size=(lin, N), dtype=np.uint32)
outn = np.asarray(jax.device_get(PK.pl_normalize_T(jnp.asarray(t_relax))))
for col in range(3):
    v = sum(int(t_relax[i, col]) << (16 * i) for i in range(lin))
    want = v % P
    got_m = sum(int(outn[i, col]) << (16 * i) for i in range(16))
    got = (got_m * pow(R, P - 2, P)) % P
    # pl_normalize_T returns canonical Montgomery of the relaxed value / 1
    assert got_m < P
    assert ((got * R) % P) == want % P or got == (v * pow(R, P - 2, P) * R) % P, (col,)
    # direct check: interpret relaxed as Montgomery-domain accumulation
    assert got_m == (v % P), (col, got_m, v % P)
print("pl_normalize_T OK")

# normalize_mul
s_v = rand_fr(1)[0]
s_l = jnp.asarray(to_limbs([s_v])[0])
outm = np.asarray(jax.device_get(PK.pl_normalize_mul_T(jnp.asarray(t_relax), s_l)))
for col in range(3):
    v = sum(int(t_relax[i, col]) << (16 * i) for i in range(lin)) % P
    # outm is Montgomery product of canonical(v) [as mont] and s (mont of s_v)
    got_m = sum(int(outm[i, col]) << (16 * i) for i in range(16))
    want_m = (v * (int(s_v) * R % P) * pow(R, P - 2, P)) % P
    assert got_m == want_m, (col, got_m, want_m)
print("pl_normalize_mul_T OK")

# eq table (Pallas tail vs XLA reference)
kk = 13
zs = rand_fr(kk)
z_l = jnp.asarray(to_limbs(zs))
from gkr_tpu.jaxeng import limbs as L  # noqa: E402
eq_pl = np.asarray(jax.device_get(PK.pl_eq_table_T(z_l)))
eq_ref = np.asarray(jax.device_get(L.jeq_table(z_l)))
assert (eq_pl == eq_ref.T).all(), "eq table mismatch"
print("pl_eq_table_T OK")

# fused layer sumcheck with the Pallas build path (transcript self-check)
from gkr_tpu.jaxeng import fused as F  # noqa: E402
from gkr_tpu.mimc import Mimc7 as _M  # noqa: E402
from gkr_tpu.mle import MleStruct  # noqa: E402
import random as _random  # noqa: E402

_rng = _random.Random(5)
kf = 16
nf = 1 << kf
w_vals = [_rng.randrange(P) for _ in range(nf)]
ag, mg = [], []
for g in range(1 << 12):
    trip = (g & 7, _rng.randrange(nf), _rng.randrange(nf))
    (ag if g & 1 else mg).append(trip)
zf = [_rng.randrange(P) for _ in range(3)]
struct = MleStruct(kf, False, [True] * kf, kf)
proof_f, chal_f = F.prove_layer_sumcheck_fused(
    zf, w_vals, ag, mg, 3, kf, struct, _M(), use_pallas=True)
from gkr_tpu.sumcheck import prove_layer_sumcheck  # noqa: E402
proof_h, chal_h = prove_layer_sumcheck(
    zf, w_vals, ag, mg, 3, kf, struct, _M())
assert proof_f == proof_h and chal_f == chal_h
print("fused pallas-build layer parity OK")

# MXU banded one-hot segment sum (relaxed output) vs numpy scatter-add
from gkr_tpu.jaxeng.fused import build_wiring as _bw  # noqa: E402
from gkr_tpu.jaxeng import limbs as _L  # noqa: E402

_n = 1 << 16
_G = 1 << 15
_rng2 = np.random.default_rng(11)
_gates = [(int(o), int(l), int(r)) for o, l, r in zip(
    _rng2.integers(0, 16, _G), _rng2.integers(0, _n, _G),
    _rng2.integers(0, _n, _G))]
_w = _bw(_gates, [], _n)
assert _w.mxu[0] > 0
_gp = np.asarray(_w.a1_keys).shape[1]
_wvals = _rng2.integers(0, 1 << 16, (16, _gp)).astype(np.uint32)
_seg = PK.pl_seg_sum_T([jnp.asarray(_wvals)], _w.a1_keys, _w.a1_bi,
                       _n, _w.mxu[0])[0]
_got = np.asarray(jax.device_get(PK.pl_normalize_T(_seg)))
_keys = np.asarray(_w.a1_keys)[0]
_ref_rel = np.zeros((_n, 16), np.uint64)
_real = _keys < _n
np.add.at(_ref_rel, _keys[_real], _wvals[:, _real].T.astype(np.uint64))
# normalize reference rows mod p (value interpretation, Montgomery-free)
_PINT = P
for _b in _rng2.integers(0, _n, 64):
    _vgot = int.from_bytes(
        np.asarray(_got[:, _b]).astype(np.uint16).tobytes(), "little")
    _vref = sum(int(_ref_rel[_b, i]) << (16 * i) for i in range(16))
    assert _vgot == (_vref % _PINT), f"seg sum mismatch at bucket {_b}"
print("pl_seg_sum_T OK")

# mimc
xs = rand_fr(3)
x_l = jnp.asarray(to_limbs(xs))
h_dev = np.asarray(jax.device_get(PK.pl_mimc_multi(x_l)))
got = from_limbs(h_dev[None, :])[0]
want = Mimc7().multi_hash([int(v) for v in xs])
assert got == want, (got, want)
print("pl_mimc_multi OK")

# ---------------------------------------------------------------- A/B knobs
# Every env-reachable fork of the hot path must produce the identical
# transcript (round-4 advisor: untested debug forks accumulate).  Each
# knob is exercised here against the default path's output.

# MIMC_BLOCK=True: the sublane-packed alternative MiMC kernel
_saved_block = PK.MIMC_BLOCK
try:
    PK.MIMC_BLOCK = True
    h_blk = np.asarray(jax.device_get(PK.pl_mimc_multi(x_l)))
    assert from_limbs(h_blk[None, :])[0] == want, "MIMC_BLOCK kernel diverges"
finally:
    PK.MIMC_BLOCK = _saved_block
print("MIMC_BLOCK=True parity OK")

# GKR_SEG_MXU=0: cumsum fallback instead of the MXU banded segment sum
os.environ["GKR_SEG_MXU"] = "0"
try:
    _w_nomxu = F.build_wiring(ag, mg, nf)
    assert _w_nomxu.mxu == (0, 0, 0, 0), "GKR_SEG_MXU=0 did not disable plan"
    proof_nm, chal_nm = F.prove_layer_sumcheck_fused(
        zf, w_vals, ag, mg, 3, kf, struct, _M(), use_pallas=True,
        wiring=_w_nomxu)
    assert proof_nm == proof_h and chal_nm == chal_h, \
        "GKR_SEG_MXU=0 transcript diverges"
finally:
    del os.environ["GKR_SEG_MXU"]
print("GKR_SEG_MXU=0 parity OK")

# GKR_FUSED_PHASE=0: eager per-round dispatches + scan tail (A/B shape).
# FUSED_PHASE is baked at module import, so flip the module constant.
_saved_fp = F.FUSED_PHASE
try:
    F.FUSED_PHASE = False
    proof_e, chal_e = F.prove_layer_sumcheck_fused(
        zf, w_vals, ag, mg, 3, kf, struct, _M(), use_pallas=True)
    assert proof_e == proof_h and chal_e == chal_h, \
        "GKR_FUSED_PHASE=0 transcript diverges"
finally:
    F.FUSED_PHASE = _saved_fp
print("GKR_FUSED_PHASE=0 parity OK")

# GKR_FOLD_PALLAS=0: XLA limb lowering instead of the Pallas mul in
# _multi_point_fold (read per call since round 5)
from gkr_tpu.jaxeng import backend as _B  # noqa: E402
_Wf = jnp.asarray(to_limbs(rand_fr(1 << 11)))
_pts = jnp.asarray(to_limbs(rand_fr(2 * 11)).reshape(2, 11, 16))
_f_pl = np.asarray(jax.device_get(_B._multi_point_fold(_Wf, _pts)))
os.environ["GKR_FOLD_PALLAS"] = "0"
try:
    _f_xla = np.asarray(jax.device_get(_B._multi_point_fold(_Wf, _pts)))
finally:
    del os.environ["GKR_FOLD_PALLAS"]
assert (_f_pl == _f_xla).all(), "GKR_FOLD_PALLAS paths diverge"
print("GKR_FOLD_PALLAS=0 parity OK")

# GKR_PACK_FAST=0: slow per-int packing path in limbs.pack
os.environ["GKR_PACK_FAST"] = "0"
try:
    _slow = np.asarray(jax.device_get(L.pack([int(v) for v in a_v[:64]])))
finally:
    del os.environ["GKR_PACK_FAST"]
_fast = np.asarray(jax.device_get(L.pack([int(v) for v in a_v[:64]])))
assert (_slow == _fast).all(), "GKR_PACK_FAST paths diverge"
print("GKR_PACK_FAST=0 parity OK")

print("ALL KERNELS OK")
