from gkr_tpu.keccak import keccak256
from gkr_tpu.mimc import EthsnarksMimc, Mimc7, mimc7_constants


def test_keccak_vectors():
    # Ethereum-style (legacy-padding) Keccak-256 known answers
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470")
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45")
    assert keccak256(b"The quick brown fox jumps over the lazy dog").hex() == (
        "4d741b6f1eb29cb2a9b9911c82f56fa8d73b04959d3d9d222895df6c0b28aa15")


def test_mimc7_constants_match_circomlib():
    cts = mimc7_constants()
    assert len(cts) == 91
    assert cts[0] == 0
    # c[1] as hard-coded in circomlib's MiMC7 template (keccak chain on "mimc")
    assert cts[1] == (
        20888961410941983456478427210666206549300505294776164667214940546594746570981)


def test_mimc7_hash_properties():
    m = Mimc7()
    h1 = m.multi_hash([1, 2, 3], 0)
    h2 = m.multi_hash([1, 2, 3], 0)
    h3 = m.multi_hash([1, 2, 4], 0)
    assert h1 == h2
    assert h1 != h3
    assert 0 <= h1 < (1 << 254)
    # Miyaguchi–Preneel structure: multi_hash([x]) = x + hash(x, 0)
    x = 42
    assert m.multi_hash([x], 0) == (x + m.hash(x, 0)) % __import__(
        "gkr_tpu.field", fromlist=["P"]).P


def test_ethsnarks_variant_differs():
    assert Mimc7().multi_hash([7], 0) != EthsnarksMimc().multi_hash([7], 0)
