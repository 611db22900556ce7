import numpy as np
import pytest

from ems_nbldpc_tpu.gf import get_gf


@pytest.mark.parametrize("q", [4, 8, 16, 64, 256])
def test_field_axioms(q):
    gf = get_gf(q)
    a = np.arange(q)
    # mul table symmetric, 1 is identity, 0 annihilates
    t = gf.mul_table
    assert np.array_equal(t, t.T)
    assert np.array_equal(t[1], a)
    assert np.all(t[0] == 0)
    # every nonzero row is a permutation of 0..q-1
    for i in range(1, q):
        assert np.array_equal(np.sort(t[i]), a)
    # inverses
    nz = a[1:]
    assert np.all(gf.mul(nz, gf.inv(nz)) == 1)
    # distributivity on random triples
    rng = np.random.default_rng(0)
    x, y, z = rng.integers(0, q, size=(3, 1000))
    assert np.all(gf.mul(x, y ^ z) == (gf.mul(x, y) ^ gf.mul(x, z)))
    # associativity
    assert np.all(gf.mul(gf.mul(x, y), z) == gf.mul(x, gf.mul(y, z)))


@pytest.mark.parametrize("q", [16, 64, 256])
def test_matches_reference_power_convention(q):
    """The reference's MULGF is exponent arithmetic in the power rep
    (init.c:65-88): for k>=1, symbol k = alpha^(k-1)."""
    gf = get_gf(q)
    rng = np.random.default_rng(1)
    i, j = rng.integers(1, q, size=(2, 500))
    # reference MULGF[i][j] for i,j >= 2: ((i+j-2) mod (q-1)) + 1
    ref = np.where(
        (i == 1), j, np.where((j == 1), i, ((i + j - 2) % (q - 1)) + 1)
    )
    mine = gf.poly_to_power[
        gf.mul(gf.power_to_poly[i], gf.power_to_poly[j])
    ]
    assert np.array_equal(mine, ref)


def test_binary_images_spot_values():
    # Spot anchors from the reference BinGF tables (struct.h:119-476):
    # GF(16), X^4+X+1: alpha^4 = X+1 -> poly value 0b0011 = 3.
    gf16 = get_gf(16)
    assert gf16.exp[4] == 3
    # GF(64), X^6+X+1: alpha^6 = X+1 -> 3.
    assert get_gf(64).exp[6] == 3
    # GF(256), X^8+X^4+X^3+X^2+1: alpha^8 = X^4+X^3+X^2+1 -> 0b00011101 = 29.
    assert get_gf(256).exp[8] == 29


def test_bits_roundtrip():
    gf = get_gf(64)
    a = np.arange(64)
    assert np.array_equal(gf.from_bits(gf.bits(a)), a)
    assert np.array_equal(gf.bits(5), [1, 0, 1, 0, 0, 0])
