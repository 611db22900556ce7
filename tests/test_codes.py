import glob
import os

import numpy as np
import pytest

from ems_nbldpc_tpu.models import code as code_mod
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.models.encoder import gaussian_elimination, syndrome_np

REF_DIR = "/root/reference/matrices"

SMALL_UBS = ["Mat24_N48_M24", "Mat24_N96_M48", "Mat212_N96_M16", "Mat26_N48_M16"]
SMALL_KN = ["KN/N96_K48_GF64.txt", "KN/N96_K48_GF256.txt", "KN/N128_K64_GF256.txt"]


@pytest.mark.parametrize("name", SMALL_UBS + SMALL_KN)
def test_load_and_encode(name):
    code = registry.get_code(name)
    assert code.q in (16, 64, 256)
    enc = gaussian_elimination(code)
    rng = np.random.default_rng(42)
    info = rng.integers(0, code.q, size=(8, code.k))
    cw = enc.encode_np(info)
    assert np.all(syndrome_np(code, cw) == 0)
    # systematic: info appears at the permuted positions
    pos = enc.systematic_positions()
    assert np.array_equal(cw[:, pos], info)
    # a corrupted word must fail the syndrome
    bad = cw.copy()
    bad[:, 0] ^= 1
    assert np.all(syndrome_np(code, bad) > 0)


@pytest.mark.slow
@pytest.mark.parametrize(
    "name",
    [os.path.basename(p) for p in sorted(glob.glob(REF_DIR + "/Mat*"))]
    + ["N96_K48_GF64", "KN/N576_K480_GF64.txt", "KN/N576_K288_GF64.txt"],
)
def test_load_all_small_shipped(name):
    code = registry.get_code(name)
    enc = gaussian_elimination(code)
    info = np.zeros((2, code.k), dtype=np.int64)
    info[1] = np.arange(code.k) % code.q
    cw = enc.encode_np(info)
    assert np.all(syndrome_np(code, cw) == 0)


def test_layers_partition():
    code = registry.get_code("Mat24_N48_M24")
    # dv=2, dc=4 codes: few conflict-free groups expected
    assert len(code.layers) <= code.dc_max * 2 + 2
    code.validate()


def test_random_regular_roundtrip():
    code = code_mod.random_regular(48, 24, 64, dv=2, seed=3)
    enc = gaussian_elimination(code)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 64, size=(4, code.k))
    cw = enc.encode_np(info)
    assert np.all(syndrome_np(code, cw) == 0)


def test_bit_generator_matches_symbol_encoder():
    code = registry.get_code("Mat24_N48_M24")
    enc = gaussian_elimination(code)
    gf = code.gf
    rng = np.random.default_rng(7)
    info = rng.integers(0, code.q, size=(5, code.k))
    cw = enc.encode_np(info)
    # bit path: parity_bits = info_bits @ P mod 2
    p = enc.bit_generator
    info_bits = gf.bits(info).reshape(info.shape[0], -1)
    par_bits = (info_bits @ p.astype(np.int64)) % 2
    parity = gf.from_bits(par_bits.reshape(info.shape[0], code.m_rows, gf.m))
    nsymb_parity = np.zeros((info.shape[0], code.n), dtype=np.int64)
    nsymb_parity[:, enc.perm[: code.m_rows]] = parity
    expect = cw.copy()
    expect[:, enc.systematic_positions()] = 0
    assert np.array_equal(nsymb_parity * (expect > 0), expect * (expect > 0))
    # exact: full codeword reconstruction
    full = nsymb_parity.copy()
    full[:, enc.systematic_positions()] = info
    assert np.array_equal(full, cw)


def test_alist_mackay_loads():
    code = registry.get_code("MacKay/q4.sp.9000.6000.4500.1", fmt="alist")
    assert code.q == 4 and code.n == 9000 and code.m_rows == 6000


def test_gzipped_alist_loads():
    code = registry.get_code("MacKay/q4.sp.9000.6000.4500.1.gz", fmt="alist")
    assert code.q == 4 and code.n == 9000
