"""Golden-model tests: the NumPy bubble-check EMS oracle vs the JAX decoder.

The golden model reproduces the reference *algorithm* (nm-truncated sorted
messages, 8-bubble elementary step with nbOper budget, offset-saturated
dense expansion, strictly sequential layered sweep).  The JAX decoder is a
dense superset (unlimited candidate budget), so agreement is behavioral:
same decisions on easy frames, statistically matched FER on noisy ones.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
from ems_nbldpc_tpu.golden import (
    decode_layered_golden,
    elementary_bubble,
    sort_truncate,
)
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.models.channels import ChannelSpec, bpsk_awgn, sigma_for
from ems_nbldpc_tpu.models.encoder import gaussian_elimination, syndrome_np


def test_sort_truncate():
    dense = np.array([3.0, 1.0, 4.0, 1.5, 9.0, 0.5])
    vals, gfs = sort_truncate(dense, 3)
    np.testing.assert_allclose(vals, [0.0, 0.5, 1.0])
    assert list(gfs) == [5, 1, 3]


def test_elementary_bubble_basic():
    # two sorted lists; enough budget to fill everything reachable
    v1 = np.array([0.0, 1.0, 2.0, 3.0])
    g1 = np.array([0, 1, 2, 3])
    v2 = np.array([0.0, 0.5, 1.5, 2.5])
    g2 = np.array([0, 4, 5, 6])
    ov, og = elementary_bubble(v1, g1, v2, g2, nm=4, nb_oper=16)
    # best = 0+0 at GF 0; then 0+0.5 at GF 4 ...
    assert og[0] == 0 and ov[0] == 0.0
    assert og[1] == 4 and ov[1] == 0.5
    # outputs ascending, GF values distinct
    filled = og >= 0
    assert np.all(np.diff(ov[filled]) >= 0)
    assert len(set(og[filled].tolist())) == filled.sum()


def test_elementary_bubble_dedup():
    # colliding GF sums must be deduplicated (first=best wins)
    v1 = np.array([0.0, 1.0])
    g1 = np.array([2, 3])
    v2 = np.array([0.0, 1.0])
    g2 = np.array([2, 3])
    ov, og = elementary_bubble(v1, g1, v2, g2, nm=4, nb_oper=16)
    # sums: 2^2=0 (0.0), 2^3=1 (1.0), 3^2=1 (1.0, dup), 3^3=0 (2.0, dup)
    filled = og >= 0
    assert list(og[filled]) == [0, 1]
    np.testing.assert_allclose(ov[filled], [0.0, 1.0])


def test_golden_decodes_clean_frame():
    code = registry.get_code("Mat24_N48_M24")
    enc = gaussian_elimination(code)
    rng = np.random.default_rng(0)
    info = rng.integers(0, 64, size=(1, code.k))
    cw = enc.encode_np(info)[0]
    intr = np.full((code.n, 64), 30.0)
    intr[np.arange(code.n), cw] = 0.0
    # one wrong symbol, recoverable
    intr[5] = 30.0
    intr[5, cw[5] ^ 7] = 0.0
    intr[5, cw[5]] = 1.0
    decide, iters, conv = decode_layered_golden(
        code, intr, max_iters=10, nm=16, offset=0.3, nb_oper=32
    )
    assert conv and np.array_equal(decide, cw)


@pytest.mark.slow
def test_golden_fer_statistically_matches_jax():
    """Same channel realizations through both decoders at 2.0 dB."""
    code = registry.get_code("Mat24_N48_M24")
    frames = 120
    sigma = sigma_for(ChannelSpec(), 2.0, code.rate)
    cw = jnp.zeros((frames, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(7), cw, 64, sigma)
    intr_np = np.asarray(intr)
    gerr = 0
    for f in range(frames):
        d, _, _ = decode_layered_golden(
            code, intr_np[f], max_iters=10, nm=16, offset=0.3, nb_oper=32
        )
        gerr += int((d != 0).any())
    cfg = DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                        nm=16, offset=0.3)
    dec, _, _ = decode(code, intr, cfg)
    jerr = int((np.asarray(dec) != 0).any(axis=1).sum())
    # ~0.05 FER at 2 dB -> a handful of errors; decoders should be within
    # a few frames of each other on identical noise
    assert abs(gerr - jerr) <= max(4, int(0.5 * max(gerr, jerr)))


def test_lbubble_decodes_and_finds_best_candidate():
    from ems_nbldpc_tpu.golden import elementary_lbubble

    v1 = np.array([0.0, 1.0, 2.0, 3.0])
    g1 = np.array([0, 1, 2, 3])
    v2 = np.array([0.0, 0.5, 1.5, 2.5])
    g2 = np.array([0, 4, 5, 6])
    ov, og = elementary_lbubble(v1, g1, v2, g2, nm=4, nb_oper=16)
    assert og[0] == 0 and ov[0] == 0.0          # (0,0) seed always first
    filled = og >= 0
    assert np.all(np.diff(ov[filled]) >= 0)

    # full decode with the L-bubble CN corrects a single error
    code = registry.get_code("Mat24_N48_M24")
    enc = gaussian_elimination(code)
    info = np.random.default_rng(0).integers(0, 64, size=(1, code.k))
    cw = enc.encode_np(info)[0]
    intr = np.full((code.n, 64), 30.0)
    intr[np.arange(code.n), cw] = 0.0
    intr[5] = 30.0
    intr[5, cw[5] ^ 7] = 0.0
    intr[5, cw[5]] = 1.0
    decide, _, conv = decode_layered_golden(
        code, intr, max_iters=10, nm=16, offset=0.3, nb_oper=32, bubble="L"
    )
    assert conv and np.array_equal(decide, cw)
