import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu.models.channels import (
    ChannelSpec,
    bpsk_awgn,
    channel_2d,
    constellation,
    intrinsic_from_bpsk,
    qam256_4d,
    sigma_for,
    simulate,
)


def test_sigma_conventions():
    # Eb/N0 convention (channel.c:51): sigma = sqrt(1/(2*rate*10^(x/10)))
    s = sigma_for(ChannelSpec(), 2.0, 0.5)
    assert np.isclose(s, np.sqrt(1.0 / (2 * 0.5 * 10 ** 0.2)))
    # SNR convention (channel.c:598)
    s2 = sigma_for(ChannelSpec(sigma_convention="snr"), 2.0, 0.5)
    assert np.isclose(s2, np.sqrt(1.0 / (2 * 10 ** 0.2)))


def test_bpsk_cost_matches_direct_formula():
    """The matmul demapper must equal the reference's per-symbol squared
    distance (channel.c:66-76) up to the per-symbol min normalization."""
    q, sigma = 16, 0.7
    rng = np.random.default_rng(0)
    y = rng.normal(size=(3, 5, 4)).astype(np.float32)
    got = np.asarray(intrinsic_from_bpsk(jnp.asarray(y), q, sigma))
    bits = (np.arange(q)[:, None] >> np.arange(4)[None]) & 1
    direct = np.zeros((3, 5, q))
    for g in range(q):
        d = (y - (1 - 2 * bits[g])[None, None]) ** 2
        direct[..., g] = d.sum(-1) / (2 * sigma * sigma)
    direct -= direct.min(-1, keepdims=True)
    np.testing.assert_allclose(got, direct, rtol=1e-4, atol=1e-4)


def test_noise_statistics():
    key = jax.random.PRNGKey(0)
    cw = jnp.zeros((64, 32), jnp.int32)
    sigma = 0.8
    _, y = bpsk_awgn(key, cw, 64, sigma)
    y = np.asarray(y)
    # transmitted all-zero -> all bits 0 -> +1 BPSK
    assert abs(y.mean() - 1.0) < 0.02
    assert abs(y.std() - sigma) < 0.02


@pytest.mark.parametrize("q", [16, 64, 256])
def test_constellations_unit_power(q):
    pts = constellation("qam", q)
    assert pts.shape == (q, 2)
    assert np.isclose((pts ** 2).sum(1).mean(), 1.0, atol=1e-5)
    # gray property: adjacent I-levels differ in one bit of the I index
    pts64 = constellation("apsk64", 64)
    assert np.isclose((pts64 ** 2).sum(1).mean(), 1.0, atol=1e-5)


def test_true_symbol_has_lowest_cost_at_high_snr():
    key = jax.random.PRNGKey(1)
    rng = np.random.default_rng(2)
    cw = jnp.asarray(rng.integers(0, 64, size=(8, 24)), jnp.int32)
    spec = ChannelSpec(kind="qam", sigma_convention="snr")
    cost = channel_2d(key, cw, 64, 0.02, spec)
    decide = np.asarray(jnp.argmin(cost, axis=-1))
    assert (decide == np.asarray(cw)).mean() > 0.999


def test_qam256_4d_shapes_and_decisions():
    key = jax.random.PRNGKey(3)
    rng = np.random.default_rng(4)
    cw = jnp.asarray(rng.integers(0, 256, size=(4, 10)), jnp.int32)
    cost = qam256_4d(key, cw, 0.05, ChannelSpec(kind="qam256_4d"))
    assert cost.shape == (4, 10, 256)
    decide = np.asarray(jnp.argmin(cost, axis=-1))
    assert (decide == np.asarray(cw)).mean() > 0.99


def test_erasures_and_fading_run():
    key = jax.random.PRNGKey(5)
    cw = jnp.zeros((4, 10), jnp.int32)
    for spec in [
        ChannelSpec(kind="qam", rayleigh=True),
        ChannelSpec(kind="qam", ssd=True, erasure_prob=0.1, rotated=True),
        ChannelSpec(kind="qam256_4d", ssd=True, erasure_prob=0.1),
    ]:
        q = 256 if spec.kind == "qam256_4d" else 64
        cost = simulate(key, cw, q, spec, 10.0, 0.5)
        assert np.isfinite(np.asarray(cost)).all()


def test_ref_labeling_matches_reference_tables():
    """The generated labeling='ref' constellations must equal the reference
    channel.h tables bit-exactly (up to the shared normalization)."""
    import os
    import re

    import pytest as _pytest

    path = "/root/reference/include/channel.h"
    if not os.path.exists(path):
        _pytest.skip("reference not available")
    src = open(path, encoding="latin-1").read()

    from ems_nbldpc_tpu.models.channels import constellation

    for name, q in (("16QAM", 16), ("64QAM", 64), ("256QAM", 256)):
        m = re.search(r"table_%s\[%d\]\[2\]=\s*\{(.*?)\};" % (name, q),
                      src, re.S)
        pairs = re.findall(r"\{\s*([-\d.]+)\s*,\s*([-\d.]+)\s*\}", m.group(1))
        ref = np.array([[float(a), float(b)] for a, b in pairs[:q]])
        ref = ref / np.sqrt((ref ** 2).sum(1).mean())
        ours = constellation("qam", q, rotated=False, labeling="ref")
        np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)

    csrc = open("/root/reference/channel.c", encoding="latin-1").read()
    m = re.search(r"float table_64APSK\[64\]\[2\]=\s*\{(.*?)\};", csrc, re.S)
    ent = re.findall(
        r"\{\s*([\d.]*)\s*\*?\s*cos\(\s*PI\s*\*\s*(\d+)\s*/\s*(\d+)\s*\)",
        m.group(1))
    ref = np.array([
        [(float(r) if r else 1.0) * np.cos(np.pi * int(n) / int(d)),
         (float(r) if r else 1.0) * np.sin(np.pi * int(n) / int(d))]
        for r, n, d in ent])
    ref = ref / np.sqrt((ref ** 2).sum(1).mean())
    ours = constellation("apsk64", 64, rotated=False, labeling="ref")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_ref_4d_table_matches_reference():
    """constellation_4d('ref') must equal table_256QAM_4D_16QAM_R
    (channel.h:686, the variant selected at channel.c:784-788) bit-exactly
    up to the norm_factor both sides apply (channel.c:800-814)."""
    import os
    import re

    import pytest as _pytest

    path = "/root/reference/include/channel.h"
    if not os.path.exists(path):
        _pytest.skip("reference not available")
    src = open(path, encoding="latin-1").read()
    m = re.search(r"table_256QAM_4D_16QAM_R\[256\]\[4\]=\s*\{(.*?)\n\};",
                  src, re.S)
    rows = re.findall(
        r"\{\s*([-\d.]+),\s*([-\d.]+),\s*([-\d.]+),\s*([-\d.]+)\}",
        m.group(1))
    ref = np.array(rows, dtype=float)
    assert ref.shape == (256, 4)
    ref = ref / np.sqrt((ref ** 2).sum(1).mean() / 2.0)

    from ems_nbldpc_tpu.models.channels import constellation_4d

    ours = constellation_4d("ref")
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def test_v2_labeling_matches_v2_tableau():
    """labeling='v2' must equal the v2 program's 256QAM TABLEAU
    (EMS_..._v2.c:1186-1443) bit-exactly up to its R scale factor."""
    import os
    import re

    import pytest as _pytest

    path = "/root/reference/EMS_HS_L-BubbleCheck_UBS_decoder_v2.c"
    if not os.path.exists(path):
        _pytest.skip("reference not available")
    src = open(path, encoding="latin-1").read()
    m = re.search(r"float TABLEAU\[256\]\[2\]=\{(.*?)\};", src, re.S)
    pairs = re.findall(r"(-?\d+\.\d+),\s*(-?\d+\.\d+)", m.group(1))
    ref = np.array(pairs, dtype=float)
    assert ref.shape == (256, 2)
    ref = ref / np.sqrt((ref ** 2).sum(1).mean())   # kill the R scale
    ours = constellation("qam", 256, rotated=False, labeling="v2")
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)
