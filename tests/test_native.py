"""Native C++ core vs the NumPy golden model: must agree exactly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu import native
from ems_nbldpc_tpu.golden import decode_layered_golden, elementary_bubble
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.models.channels import ChannelSpec, bpsk_awgn, sigma_for

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


def test_elementary_step_matches_golden():
    rng = np.random.default_rng(0)
    q, nm = 64, 16
    for _ in range(50):
        v1 = np.sort(rng.random(nm) * 5)
        v2 = np.sort(rng.random(nm) * 5)
        g1 = rng.permutation(q)[:nm]
        g2 = rng.permutation(q)[:nm]
        for nb_oper in (10, 32, 64):
            gv, gg = elementary_bubble(v1, g1, v2, g2, nm, nb_oper)
            nv, ng = native.elementary_step(q, v1, g1, v2, g2, nm, nb_oper)
            np.testing.assert_allclose(nv, gv, rtol=1e-12)
            np.testing.assert_array_equal(ng, gg)


def test_decode_matches_golden_on_noisy_frames():
    code = registry.get_code("Mat24_N48_M24")
    frames = 24
    sigma = sigma_for(ChannelSpec(), 2.0, code.rate)
    cw = jnp.zeros((frames, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(3), cw, 64, sigma)
    intr = np.asarray(intr, dtype=np.float64)
    nd, ni, nc = native.decode_batch(
        code, intr, max_iters=10, nm=16, offset=0.3, nb_oper=32
    )
    for f in range(frames):
        gd, gi, gc = decode_layered_golden(
            code, intr[f], max_iters=10, nm=16, offset=0.3, nb_oper=32
        )
        assert gc == bool(nc[f]) and gi == int(ni[f]), f
        np.testing.assert_array_equal(nd[f], gd)


def test_native_throughput_smoke():
    code = registry.get_code("Mat24_N48_M24")
    sigma = sigma_for(ChannelSpec(), 3.0, code.rate)
    cw = jnp.zeros((64, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, 64, sigma)
    d, it, conv = native.decode_batch(
        code, np.asarray(intr, np.float64),
        max_iters=10, nm=16, offset=0.3, nb_oper=32,
    )
    assert conv.mean() > 0.95
    assert (d == 0).all(axis=1).mean() > 0.9


@pytest.mark.slow
def test_native_fer_curve_matches_jax():
    """Native C++ bubble-check EMS vs the JAX dense-superset EMS on many
    noisy frames: FER CIs must overlap (both ~C-reference behavior)."""
    from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
    from ems_nbldpc_tpu.utils.stats import overlapping

    code = registry.get_code("Mat24_N48_M24")
    frames = 3000
    sigma = sigma_for(ChannelSpec(), 2.0, code.rate)
    cw = jnp.zeros((frames, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(11), cw, 64, sigma)
    intr_np = np.asarray(intr, np.float64)
    nd, _, _ = native.decode_batch(
        code, intr_np, max_iters=10, nm=16, offset=0.3, nb_oper=32
    )
    nerr = int((nd != 0).any(axis=1).sum())
    cfg = DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                        nm=16, offset=0.3)
    jd, _, _ = decode(code, intr, cfg)
    jerr = int((np.asarray(jd) != 0).any(axis=1).sum())
    assert overlapping(nerr, frames, jerr, frames), (nerr, jerr)
