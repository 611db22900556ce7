import numpy as np
import jax.numpy as jnp
import pytest

from ems_nbldpc_tpu.ops.minconv import fb_checknode_topk
from ems_nbldpc_tpu.ops.pallas_cn import fb_checknode_pallas


# interpret mode is slow: keep shapes tiny (correctness only; perf is
# measured on hardware via benchmarks/)
@pytest.mark.parametrize("dc,q,nm", [(4, 16, 8), (5, 32, 6)])
def test_pallas_cn_matches_xla_topk(dc, q, nm):
    rng = np.random.default_rng(0)
    t = 48
    vr = jnp.asarray(rng.random((t, dc, q)).astype(np.float32) * 9)
    want = np.asarray(fb_checknode_topk(vr, nm))
    got = np.asarray(fb_checknode_pallas(vr, nm, tile=16, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.tpu
def test_pallas_cn_on_device_matches_xla():
    # compiled (non-interpret) path on real TPU hardware; bit-exact vs the
    # XLA truncated combine (same op order, f32)
    rng = np.random.default_rng(1)
    vr = jnp.asarray(rng.random((64, 4, 64)).astype(np.float32) * 8)
    want = np.asarray(fb_checknode_topk(vr, 12))
    got = np.asarray(fb_checknode_pallas(vr, 12, tile=16, interpret=False))
    np.testing.assert_array_equal(got, want)


@pytest.mark.tpu
def test_pallas_cn_impl_e2e_decode():
    # cn_impl="pallas" end-to-end through the flooding decoder on device
    import jax

    from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
    from ems_nbldpc_tpu.models import registry
    from ems_nbldpc_tpu.models.channels import (ChannelSpec, bpsk_awgn,
                                                sigma_for)

    code = registry.get_code("Mat24_N48_M24")
    cw = jnp.zeros((32, code.n), jnp.int32)
    sigma = sigma_for(ChannelSpec(), 2.5, code.rate)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, code.q, sigma)
    outs = {}
    for impl in ("topk", "pallas"):
        cfg = DecoderConfig(max_iters=8, schedule="flooding", cn="ems",
                            nm=16, offset=0.3, cn_impl=impl)
        d, it, _ = decode(code, intr, cfg)
        outs[impl] = (np.asarray(d), np.asarray(it))
    assert (outs["topk"][0] == outs["pallas"][0]).all()
