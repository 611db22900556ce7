"""Device-side exact bubble emulation (ops/bubble_cn.py) vs the golden
oracle — the SURVEY §7.3 validation tool: the sequential 8-bubble /
L-bubble ElementaryStep (bubble_decoder.c:316-593; v2:1547-1701) as a
fori_loop on device, bit-exact against golden.elementary_bubble."""
import numpy as np
import jax.numpy as jnp
import pytest

from ems_nbldpc_tpu import golden
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.ops.bubble_cn import (elementary_bubble_batch,
                                          fb_checknode_bubble)


@pytest.fixture(scope="module")
def gf64():
    return registry.get_code("Mat24_N48_M24").gf


@pytest.mark.parametrize("variant", ["8", "L"])
@pytest.mark.parametrize("nm,nboper", [(8, 12), (12, 24), (16, 30)])
def test_elementary_exact_vs_golden(gf64, variant, nm, nboper):
    q = gf64.q
    rng = np.random.default_rng(int(nm * 100 + nboper))
    for trial in range(8):
        d1 = rng.random(q) * 9
        d2 = rng.random(q) * 9
        v1, g1 = golden.sort_truncate(d1, nm)
        v2, g2 = golden.sort_truncate(d2, nm)
        ref = (golden.elementary_bubble if variant == "8"
               else golden.elementary_lbubble)
        wv, wg = ref(v1, g1, v2, g2, nm, nboper)
        ov, og = elementary_bubble_batch(
            jnp.asarray(v1)[None], jnp.asarray(g1)[None],
            jnp.asarray(v2)[None], jnp.asarray(g2)[None],
            nm, nboper, q, variant=variant,
        )
        np.testing.assert_array_equal(np.asarray(og)[0], wg)
        np.testing.assert_allclose(np.asarray(ov)[0], wv, atol=1e-6)


def test_elementary_with_unfilled_tails(gf64):
    # outputs of earlier merges carry (BIG, -1) tails; feed one back in
    q = gf64.q
    rng = np.random.default_rng(7)
    nm, nboper = 12, 10  # tiny budget -> guaranteed unfilled tail
    d1 = rng.random(q) * 9
    d2 = rng.random(q) * 9
    v1, g1 = golden.sort_truncate(d1, nm)
    v2, g2 = golden.sort_truncate(d2, nm)
    mv, mg = golden.elementary_bubble(v1, g1, v2, g2, nm, nboper)
    assert (mg < 0).any(), "budget should leave unfilled slots"
    wv, wg = golden.elementary_bubble(mv, mg, v2, g2, nm, 24)
    ov, og = elementary_bubble_batch(
        jnp.asarray(mv)[None], jnp.asarray(mg)[None],
        jnp.asarray(v2)[None], jnp.asarray(g2)[None], nm, 24, q,
    )
    np.testing.assert_array_equal(np.asarray(og)[0], wg)
    np.testing.assert_allclose(np.asarray(ov)[0], wv, atol=1e-6)


@pytest.mark.parametrize("variant", ["8", "L"])
def test_checknode_exact_vs_golden(gf64, variant):
    q = gf64.q
    rng = np.random.default_rng(3)
    for dc, nm, nboper in [(4, 12, 24), (6, 16, 30)]:
        dense = rng.random((dc, q)) * 9
        vals, gfs = zip(*(golden.sort_truncate(dense[t], nm)
                          for t in range(dc)))
        coefs = np.ones(dc, dtype=np.int64)  # identity rotation: the CN
        # core is rotation-free; rotation is applied outside on device
        want = golden.check_pass_ems(
            list(vals), list(gfs), coefs, gf64.mul_table,
            golden._div_table(gf64), nm, nboper, 0.3, q, bubble=variant,
        )
        got = np.asarray(fb_checknode_bubble(
            jnp.asarray(dense)[None], nm, nboper, 0.3, variant=variant
        ))[0]
        np.testing.assert_allclose(got, want, atol=1e-6)


@pytest.mark.parametrize("impl", ["bubble", "lbubble"])
def test_e2e_decode_bubble_impl(impl):
    # the exact-emulation cn_impl decodes a noisy zero codeword end-to-end
    import jax

    from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
    from ems_nbldpc_tpu.models.channels import (ChannelSpec, bpsk_awgn,
                                                sigma_for)

    code = registry.get_code("Mat24_N48_M24")
    cw = jnp.zeros((8, code.n), jnp.int32)
    sigma = sigma_for(ChannelSpec(), 3.0, code.rate)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(2), cw, code.q, sigma)
    cfg = DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                        nm=16, offset=0.3, nboper=24, cn_impl=impl)
    d, it, conv = decode(code, intr, cfg)
    d = np.asarray(d)
    assert np.asarray(conv).mean() >= 0.75
    assert (d[np.asarray(conv)] == 0).all()
