"""Rotation-folded SPA check node (fht.fb_checknode_spa_fused).

The fused kernel replaces {rotate by h, WHT, products, IWHT, un-rotate}
with {row-permuted-Hadamard matmul, products, transposed matmul}: rotation
by h is linear over GF(2)^m, so it transposes through the WHT character
pairing into a static row permutation of the Hadamard matrix
(fht.mul_transpose_perm).  Must be numerically equivalent to the unfused
path, including h=0 padding lanes (which transform to the neutral w=1).
"""
import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu.decoder.graph import RotationPlan
from ems_nbldpc_tpu.gf import get_gf
from ems_nbldpc_tpu.ops.fht import (fb_checknode_spa, fb_checknode_spa_fused,
                                    hadamard, mul_transpose_perm)


@pytest.mark.parametrize("q", [16, 64, 256])
def test_fused_matches_rotate_wht_unrotate(q):
    rng = np.random.default_rng(0)
    gf = get_gf(q)
    f, g_dim, dc = 3, 5, 4
    coefs = rng.integers(1, q, size=(g_dim, dc))
    coefs[1, 2] = 0  # one padding lane
    plan = RotationPlan.build(coefs, gf)
    mvc = rng.random((f, g_dim, dc, q)).astype(np.float32) * 10
    mvc -= mvc.min(axis=-1, keepdims=True)
    x = jnp.asarray(mvc)

    vr = plan.apply(x.reshape(f, g_dim * dc, q), "in").reshape(x.shape)
    valid = jnp.asarray(coefs != 0)[None].repeat(f, 0)
    ref = fb_checknode_spa(vr, valid)
    ref = plan.apply(ref.reshape(f, g_dim * dc, q), "out").reshape(x.shape)
    got = fb_checknode_spa_fused(x, plan, gf)

    ref = np.asarray(ref - ref.min(-1, keepdims=True))
    got = np.asarray(got - got.min(-1, keepdims=True))
    m = np.asarray(valid, bool)
    np.testing.assert_allclose(got[m], ref[m], atol=1e-3)


def test_mul_transpose_perm_is_wht_rotation():
    # brute check of the identity WHT(x ∘ h^{-1})[u] == WHT(x)[t_h[u]]
    q = 64
    gf = get_gf(q)
    rng = np.random.default_rng(1)
    x = rng.random(q)
    h = 37
    hinv = int(gf.inv(h))
    rot = x[np.asarray(gf.mul_table[hinv])]          # rot[u] = x[h^-1 u]
    hmat = hadamard(q)
    t = mul_transpose_perm(gf, h)
    np.testing.assert_allclose(hmat @ rot, (hmat @ x)[t], atol=1e-9)


def test_fused_e2e_decisions_match_unfused():
    import jax

    import ems_nbldpc_tpu.decoder.flooding as flo
    import ems_nbldpc_tpu.decoder.layered as lay
    from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
    from ems_nbldpc_tpu.models import registry
    from ems_nbldpc_tpu.models.channels import (ChannelSpec, bpsk_awgn,
                                                sigma_for)

    code = registry.get_code("Mat24_N48_M24")
    f = 64
    cw = jnp.zeros((f, code.n), jnp.int32)
    sigma = sigma_for(ChannelSpec(), 2.0, code.rate)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(1), cw, code.q, sigma)
    out = {}
    try:
        for fused in (True, False):
            lay.SPA_FUSED = flo.SPA_FUSED = fused
            for sched in ("layered", "flooding"):
                cfg = DecoderConfig(max_iters=8, schedule=sched, cn="spa")
                d, it, _ = decode(code, intr, cfg)
                out[(fused, sched)] = (np.asarray(d), np.asarray(it))
    finally:
        lay.SPA_FUSED = flo.SPA_FUSED = True
    for sched in ("layered", "flooding"):
        assert (out[(True, sched)][0] == out[(False, sched)][0]).all()
        assert (out[(True, sched)][1] == out[(False, sched)][1]).all()
