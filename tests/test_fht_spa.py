import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.ops.fht import (
    costs_to_probs,
    fb_checknode_spa,
    hadamard,
)
from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig


def test_hadamard_orthogonal():
    for q in (4, 16, 64):
        h = hadamard(q)
        np.testing.assert_allclose(h @ h.T, q * np.eye(q))


def test_spa_cn_matches_bruteforce_convolution():
    """out_i[s] = sum over others with XOR == s of the product of their
    probabilities — exact check against enumeration."""
    rng = np.random.default_rng(0)
    q, dc = 8, 4
    cost = rng.random((1, 1, dc, q)).astype(np.float32) * 6
    p = np.asarray(costs_to_probs(jnp.asarray(cost)))[0, 0]
    got_cost = np.asarray(fb_checknode_spa(jnp.asarray(cost)))[0, 0]
    got_p = np.asarray(costs_to_probs(jnp.asarray(got_cost)))
    for i in range(dc):
        others = [j for j in range(dc) if j != i]
        expect = np.zeros(q)
        for combo in itertools.product(range(q), repeat=dc - 1):
            s, pr = 0, 1.0
            for j, sym in zip(others, combo):
                s ^= sym
                pr *= p[j, sym]
            expect[s] += pr
        expect /= expect.sum()
        np.testing.assert_allclose(got_p[i], expect, rtol=2e-3, atol=1e-6)


def test_spa_decoder_beats_or_matches_minsum():
    code = registry.get_code("Mat24_N48_M24")
    fers = {}
    for cn in ["minsum", "spa"]:
        cfg = SimConfig(
            ebn0_db=1.8, frames_per_batch=768, max_frames=768,
            stop_errors=10**9,
            decoder=DecoderConfig(max_iters=10, schedule="layered", cn=cn),
        )
        fers[cn] = MonteCarlo(code, cfg).run().fer
    # SPA is the quality ceiling; allow MC slack
    assert fers["spa"] <= fers["minsum"] * 1.3 + 0.01, fers


def test_blocked_wht_matches_concat_grouped():
    """NBLDPC_SPA_GROUPED=blocked (one batched einsum over coefficient
    blocks) must equal the per-group concat lowering to float precision,
    including codes with many distinct coefficients and h=0 padding."""
    import os

    import numpy as np

    from ems_nbldpc_tpu import gf as gfmod
    from ems_nbldpc_tpu.decoder.graph import RotationPlan
    from ems_nbldpc_tpu.ops import fht

    g = gfmod.get_gf(256)
    rng = np.random.default_rng(21)
    coefs = rng.choice(np.arange(0, 256), size=(41,))  # many groups + h=0
    coefs[::13] = 0
    rp = RotationPlan.build(coefs, g)
    assert len(rp.bounds) > 16
    x = jnp.asarray(rng.standard_normal((3, 41, 256)), jnp.float32)
    for d in ("in", "out"):
        blocked = fht.blocked_wht(x, rp, g, d)
        os.environ["NBLDPC_SPA_GROUPED"] = "concat"
        try:
            concat = fht.grouped_wht(x, rp, g, d)
        finally:
            del os.environ["NBLDPC_SPA_GROUPED"]
        np.testing.assert_allclose(np.asarray(blocked), np.asarray(concat),
                                   rtol=1e-5, atol=1e-4)


def test_spa_fused_blocked_decodes_like_concat():
    """End-to-end: the SPA layered decode with blocked grouped-WHT must
    produce the same decisions as the concat lowering."""
    import os

    import jax
    import numpy as np

    from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode
    from ems_nbldpc_tpu.decoder.graph import DeviceGraph
    from ems_nbldpc_tpu.models import registry
    from ems_nbldpc_tpu.models.channels import (
        ChannelSpec, bpsk_awgn, sigma_for,
    )

    code = registry.get_code("Mat212_N96_M16")  # GF(64), many coefficients
    g = DeviceGraph.from_code(code)
    key = jax.random.PRNGKey(3)
    sigma = sigma_for(ChannelSpec(), 3.0, code.rate)
    cw = jnp.zeros((32, code.n), jnp.int32)
    intr, _ = bpsk_awgn(key, cw, code.q, sigma)
    cfg = DecoderConfig(max_iters=8, schedule="layered", cn="spa")
    os.environ["NBLDPC_SPA_GROUPED"] = "blocked"
    try:
        d_blk, _, c_blk = decode(g, intr, cfg)
    finally:
        del os.environ["NBLDPC_SPA_GROUPED"]
    os.environ["NBLDPC_SPA_GROUPED"] = "concat"
    try:
        d_cat, _, c_cat = decode(g, intr, cfg)
    finally:
        del os.environ["NBLDPC_SPA_GROUPED"]
    assert (np.asarray(d_blk) == np.asarray(d_cat)).mean() > 0.999
    assert (np.asarray(c_blk) == np.asarray(c_cat)).all()
