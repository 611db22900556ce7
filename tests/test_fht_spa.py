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
