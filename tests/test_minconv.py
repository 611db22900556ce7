import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from ems_nbldpc_tpu.ops.minconv import (
    INF,
    delta_message,
    ems_input_truncate,
    ems_output_saturate,
    fb_checknode_dense,
    minconv_xor,
)


def brute_minconv(a, b):
    q = a.shape[-1]
    out = np.full_like(a, np.inf)
    for s in range(q):
        for t in range(q):
            out[..., s] = np.minimum(out[..., s], a[..., t] + b[..., t ^ s])
    return out


def test_minconv_matches_bruteforce():
    rng = np.random.default_rng(0)
    q = 16
    a = rng.random((3, q)).astype(np.float32) * 10
    b = rng.random((3, q)).astype(np.float32) * 10
    got = np.asarray(minconv_xor(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, brute_minconv(a, b), rtol=1e-6)


def test_minconv_delta_identity():
    rng = np.random.default_rng(1)
    q = 64
    a = jnp.asarray(rng.random((2, q)).astype(np.float32))
    d = delta_message((2,), q)
    np.testing.assert_allclose(np.asarray(minconv_xor(a, d)), np.asarray(a))


def test_fb_checknode_exact_small():
    """Check against exhaustive enumeration: out_i[s] = min over the other
    symbols with XOR == s of their cost sum."""
    rng = np.random.default_rng(2)
    q, dc = 8, 4
    v = rng.random((1, 1, dc, q)).astype(np.float32) * 5
    got = np.asarray(fb_checknode_dense(jnp.asarray(v)))[0, 0]
    for i in range(dc):
        others = [j for j in range(dc) if j != i]
        expect = np.full(q, np.inf)
        for combo in itertools.product(range(q), repeat=dc - 1):
            s = 0
            c = 0.0
            for j, sym in zip(others, combo):
                s ^= sym
                c += v[0, 0, j, sym]
            expect[s] = min(expect[s], c)
        np.testing.assert_allclose(got[i], expect, rtol=1e-5)


def test_fb_checknode_padding_neutral():
    rng = np.random.default_rng(3)
    q, dc = 16, 5
    v = rng.random((2, 3, dc, q)).astype(np.float32)
    valid = jnp.asarray(np.array([True] * 4 + [False]))
    out_pad = np.asarray(
        fb_checknode_dense(jnp.asarray(v), valid[None, None, :])
    )
    out_ref = np.asarray(fb_checknode_dense(jnp.asarray(v[..., :4, :])))
    np.testing.assert_allclose(out_pad[..., :4, :], out_ref, rtol=1e-5)


def test_ems_truncation_rules():
    v = jnp.asarray(np.array([[0.0, 5.0, 1.0, 9.0, 2.0, 7.0, 3.0, 8.0]],
                             dtype=np.float32))
    out = np.asarray(ems_output_saturate(v, nm=4, offset=0.5))
    # 4 best kept (0,1,2,3), everything else clamped to 3 + 0.5
    np.testing.assert_allclose(out[0], [0, 3.5, 1, 3.5, 2, 3.5, 3, 3.5])
    trunc = np.asarray(ems_input_truncate(v, nm=4))
    # 4 best kept, everything else excluded (INF)
    np.testing.assert_allclose(trunc[0], [0, INF, 1, INF, 2, INF, 3, INF])


def test_dc2_passthrough():
    rng = np.random.default_rng(4)
    q = 16
    v = jnp.asarray(rng.random((1, 2, 2, q)).astype(np.float32))
    out = np.asarray(fb_checknode_dense(v))
    np.testing.assert_allclose(out[..., 0, :], np.asarray(v)[..., 1, :])
    np.testing.assert_allclose(out[..., 1, :], np.asarray(v)[..., 0, :])
