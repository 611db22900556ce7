import numpy as np
import jax.numpy as jnp

from ems_nbldpc_tpu.ops.minconv import (
    ems_input_truncate,
    fb_checknode_dense,
    fb_checknode_topk,
    minconv_topk,
    minconv_xor,
    topk_message,
)


def test_minconv_topk_equals_dense_on_truncated_input():
    rng = np.random.default_rng(0)
    q, nm = 64, 16
    a = jnp.asarray(rng.random((5, q)).astype(np.float32) * 10)
    b = jnp.asarray(rng.random((5, q)).astype(np.float32) * 10)
    bv, bg = topk_message(b, nm)
    got = np.asarray(minconv_topk(a, bv, bg))
    want = np.asarray(minconv_xor(a, ems_input_truncate(b, nm)))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_fb_topk_full_nm_equals_dense():
    rng = np.random.default_rng(1)
    q, dc = 32, 5
    v = jnp.asarray(rng.random((2, 3, dc, q)).astype(np.float32) * 8)
    np.testing.assert_allclose(
        np.asarray(fb_checknode_topk(v, q)),
        np.asarray(fb_checknode_dense(v)),
        rtol=1e-6,
    )


def test_fb_topk_upper_bounds_dense():
    """Truncation can only lose candidates -> costs are >= the dense ones."""
    rng = np.random.default_rng(2)
    q, dc, nm = 64, 4, 8
    v = jnp.asarray(rng.random((4, 2, dc, q)).astype(np.float32) * 6)
    top = np.asarray(fb_checknode_topk(v, nm))
    dense = np.asarray(fb_checknode_dense(v))
    assert np.all(top >= dense - 1e-6)
    # and the best output (the all-best combination) survives truncation
    np.testing.assert_allclose(
        top.min(axis=-1), dense.min(axis=-1), rtol=1e-6
    )


def test_fb_topk_padding_neutral():
    # nm = q so truncation is lossless: isolates the padding logic.  (With
    # nm < q, padding adds one extra truncated combine to the chain, so
    # outputs may differ slightly from the unpadded call — by design.)
    rng = np.random.default_rng(3)
    q, dc, nm = 16, 5, 16
    v = rng.random((2, 3, dc, q)).astype(np.float32)
    valid = jnp.asarray(np.array([True] * 4 + [False]))
    out_pad = np.asarray(
        fb_checknode_topk(jnp.asarray(v), nm, valid[None, None, :])
    )
    out_ref = np.asarray(fb_checknode_topk(jnp.asarray(v[..., :4, :]), nm))
    np.testing.assert_allclose(out_pad[..., :4, :], out_ref, rtol=1e-5)
