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
