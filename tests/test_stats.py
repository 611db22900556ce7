import jax
import jax.numpy as jnp
import numpy as np

from ems_nbldpc_tpu.decoder.graph import DeviceGraph
from ems_nbldpc_tpu.decoder.stats import decode_flooding_stats
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.models.channels import ChannelSpec, bpsk_awgn, sigma_for


def test_decode_stats():
    code = registry.get_code("Mat24_N48_M24")
    g = DeviceGraph.from_code(code)
    sigma = sigma_for(ChannelSpec(), 2.5, code.rate)
    cw = jnp.zeros((64, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, 64, sigma)
    st = decode_flooding_stats(g, intr, max_iters=8, nm=16, offset=0.3,
                               cn="ems")
    # convergence trace is monotone and ends near-complete
    assert (np.diff(st.conv_by_iter) >= 0).all()
    assert st.conv_by_iter[-1] >= 60
    assert st.avg_iters > 0
    # rank histogram: rank 0 (best x best) must dominate
    assert st.rank_hist.argmax() == 0
    assert st.rank_hist.sum() > 0
