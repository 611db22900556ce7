"""Compile-level regression: the sharded MC step must stay collective-lean.

The whole multi-chip scaling story (benchmarks/results_r3/SCALING.md) rests
on the compiled sharded batch step containing no cross-device traffic
except the s32[5] counter all-reduce.  A sharding mistake (e.g. a replicated
operand that XLA decides to all-gather, or an accidental axis constraint on
the decode state) would silently turn the embarrassingly-parallel sweep into
a bandwidth-bound one; this test catches that at compile time.
"""
import re
from collections import Counter

import jax
import jax.numpy as jnp

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.parallel.mesh import make_mesh, sharded_batch_step
from ems_nbldpc_tpu.sim.mc import SimConfig

COLL = r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"


def test_sharded_step_has_only_counter_allreduces():
    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=32, max_frames=32, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=4, schedule="layered", cn="ems",
                              nm=16, offset=0.3),
    )
    step = sharded_batch_step(code, cfg, make_mesh(8))
    hlo = jax.jit(step).lower(jax.random.PRNGKey(0),
                              jnp.float32(2.0)).compile().as_text()
    kinds = Counter(re.findall(COLL + r"[\w.]*\(", hlo))
    assert set(kinds) <= {"all-reduce"}, kinds
    # every all-reduce operates on the 5 int32 counters, nothing bigger
    for t in re.findall(r"= \(?([^=\n]*?)\)? all-reduce", hlo):
        assert "s32" in t and "5" in t, t
