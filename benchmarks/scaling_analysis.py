"""Compile-level scaling evidence for the sharded Monte-Carlo step.

The reference scales by forking one OS process per SNR point
(start.sh:18-22) with zero communication; the TPU-native design shards
the frame axis over a `jax.sharding.Mesh` and reduces only the five
error counters with `psum` (parallel/mesh.py).  This script compiles the
sharded batch step on a virtual CPU mesh and counts every collective XLA
actually inserted, with its operand type — the communication volume per
batch step, and therefore the whole weak-scaling story, in one number.

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling_analysis.py [matrix]

Expected (any code, any size): all-reduce on s32[5] only — tens of BYTES
per step, independent of N/q/batch, so frames/s/chip is flat in device
count until the host-side stop-rule serializes (it reads 5 scalars).
"""
import re
import sys
from collections import Counter

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from ems_nbldpc_tpu.decoder.api import DecoderConfig  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.parallel.mesh import (  # noqa: E402
    make_mesh, make_mesh_2d, sharded_batch_step, sharded_batch_step_2d,
)
from ems_nbldpc_tpu.sim.mc import SimConfig  # noqa: E402

COLL = r"(all-reduce|all-gather|reduce-scatter|collective-permute|all-to-all)"


def analyze(code, mesh_name, mesh, step_fn):
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=64, max_frames=64, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=6, schedule="layered", cn="ems",
                              nm=16, offset=0.3),
    )
    step = step_fn(code, cfg, mesh)
    hlo = jax.jit(step).lower(jax.random.PRNGKey(0),
                              jnp.float32(2.0)).compile().as_text()
    kinds = Counter(re.findall(COLL + r"[\w.]*\(", hlo))
    types = [m.strip()[:80] for m in
             re.findall(r"= \(?([^=\n]*?)\)? all-reduce", hlo)]
    print(f"{mesh_name}: collectives = {dict(kinds) or 'NONE'}")
    for t in types:
        print(f"  all-reduce operand: {t}")
    return kinds, types


def main(matrix="Mat24_N48_M24"):
    code = registry.get_code(matrix)
    k1, t1 = analyze(code, "1-D 8-device", make_mesh(8), sharded_batch_step)
    k2, t2 = analyze(code, "2-D 2x4 (hosts x chips)", make_mesh_2d(2, 4),
                     sharded_batch_step_2d)
    only_counters = all("s32" in t and "5" in t for t in t1 + t2)
    assert set(k1) | set(k2) <= {"all-reduce"}, (k1, k2)
    print("\nper-step communication: counter all-reduces only "
          f"({'s32[5] counters confirmed' if only_counters else t1 + t2}); "
          "decode itself is collective-free => weak scaling is flat in "
          "device count (frames i.i.d., SURVEY.md section 2.5)")


if __name__ == "__main__":
    main(*sys.argv[1:])
