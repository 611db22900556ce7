import jax
import numpy as np

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.parallel.mesh import make_mesh, run_sharded
from ems_nbldpc_tpu.sim.mc import SimConfig


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_counters_match_expected_scale():
    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=32, max_frames=8 * 32,
        stop_errors=10**9,
        decoder=DecoderConfig(max_iters=5, schedule="flooding", cn="minsum"),
    )
    mesh = make_mesh(8)
    r = run_sharded(code, cfg, mesh)
    assert r.frames == 8 * 32          # one batch: 32 frames x 8 devices
    assert 0 < r.frame_errors < r.frames
    assert r.iter_sum > 0


def test_sharded_counters_exactly_match_sequential_devices():
    """Mesh-vs-single-device equivalence as EXACT counter equality.

    A psum-dropping regression (commit cec6e93 class: the reduction
    intermittently vanished and half the errors were lost) must fail this
    deterministically — so instead of a loose FER bound, run the identical
    per-device PRNG streams through the 8-device shard_map step and
    through 8 sequential single-device steps and require the [5] integer
    counter totals to be equal."""
    import jax.numpy as jnp

    from ems_nbldpc_tpu.parallel.mesh import _shardable, sharded_batch_step
    from ems_nbldpc_tpu.sim.mc import make_batch_step

    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(ebn0_db=1.5, frames_per_batch=32, max_frames=256,
                    stop_errors=10**9,
                    decoder=DecoderConfig(max_iters=8, schedule="flooding",
                                          cn="minsum"))
    sstep = sharded_batch_step(code, cfg, make_mesh(8))
    key = jax.random.PRNGKey(7)
    tot8 = np.asarray(sstep(key), dtype=np.int64)

    # same per-device streams, decoded one device at a time (the device_step
    # in sharded_batch_step folds axis_index into the batch key)
    step, _ = make_batch_step(code, _shardable(cfg))
    jstep = jax.jit(step)
    pmat = jax.device_put(step.pmat)
    ebn0 = jnp.float32(cfg.ebn0_db)
    tot1 = np.zeros(5, np.int64)
    for idx in range(8):
        counters, _ = jstep(jax.random.fold_in(key, idx), ebn0, pmat)
        tot1 += np.asarray(counters, dtype=np.int64)
    assert tot1[1] > 0          # the point has real errors to drop
    np.testing.assert_array_equal(tot8, tot1)


def test_2d_mesh_hierarchical_reduction():
    from ems_nbldpc_tpu.parallel.mesh import make_mesh_2d, sharded_batch_step_2d

    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=16,
        decoder=DecoderConfig(max_iters=4, schedule="flooding", cn="minsum"),
    )
    mesh = make_mesh_2d(2, 4)   # 2 "hosts" x 4 "chips" on the virtual mesh
    step = sharded_batch_step_2d(code, cfg, mesh)
    counters = np.asarray(step(jax.random.PRNGKey(0)))
    assert counters[0] == 16 * 8
    assert counters[4] > 0      # iteration counts accumulated


def test_sharded_compressed_list_ems_gf256():
    """Round-1 VERDICT item 2: the big-code (compressed truncated-list EMS)
    decoder must run under shard_map — GF(256), dv=2/dc=4 graph shape."""
    from ems_nbldpc_tpu.models.code import random_regular
    from ems_nbldpc_tpu.parallel.mesh import sharded_batch_step

    code = random_regular(32, 16, 256, dv=2, seed=3)
    cfg = SimConfig(
        ebn0_db=2.2, frames_per_batch=8, max_frames=64, stop_errors=10**9,
        decoder=DecoderConfig(
            max_iters=4, schedule="layered", cn="ems", nm=16, offset=0.3,
            nboper=32, storage="compressed", dtype="bfloat16",
        ),
    )
    mesh = make_mesh(8)
    r = run_sharded(code, cfg, mesh)
    assert r.frames == 64
    assert r.iter_sum > 0


def test_sharded_step_ebn0_is_traced():
    """Item 9: one compiled step serves a whole SNR sweep — the same step
    object must produce different counters for different Eb/N0 values."""
    import jax.numpy as jnp

    from ems_nbldpc_tpu.parallel.mesh import sharded_batch_step

    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=0.5, frames_per_batch=64, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=4, schedule="flooding", cn="minsum"),
    )
    mesh = make_mesh(8)
    step = sharded_batch_step(code, cfg, mesh)
    key = jax.random.PRNGKey(0)
    lo = np.asarray(step(key, jnp.float32(0.5)))
    hi = np.asarray(step(key, jnp.float32(4.0)))
    assert lo[1] > hi[1]   # far fewer frame errors at 4 dB
