import jax
import numpy as np

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.parallel.mesh import make_mesh, run_sharded
from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig


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


def test_sharded_fer_statistically_matches_single_device():
    code = registry.get_code("Mat24_N48_M24")
    dec = DecoderConfig(max_iters=8, schedule="flooding", cn="minsum")
    cfg1 = SimConfig(ebn0_db=1.5, frames_per_batch=256, max_frames=256,
                     stop_errors=10**9, decoder=dec)
    r1 = MonteCarlo(code, cfg1).run()
    cfg8 = SimConfig(ebn0_db=1.5, frames_per_batch=32, max_frames=256,
                     stop_errors=10**9, decoder=dec)
    r8 = run_sharded(code, cfg8, make_mesh(8))
    # both around the true FER (~0.2 at 1.5 dB); loose binomial agreement
    assert abs(r1.fer - r8.fer) < 0.15
    assert r1.frames == r8.frames == 256


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
