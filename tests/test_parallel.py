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
