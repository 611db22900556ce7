import numpy as np

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.sim.mc import SimConfig
from ems_nbldpc_tpu.sim.snapshots import run_snapshots


def test_ber_snapshots_monotone():
    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=256, encode="zero",
        decoder=DecoderConfig(max_iters=30, schedule="layered", cn="ems",
                              nm=16, offset=0.3),
    )
    r = run_snapshots(code, cfg, budgets=(2, 5, 10, 20))
    assert r.frames == 256
    fers = [r.fer(b) for b in (2, 5, 10, 20)]
    # more iterations can only help (monotone within MC noise)
    assert fers[0] >= fers[-1]
    assert all(0 <= f <= 1 for f in fers)


def test_fake_bch_rule():
    code = registry.get_code("Mat24_N48_M24")
    base = dict(ebn0_db=1.5, frames_per_batch=256, encode="zero")
    dec = DecoderConfig(max_iters=6, schedule="layered", cn="ems", nm=16,
                        offset=0.3)
    r0 = run_snapshots(code, SimConfig(**base, decoder=dec), budgets=(6,))
    r12 = run_snapshots(
        code, SimConfig(**base, fake_bch_t=12, decoder=dec), budgets=(6,)
    )
    # the fake-BCH filter can only reduce counted frame errors
    assert r12.frame_errors[6] <= r0.frame_errors[6]


def test_twophase_matches_singlephase_fer():
    from ems_nbldpc_tpu.sim.twophase import run_twophase
    from ems_nbldpc_tpu.sim.mc import MonteCarlo

    code = registry.get_code("Mat24_N48_M24")
    cfg = SimConfig(
        ebn0_db=2.0, frames_per_batch=256, max_frames=256, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                              nm=16, offset=0.3),
    )
    r1 = MonteCarlo(code, cfg).run()
    r2 = run_twophase(code, cfg, phase_a_iters=2)
    # same RNG stream -> identical channel -> FER must match exactly
    # (phase B restarts from scratch with the full budget)
    assert r1.frame_errors == r2.frame_errors
    assert r1.frames == r2.frames


def test_sweep_resume_skips_done_points(tmp_path):
    from ems_nbldpc_tpu.sim.sweep import run_sweep

    code = registry.get_code("Mat24_N48_M24")
    base = SimConfig(
        ebn0_db=0, frames_per_batch=64, max_frames=64, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=3, schedule="layered", cn="ems",
                              nm=12, offset=0.3),
    )
    r1 = run_sweep(code, [2.0], base, out_dir=str(tmp_path), verbose=False)
    assert len(r1) == 1
    r2 = run_sweep(code, [2.0, 2.5], base, out_dir=str(tmp_path),
                   verbose=False, resume=True)
    assert len(r2) == 1  # 2.0 skipped, only 2.5 ran


def test_sweep_resume_does_not_skip_other_configs(tmp_path):
    """A resumed sweep with a different channel / budget / storage must
    NOT treat another config's recorded points as its own (round-3
    VERDICT weak item 6: resume used to match on five decoder fields
    only, so e.g. a Rayleigh sweep would skip points recorded by the
    plain-AWGN sweep at the same nm/schedule/cn/iters)."""
    import dataclasses

    from ems_nbldpc_tpu.models.channels import ChannelSpec
    from ems_nbldpc_tpu.sim.sweep import run_sweep

    code = registry.get_code("Mat24_N48_M24")
    base = SimConfig(
        ebn0_db=0, frames_per_batch=64, max_frames=64, stop_errors=10**9,
        decoder=DecoderConfig(max_iters=3, schedule="layered", cn="ems",
                              nm=12, offset=0.3),
    )
    assert len(run_sweep(code, [2.0], base, out_dir=str(tmp_path),
                         verbose=False)) == 1
    variants = [
        dataclasses.replace(base, channel=ChannelSpec(rayleigh=True)),
        dataclasses.replace(
            base, decoder=dataclasses.replace(base.decoder, nboper=24)),
        dataclasses.replace(
            base, decoder=dataclasses.replace(
                base.decoder, storage="compressed", dtype="bfloat16")),
        dataclasses.replace(base, stop_errors=40),
    ]
    for cfg in variants:
        r = run_sweep(code, [2.0], cfg, out_dir=str(tmp_path),
                      verbose=False, resume=True)
        assert len(r) == 1, "resume skipped a point from a different config"
    # ... while the SAME config still resumes
    r = run_sweep(code, [2.0], base, out_dir=str(tmp_path),
                  verbose=False, resume=True)
    assert len(r) == 0
