"""Measure BASELINE.json configs 3 and 5 on the TPU vs the C binary.

Config 3: Mat212_N480_M80 GF(64) irregular-rate code, layered schedule +
early syndrome termination.  Config 5: Ahmed_64800_R910_GF256 high-rate
DVB-T2-size code (the multi-host sweep shape; single-chip numbers here,
mesh execution covered by __graft_entry__.dryrun_multichip and the
shard_map tests).

Usage:  python benchmarks/baseline_configs.py {mat212|ahmed} [ebn0] [frames]

C anchors (essai_ubs, single core, this host) are produced by
benchmarks/c_baseline.measure with the same (nm, offset, nbOper, iters).
"""
import sys
import time

sys.path.insert(0, ".")

from ems_nbldpc_tpu.decoder.api import DecoderConfig  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig  # noqa: E402

CONFIGS = {
    # layered + early termination at the reference sweep defaults
    # (start.sh:7-12: 10 it, nm=30, offset=0.3, nbOper=45).
    # NOTE: dense storage performs the exact top-nm merge and IGNORES the
    # nbOper budget (decoder/api.py:25-29) — a strict superset of every
    # budget-limited bubble trajectory, so its FER can sit slightly left
    # of C.  "mat212_list" below is the budget-matched variant (compressed
    # truncated-list CN honoring nbOper) for the FER-parity column.
    "mat212": dict(
        matrix="Mat212_N480_M80",
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                              nm=30, offset=0.3, nboper=45),
        ebn0=4.0, frames=4096, batch=2048,
    ),
    "mat212_list": dict(
        matrix="Mat212_N480_M80",
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                              nm=30, offset=0.3, nboper=45,
                              storage="compressed", dtype="bfloat16"),
        ebn0=4.0, frames=4096, batch=2048,
    ),
    # flagship-style operating point at GF(256) (nm=32, nbOper=64),
    # compressed truncated-list EMS storage
    "ahmed": dict(
        matrix="Ahmed_64800_R910_GF256",
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                              nm=32, offset=0.3, nboper=64,
                              storage="compressed", dtype="bfloat16"),
        ebn0=3.5, frames=128, batch=128,
    ),
    # same code decoded with the headline WHT-SPA check node
    "ahmed_spa": dict(
        matrix="Ahmed_64800_R910_GF256",
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="spa"),
        ebn0=3.5, frames=256, batch=128,
    ),
}


def main(which, ebn0=None, frames=None, batch=None, loop=None):
    c = CONFIGS[which]
    if loop is not None:
        # host loop = one short XLA execution per iteration; the tunneled
        # TPU worker survives it far better than monolithic while_loops
        # in its crash-prone windows (benchmarks/NOTES.md)
        from dataclasses import replace
        c = dict(c, decoder=replace(c["decoder"], loop=loop))
    code = registry.get_code(c["matrix"])
    max_frames = c["frames"] if frames is None else frames
    cfg = SimConfig(
        ebn0_db=c["ebn0"] if ebn0 is None else ebn0,
        frames_per_batch=min(c["batch"] if batch is None else batch,
                             max_frames),
        max_frames=max_frames,
        stop_errors=10**9,
        decoder=c["decoder"],
    )
    t0 = time.time()
    r = MonteCarlo(code, cfg).run(verbose=True)
    lo, hi = r.fer_ci
    print(
        f"{c['matrix']} @{cfg.ebn0_db} dB {which}: "
        f"FER={r.fer:.5f} [{lo:.5f},{hi:.5f}] ({r.frame_errors}/{r.frames}) "
        f"avg_it={r.avg_iters:.2f} {r.frames_per_s:.2f} frames/s "
        f"({r.info_mbps:.3f} info Mb/s)  wall={time.time()-t0:.1f}s"
    )


if __name__ == "__main__":
    if len(sys.argv) < 2 or sys.argv[1] not in CONFIGS:
        sys.exit(f"usage: python benchmarks/baseline_configs.py "
                 f"{{{'|'.join(CONFIGS)}}} [ebn0] [frames] [batch] [loop]")
    main(sys.argv[1],
         float(sys.argv[2]) if len(sys.argv) > 2 else None,
         int(sys.argv[3]) if len(sys.argv) > 3 else None,
         int(sys.argv[4]) if len(sys.argv) > 4 else None,
         sys.argv[5] if len(sys.argv) > 5 else None)
