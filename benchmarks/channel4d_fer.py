"""Framework-side FER for the 256QAM-4D channel (VERDICT r2 item 3).

Cross-checks ``channels.qam256_4d`` (ref labeling, per-dim Rayleigh +
10% per-dim erasures, SNR sigma convention) against the C binary built
with ``ModelChannel_AWGN_256QAM_4D`` (``c_baseline.ensure_built(fmt='ubs',
channel='qam256_4d')``; reference channel.c:749-929) on the round-2
rand48_gf256.ubs cross-check code, at the shared EMS operating point
(nm=32, offset=0.3, nbOper=64, 10 iters).

Usage: python benchmarks/channel4d_fer.py [snr_db] [frames]
"""
import sys
import time

sys.path.insert(0, ".")

from ems_nbldpc_tpu.decoder.api import DecoderConfig  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.models.channels import ChannelSpec  # noqa: E402
from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig  # noqa: E402


def main(snr=12.0, frames=2000):
    code = registry.get_code("benchmarks/results_r2/rand48_gf256.ubs")
    cfg = SimConfig(
        ebn0_db=snr,
        frames_per_batch=min(1000, frames),
        max_frames=frames,
        stop_errors=10**9,
        channel=ChannelSpec(kind="qam256_4d", ssd=True, erasure_prob=0.1,
                            sigma_convention="snr"),
        decoder=DecoderConfig(max_iters=10, schedule="layered", cn="ems",
                              nm=32, offset=0.3, nboper=64,
                              storage="compressed", dtype="bfloat16"),
        encode="device",
    )
    t0 = time.time()
    r = MonteCarlo(code, cfg).run(verbose=True)
    lo, hi = r.fer_ci
    print(f"rand48_gf256 4D @{snr} dB: FER={r.fer:.5f} [{lo:.5f},{hi:.5f}] "
          f"({r.frame_errors}/{r.frames}) avg_it={r.avg_iters:.2f} "
          f"{r.frames_per_s:.1f} frames/s wall={time.time()-t0:.1f}s")


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 12.0,
         int(sys.argv[2]) if len(sys.argv) > 2 else 2000)
