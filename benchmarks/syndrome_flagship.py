"""Flagship-scale syndrome-CN run: Declercq_64800_R12_GF256, cn="syndrome".

Full MC chain at the C syndrome recipe's operating point (NB_LDPC.c:188-200
enabled in the C binary by c_baseline.ensure_built(channel="syndrome")):
n_cv=45, trapeze d=(40,15,5) capped at 1000, bayes + presorting, 10 iters.
Dense f32 host loop, F=32 (the shape that fits this CN at DVB-T2 scale —
see benchmarks/NOTES.md round-2 syndrome section).

bf16 is FER-neutral for this CN (CPU A/B on rand48_gf256: 13/256 both
dtypes at 2.0 dB) and halves the [F, G, dc, C+1, q] one-hot intermediates
— the memory limiter at this scale — so F can double.

Usage: python benchmarks/syndrome_flagship.py [ebn0] [frames] [dtype] [F]
"""
import sys
import time

sys.path.insert(0, ".")

from ems_nbldpc_tpu.decoder.api import DecoderConfig  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig  # noqa: E402


def main(ebn0=1.5, frames=256, dtype="float32", f=32):
    code = registry.get_code("Declercq_64800_R12_GF256")
    cfg = SimConfig(
        ebn0_db=ebn0, frames_per_batch=f, max_frames=frames,
        stop_errors=10**9,
        decoder=DecoderConfig(
            max_iters=10, schedule="layered", cn="syndrome",
            loop="host", storage="dense", dtype=dtype,
            syn_ncv=45, syn_d=(40, 15, 5), syn_shape="trapeze",
            syn_max_configs=1000,
        ),
    )
    t0 = time.time()
    r = MonteCarlo(code, cfg).run(verbose=True)
    lo, hi = r.fer_ci
    print(
        f"flagship syndrome @{ebn0} dB: FER={r.fer:.4f} [{lo:.4f},{hi:.4f}]"
        f" ({r.frame_errors}/{r.frames}) avg_it={r.avg_iters:.2f} "
        f"{r.frames_per_s:.2f} frames/s  wall={time.time()-t0:.1f}s",
        flush=True,
    )


if __name__ == "__main__":
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1.5,
         int(sys.argv[2]) if len(sys.argv) > 2 else 256,
         sys.argv[3] if len(sys.argv) > 3 else "float32",
         int(sys.argv[4]) if len(sys.argv) > 4 else 32)
