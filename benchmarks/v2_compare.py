"""End-to-end cross-check against the v2 standalone program (VERDICT r2
item 5 / next 9).

The v2 program (EMS_HS_L-BubbleCheck_UBS_decoder_v2.c) differs from the
main reference: 256QAM uniform-grid channel with per-symbol Rayleigh
fading in max-convention (v2:1167-1502), horizontal schedule with
truncated VtoC/CtoV lists, L-bubble (nl=4) elementary step, and the
"fake BCH" FER rule — >12 info-bit errors at the 10/20/.../50-iteration
snapshots (v2:2183-2291).  FER_1 (first snapshot) = frames with >12
info-bit errors in the decision after 9 message-passing sweeps (the
snapshot reads `decide` from the END of the previous iteration,
v2:2185-2197, and early-converged frames break out with a correct
decision).

Framework equivalents: ChannelSpec(kind="qam", labeling="v2",
rayleigh=True, "snr") at SNR + 10*log10(8) (v2's grid carries mean
symbol power 8, v2:1442-1452; ours is unit-power — exact rescaling),
DecoderConfig(cn_impl="lbubble", storage="compressed", max_iters=9),
SimConfig(fake_bch_t=12).

NOTE (GF(256) only): at GF(64) the v2 channel indexes BinGF_256 and
reads 8 bits from logGF=6-column NBIN rows — out of bounds (v2:1455,
2068) — so only a GF(256) code gives well-defined behavior to match.

Usage: python benchmarks/v2_compare.py c [snr frames]   (v2 binary side)
       python benchmarks/v2_compare.py fw [snr frames]  (framework side)
"""
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, ".")

MATRIX = "benchmarks/results_r2/rand48_gf256.ubs"
BUILD = "/tmp/nbldpc_v2_build"
REF_V2 = "/root/reference/EMS_HS_L-BubbleCheck_UBS_decoder_v2.c"
NM, OFFSET, NBOPER = 32, 1.0, 64


def run_c(snr=9.0, frames=1000):
    os.makedirs(BUILD, exist_ok=True)
    exe = os.path.join(BUILD, "v2")
    if not os.path.exists(exe):
        src = os.path.join(BUILD, "v2.c")
        shutil.copy(REF_V2, src)
        subprocess.run(["gcc", "-O3", "-o", exe, src, "-lm"], check=True,
                       capture_output=True)
    mat = os.path.join(BUILD, os.path.basename(MATRIX))
    if not os.path.exists(mat):
        shutil.copy(MATRIX, mat)
    t0 = time.perf_counter()
    out = subprocess.run(
        [exe, str(frames), "10", mat, str(snr), str(NM), str(OFFSET),
         str(NBOPER)],
        capture_output=True, text=True, timeout=3600,
    ).stdout
    dt = time.perf_counter() - t0
    m = re.findall(r"<(\d+)> FER= (\d+)/ (\d+) = [\d.e-]+ BER= (\d+)/", out)
    und, errs, tot, bits = map(int, m[-5])  # FER_1 = 10-iteration snapshot
    print(f"v2 binary @{snr} dB: FER_1={errs}/{tot}={errs / tot:.4f} "
          f"bit_errs={bits} undetected={und} {tot / dt:.1f} frames/s")


def run_fw(snr=9.0, frames=1000):
    from ems_nbldpc_tpu.decoder.api import DecoderConfig
    from ems_nbldpc_tpu.models import registry
    from ems_nbldpc_tpu.models.channels import ChannelSpec
    from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig

    import numpy as np

    code = registry.get_code(MATRIX)
    cfg = SimConfig(
        ebn0_db=snr + 10.0 * np.log10(8.0),
        frames_per_batch=min(500, frames),
        max_frames=frames,
        stop_errors=10**9,
        fake_bch_t=12,
        channel=ChannelSpec(kind="qam", labeling="v2", rayleigh=True,
                            sigma_convention="snr"),
        decoder=DecoderConfig(max_iters=9, schedule="layered", cn="ems",
                              nm=NM, offset=OFFSET, nboper=NBOPER,
                              cn_impl="lbubble", storage="compressed",
                              dtype="float32"),
        encode="device",
    )
    t0 = time.time()
    r = MonteCarlo(code, cfg).run(verbose=True)
    lo, hi = r.fer_ci
    print(f"framework @{snr} dB (v2 rules): FER={r.fer:.4f} "
          f"[{lo:.4f},{hi:.4f}] ({r.frame_errors}/{r.frames}) "
          f"undetected={r.undetected_errors} avg_it={r.avg_iters:.2f} "
          f"{r.frames_per_s:.1f} frames/s wall={time.time()-t0:.1f}s")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "c"
    snr = float(sys.argv[2]) if len(sys.argv) > 2 else 9.0
    frames = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    (run_c if which == "c" else run_fw)(snr, frames)
