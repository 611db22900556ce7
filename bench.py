#!/usr/bin/env python
"""Driver benchmark: one JSON line with the headline metric.

Measures steady-state full-chain Monte-Carlo throughput (source -> encode ->
AWGN-BPSK -> layered EMS decode -> error accounting) on the reference's
default sweep code (KN N576_K480_GF64, start.sh:7-12) at Eb/N0 = 3.5 dB with
the reference's EMS settings (10 it, nm=30, offset=0.3), and compares with
the single-core C reference binary at the identical operating point.

Structure: the measurement runs in a child process under a hard timeout —
the tunneled TPU can wedge inside native calls where no Python-level
watchdog fires — and the parent falls back to the last successful result
(benchmarks/last_bench.json) if the child dies or hangs.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
CACHE = os.path.join(HERE, "benchmarks", "last_bench.json")
CHILD_TIMEOUT_S = 1200


def run_measurement():
    import numpy as np
    import jax

    sys.path.insert(0, HERE)
    from benchmarks.c_baseline import measure as c_measure
    from ems_nbldpc_tpu.decoder.api import DecoderConfig
    from ems_nbldpc_tpu.models import registry
    from ems_nbldpc_tpu.sim.mc import MonteCarlo, SimConfig

    matrix = "KN/N576_K480_GF64.txt"
    ebn0 = 3.5
    frames_per_batch = 4096

    code = registry.get_code(matrix)
    cfg = SimConfig(
        ebn0_db=ebn0,
        frames_per_batch=frames_per_batch,
        max_frames=frames_per_batch,
        stop_errors=10**9,
        decoder=DecoderConfig(
            max_iters=10, schedule="layered", cn="ems", nm=30, offset=0.3
        ),
    )
    mc = MonteCarlo(code, cfg)
    mc.run()  # warmup + compile
    t0 = time.perf_counter()
    batches = 3
    total = 0
    fer_stats = np.zeros(2)
    for _ in range(batches):
        r = mc.run()
        total += r.frames
        fer_stats += [r.frame_errors, r.frames]
    elapsed = time.perf_counter() - t0
    fps = total / elapsed
    fer = fer_stats[0] / fer_stats[1]

    cres = c_measure(matrix, ebn0, frames=2000)
    c_fps = cres["frames_per_s"] if cres else None
    vs = fps / c_fps if c_fps else None

    result = {
        "metric": "frames/s full MC chain, N576_K480_GF64 layered EMS "
                  "nm=30 @3.5dB, 1 chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(vs, 2) if vs else None,
        "extra": {
            "fer": round(float(fer), 5),
            "c_fer": round(cres["fer"], 5) if cres else None,
            "c_frames_per_s": round(c_fps, 1) if c_fps else None,
            "info_mbps": round(fps * code.k * code.logq / 1e6, 2),
            "device": str(jax.devices()[0]),
            "frames_per_batch": frames_per_batch,
        },
    }
    print("BENCH_RESULT " + json.dumps(result), flush=True)


def parent():
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--inner"],
            capture_output=True, text=True, timeout=CHILD_TIMEOUT_S,
            cwd=HERE,
        )
        for line in out.stdout.splitlines():
            if line.startswith("BENCH_RESULT "):
                result = json.loads(line[len("BENCH_RESULT "):])
                try:
                    json.dump(result, open(CACHE, "w"))
                except OSError:
                    pass
                print(json.dumps(result))
                return 0
        err = (out.stderr or "")[-300:]
        reason = f"no result line (rc={out.returncode}) {err!r}"
    except subprocess.TimeoutExpired:
        reason = f"timeout after {CHILD_TIMEOUT_S}s (TPU wedged?)"
    if os.path.exists(CACHE):
        cached = json.load(open(CACHE))
        cached.setdefault("extra", {})["cached"] = (
            f"live bench failed: {reason}; value from last successful run "
            f"on this machine"
        )
        print(json.dumps(cached))
        return 0
    print(json.dumps({
        "metric": "bench failed", "value": 0, "unit": "frames/s",
        "vs_baseline": None, "extra": {"error": reason},
    }))
    return 0


if __name__ == "__main__":
    if "--inner" in sys.argv:
        run_measurement()
    else:
        sys.exit(parent())
