"""Build + time the C reference decoder as the bench baseline.

BASELINE.md: the reference publishes no numbers, so the framework measures
its own C baseline (single core, gcc -O3) at the bench operating point.
Results are cached in /tmp so repeated bench runs stay fast.
"""
from __future__ import annotations

import json
import os
import re
import shutil
import subprocess
import time

REF = "/root/reference"
BUILD = "/tmp/nbldpc_ref_build"
CACHE = "/tmp/nbldpc_c_baseline.json"


def ensure_built(fmt: str = "kn", channel: str = "bpsk") -> str | None:
    """Compile the reference once per (matrix-format, channel) variant.

    Both are compile-time switches in the reference: the matrix format is
    ``#define KN_matrix`` (init.c:25); the channel is the chosen call in
    main (NB_LDPC.c:261-264) plus the modulation/fading ``#define``s at
    channel.c:20-26 (shipped defaults: QAM_R + rayleigh_fading_SSD +
    erasure).  Channel variants:

    - "bpsk": ModelChannel_AWGN_BPSK (the shipped call)
    - "qamr_ssd_erasure": ModelChannel with the shipped defines
    - "apsk64": ModelChannel_AWGN_64 (64-APSK, no fading with the shipped
      defines)
    - "qam256_4d": ModelChannel_AWGN_256QAM_4D (channel.c:749-929 — always
      per-dimension Rayleigh; 10% per-dim erasures under the shipped
      ``#define erasure``)

    ``channel="syndrome"`` keeps the BPSK channel but swaps the check node
    for the syndrome-EMS architecture: uncomments the config-table recipe
    in main (NB_LDPC.c:191-200: trapeze d=(40,15,5), sorted, capped at
    1000) and replaces the CheckPassLogEMS call with syndrome_ems
    (NB_LDPC.c:388-391; n_cv = the NbOper CLI argument).
    """
    tag = f"{fmt}_{channel}" if channel != "bpsk" else fmt
    exe = os.path.join(BUILD, f"essai_{tag}")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF):
        return None
    try:
        shutil.copytree(REF, BUILD, dirs_exist_ok=True)
        for root, _dirs, files in os.walk(BUILD):
            for fn in files:  # copytree keeps the source's r--r--r-- bits
                if fn.startswith("essai_"):
                    continue  # don't strip exec bits off built variants
                os.chmod(os.path.join(root, fn), 0o644)
        os.makedirs(os.path.join(BUILD, "obj"), exist_ok=True)
        os.makedirs(os.path.join(BUILD, "data"), exist_ok=True)
        initc = os.path.join(BUILD, "init.c")
        # binary-safe: the reference sources carry latin-1 comment bytes
        src = open(initc, "rb").read()
        if fmt == "ubs":
            src = src.replace(b"#define KN_matrix", b"//#define KN_matrix")
        else:
            src = src.replace(b"//#define KN_matrix", b"#define KN_matrix")
        open(initc, "wb").write(src)
        mainc = os.path.join(BUILD, "NB_LDPC.c")
        src = open(mainc, "rb").read()
        if channel == "qamr_ssd_erasure":
            src = src.replace(
                b"ModelChannel_AWGN_BPSK (&code, &decoder, &table,  "
                b"NBIN, EbN,&Idum);",
                b"ModelChannel(&code, &decoder,  NBIN, EbN,&Idum);",
            )
        elif channel == "apsk64":
            src = src.replace(
                b"ModelChannel_AWGN_BPSK (&code, &decoder, &table,  "
                b"NBIN, EbN,&Idum);",
                b"ModelChannel_AWGN_64 (&code, &decoder, NBIN, EbN,&Idum);",
            )
        elif channel == "qam256_4d":
            src = src.replace(
                b"ModelChannel_AWGN_BPSK (&code, &decoder, &table,  "
                b"NBIN, EbN,&Idum);",
                b"ModelChannel_AWGN_256QAM_4D (&code, &decoder, "
                b"NBIN, EbN,&Idum);",
            )
        elif channel not in ("bpsk", "syndrome"):
            raise ValueError(channel)
        if channel == "syndrome":
            for frag in (b"int d_1=40;", b"int d_2=15;", b"int d_3=5;",
                         b"int **config_table;", b"int config_table_size;",
                         b"config_table = build_config_table",
                         b"sort_config_table(",
                         b"config_table_size = 1000;"):
                src = src.replace(b"//    " + frag, b"    " + frag)
            src = src.replace(
                b"CheckPassLogEMS (node, &decoder, &code, &table,"
                b"NbOper,offset);",
                b"syndrome_ems(node, &decoder, &code, &table, "
                b"config_table, config_table_size, dc_max, offset, n_cv);",
            )
        open(mainc, "wb").write(src)
        subprocess.run(["make", "-B"], cwd=BUILD, capture_output=True)
        objs = [f"obj/{o}.o" for o in
                ["init", "tools", "channel", "bubble_decoder",
                 "syndrome_decoder", "NB_LDPC"]]
        subprocess.run(
            ["gcc", "-O3", "-o", f"essai_{tag}", *objs, "-lm"],
            cwd=BUILD, check=True, capture_output=True,
        )
        return exe
    except Exception:
        return None


def measure(matrix: str, ebn0: float, frames: int = 2000, iters: int = 10,
            nm: int = 30, offset: float = 0.3, nboper: int = 45,
            fmt: str = "kn", timeout: int = 1200,
            channel: str = "bpsk", reps: int = 1,
            matrix_file: str | None = None) -> dict | None:
    """Time the C binary; returns dict with frames/s and FER, or None.

    ``reps > 1`` repeats the run and reports the MEDIAN frames/s plus the
    per-rep samples (``fps_samples``) — the round-4 baseline protocol
    (round-3 VERDICT weak item 2: a single-rep denominator swung the
    headline multiplier by 33% between rounds under host-load noise;
    the median of >=3 runs is robust to one loaded rep, and the samples
    make remaining spread visible in the artifacts).

    NOTE: building two *different* (fmt, channel) variants concurrently
    races on the shared obj/ directory — build sequentially.
    """
    key = f"{matrix}:{ebn0}:{frames}:{iters}:{nm}:{offset}:{nboper}"
    if channel != "bpsk":
        key += f":{channel}"
    if reps != 1:
        key += f":r{reps}"
    cache = {}
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]
    exe = ensure_built(fmt, channel)
    if exe is None:
        return None
    if matrix_file is not None:
        # matrices outside the reference tree (e.g. the round-2
        # rand48_gf256.ubs cross-check code) get copied in
        dst = os.path.join(BUILD, "matrices", matrix)
        if not os.path.exists(dst):
            shutil.copy(matrix_file, dst)
    fps_samples = []
    res = None
    for _ in range(max(reps, 1)):
        t0 = time.perf_counter()
        try:
            out = subprocess.run(
                [exe, str(frames), str(iters), f"./matrices/{matrix}",
                 str(ebn0), str(nm), str(offset), str(nboper)],
                cwd=BUILD, stdin=subprocess.DEVNULL, capture_output=True,
                timeout=timeout, text=True,
            )
        except subprocess.TimeoutExpired:
            # keep already-completed reps (round-4 ADVICE): a timeout on
            # rep 2/3 shouldn't discard a valid ~140 s sample
            if fps_samples:
                break
            return None
        dt = time.perf_counter() - t0
        m = re.findall(r"FER= (\d+) / (\d+)", out.stdout)
        if not m:
            if fps_samples:
                break
            return None
        errs, nsim = map(int, m[-1])
        fps_samples.append(nsim / dt)
        res = dict(
            frames=nsim, frame_errors=errs, fer=errs / max(nsim, 1),
            elapsed_s=dt, frames_per_s=nsim / dt,
        )
        it = re.findall(r"avr_it=([\d.]+)", out.stdout)  # NB_LDPC.c:498
        if it:
            res["avg_iters"] = float(it[-1])
    if len(fps_samples) > 1:
        s = sorted(fps_samples)
        mid = len(s) // 2
        res["frames_per_s"] = (
            s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2
        )
        res["fps_samples"] = [round(x, 4) for x in fps_samples]
    cache[key] = res
    json.dump(cache, open(CACHE, "w"))
    return res
