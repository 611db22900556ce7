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


def ensure_built(fmt: str = "kn") -> str | None:
    """Compile the reference once per matrix-format variant (the format is
    a compile-time #define, init.c:25); return the binary path."""
    exe = os.path.join(BUILD, f"essai_{fmt}")
    if os.path.exists(exe):
        return exe
    if not os.path.isdir(REF):
        return None
    try:
        shutil.copytree(REF, BUILD, dirs_exist_ok=True)
        for root, _dirs, files in os.walk(BUILD):
            for fn in files:  # copytree keeps the source's r--r--r-- bits
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
        subprocess.run(["make", "-B"], cwd=BUILD, capture_output=True)
        objs = [f"obj/{o}.o" for o in
                ["init", "tools", "channel", "bubble_decoder",
                 "syndrome_decoder", "NB_LDPC"]]
        subprocess.run(
            ["gcc", "-O3", "-o", f"essai_{fmt}", *objs, "-lm"],
            cwd=BUILD, check=True, capture_output=True,
        )
        return exe
    except Exception:
        return None


def measure(matrix: str, ebn0: float, frames: int = 2000, iters: int = 10,
            nm: int = 30, offset: float = 0.3, nboper: int = 45,
            fmt: str = "kn", timeout: int = 1200) -> dict | None:
    """Time the C binary; returns dict with frames/s and FER, or None."""
    key = f"{matrix}:{ebn0}:{frames}:{iters}:{nm}:{offset}:{nboper}"
    cache = {}
    if os.path.exists(CACHE):
        try:
            cache = json.load(open(CACHE))
        except Exception:
            cache = {}
    if key in cache:
        return cache[key]
    exe = ensure_built(fmt)
    if exe is None:
        return None
    t0 = time.perf_counter()
    try:
        out = subprocess.run(
            [exe, str(frames), str(iters), f"./matrices/{matrix}",
             str(ebn0), str(nm), str(offset), str(nboper)],
            cwd=BUILD, stdin=subprocess.DEVNULL, capture_output=True,
            timeout=timeout, text=True,
        )
    except subprocess.TimeoutExpired:
        return None
    dt = time.perf_counter() - t0
    m = re.findall(r"FER= (\d+) / (\d+)", out.stdout)
    if not m:
        return None
    errs, nsim = map(int, m[-1])
    res = dict(
        frames=nsim, frame_errors=errs, fer=errs / max(nsim, 1),
        elapsed_s=dt, frames_per_s=nsim / dt,
    )
    cache[key] = res
    json.dump(cache, open(CACHE, "w"))
    return res
