"""Same-window Ahmed-vs-flagship profile (round-3 VERDICT item 1).

The Ahmed_64800_R910_GF256 dc=20 config is the one operating point where
the framework's EMS mode measured SLOWER than single-core C (0.16 vs
0.711 frames/s, results_r3/queue.log).  But that number is a wall-clock
over a whole MC run on a device whose throughput swings ~50x between
"windows" (benchmarks/NOTES.md) — compile time, device state and
steady-state rate are confounded.  This probe separates them, in ONE
process so every row shares the same device window:

  for each (code, decoder) pair: build the host-loop stepper, time
  init+first step (compile+warmup), then K steady-state iterations;
  prints s/iter, implied frames/s at a given avg_it, and the structural
  facts (layers, dc, rotation groups) that explain the gap.

Usage: python benchmarks/ahmed_probe.py [F] [pairs...]
  pairs from {decl_spa, ahmed_spa, decl_list, ahmed_list}; default all.
  A pair may carry knob overrides applied for that run only:
  ``ahmed_list@NBLDPC_LIST_FB=tree`` — the env is set before the stepper
  builds (all knobs are trace-time and live in the stepper cache keys),
  so several knob settings A/B inside ONE process = one device window.
"""
import os
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ems_nbldpc_tpu.decoder.graph import DeviceGraph  # noqa: E402
from ems_nbldpc_tpu.decoder.layered import (  # noqa: E402
    make_layered_list_stepper, make_layered_stepper,
)
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.models.channels import (  # noqa: E402
    ChannelSpec, bpsk_awgn, sigma_for,
)

PAIRS = {
    # (matrix, kind); operating points match the r3d queue jobs
    "decl_spa": ("Declercq_64800_R12_GF256", "spa"),
    "ahmed_spa": ("Ahmed_64800_R910_GF256", "spa"),
    "decl_list": ("Declercq_64800_R12_GF256", "list"),
    "ahmed_list": ("Ahmed_64800_R910_GF256", "list"),
}


def probe(spec, F, ebn0=3.0, steady_iters=5):
    name, _, knobstr = spec.partition("@")
    knobs = dict(kv.split("=", 1) for kv in knobstr.split(",") if kv)
    old = {k: os.environ.get(k) for k in knobs}
    os.environ.update(knobs)
    try:
        return _probe(spec, name, F, ebn0, steady_iters)
    finally:
        for k, v in old.items():
            os.environ.pop(k, None) if v is None else \
                os.environ.__setitem__(k, v)


def _probe(spec, name, F, ebn0, steady_iters):
    matrix, kind = PAIRS[name]
    code = registry.get_code(matrix)
    g = DeviceGraph.from_code(code)
    rp = g.rows_rotplan
    print(f"[{spec}] {matrix}: M={code.m_rows} dc={code.dc_max} "
          f"layers={len(g.layers)} rot_groups={len(rp.bounds)}", flush=True)
    key = jax.random.PRNGKey(0)
    sigma = sigma_for(ChannelSpec(), ebn0, code.rate)
    cw = jnp.zeros((F, code.n), jnp.int32)
    intr, _ = bpsk_awgn(key, cw, code.q, sigma)
    intr = jnp.asarray(np.asarray(intr))  # device-resident input

    t0 = time.perf_counter()
    if kind == "spa":
        init_fn, step_fn = make_layered_stepper(g, cn="spa")
    else:
        init_fn, step_fn = make_layered_list_stepper(
            g, nm=32, offset=0.3, nboper=64, dtype=jnp.bfloat16)
    st = init_fn(intr)
    np.asarray(st[-1])
    t_init = time.perf_counter() - t0

    t0 = time.perf_counter()
    st = step_fn(st)
    np.asarray(st[-1])
    t_first = time.perf_counter() - t0

    ts = []
    for _ in range(steady_iters):
        t0 = time.perf_counter()
        st = step_fn(st)
        np.asarray(st[-1])
        ts.append(time.perf_counter() - t0)
    s_iter = min(ts)
    med = sorted(ts)[len(ts) // 2]
    # implied steady-state frames/s at the measured avg_it of the r3d
    # runs (ahmed list 7.04, ahmed spa 4.26, flagship ~7 / 4.8)
    avg_it = 7.0 if kind == "list" else 4.5
    print(f"[{spec}] F={F} compile(init)={t_init:.1f}s first_step="
          f"{t_first:.1f}s steady={s_iter:.3f} s/iter (median {med:.3f}; "
          f"all {['%.3f' % t for t in ts]}) -> "
          f"{F / (s_iter * avg_it):.2f} frames/s at avg_it={avg_it}",
          flush=True)
    return s_iter


if __name__ == "__main__":
    args = sys.argv[1:]
    F = int(args[0]) if args and args[0].isdigit() else 128
    names = [a for a in args if not a.isdigit()] or list(PAIRS)
    knobs = {k: v for k, v in os.environ.items() if k.startswith("NBLDPC")}
    print(f"F={F} knobs={knobs}", flush=True)
    for nm_ in names:
        probe(nm_, F)
    print("probe done frames/s", flush=True)  # queue success marker
