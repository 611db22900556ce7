"""LIST_PERF: all list-EMS perf knobs A/B'd in ONE process/device window.

The round-3 plan measured each knob in its own queue job; the device's
~50x window swings (NOTES.md round 4) made those numbers incomparable.
Here every knob combo builds its own stepper (all knobs are trace-time
and part of the stepper cache key) inside one process: one window, one
table.

Usage: python benchmarks/list_knob_probe.py [F] [matrix] [combo ...]
       (defaults: F=128, Declercq_64800_R12_GF256, all combos;
        extra args select a combo subset by label, e.g. to fit a short
        device window or skip arms known to crash the remote compiler)
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
    make_layered_list_stepper,
)
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.models.channels import (  # noqa: E402
    ChannelSpec, bpsk_awgn, sigma_for,
)

COMBOS = [
    ("default", {}),
    ("cnsel=topk", {"NBLDPC_LIST_CNSEL": "topk"}),
    ("trunc=topk", {"NBLDPC_LIST_TRUNC": "topk"}),
    ("listsort=flat", {"NBLDPC_LISTSORT": "flat"}),
    ("densecv", {"NBLDPC_LIST_DENSECV": "1"}),
    ("both=topk", {"NBLDPC_LIST_CNSEL": "topk",
                   "NBLDPC_LIST_TRUNC": "topk"}),
    ("fb=tree", {"NBLDPC_LIST_FB": "tree"}),
    ("tree+topk", {"NBLDPC_LIST_FB": "tree", "NBLDPC_LIST_CNSEL": "topk",
                   "NBLDPC_LIST_TRUNC": "topk"}),
]


def main(F, matrix, only=()):
    code = registry.get_code(matrix)
    g = DeviceGraph.from_code(code)
    sigma = sigma_for(ChannelSpec(), 1.8, code.rate)
    cw = jnp.zeros((F, code.n), jnp.int32)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, code.q, sigma)
    intr = jnp.asarray(np.asarray(intr))
    for label, knobs in COMBOS:
        if only and label not in only:
            continue
        old = {k: os.environ.get(k) for k in knobs}
        os.environ.update(knobs)
        try:
            t0 = time.perf_counter()
            init_fn, step_fn = make_layered_list_stepper(
                g, nm=32, offset=0.3, nboper=64, dtype=jnp.bfloat16)
            st = init_fn(intr)
            st = step_fn(st)
            np.asarray(st[0])
            t_compile = time.perf_counter() - t0
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                st = step_fn(st)
                np.asarray(st[0])
                ts.append(time.perf_counter() - t0)
            print(f"{matrix} F={F} {label}: {min(ts):.3f} s/iter "
                  f"(compile+first {t_compile:.1f}s, reps "
                  f"{['%.3f' % t for t in ts]}, "
                  f"{F / min(ts):.1f} frames/s per iter)", flush=True)
        except Exception as e:
            print(f"{matrix} F={F} {label}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)
        finally:
            for k, v in old.items():
                os.environ.pop(k, None) if v is None else \
                    os.environ.__setitem__(k, v)
    print("knob probe done frames/s", flush=True)


if __name__ == "__main__":
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    matrix = sys.argv[2] if len(sys.argv) > 2 else "Declercq_64800_R12_GF256"
    main(F, matrix, tuple(sys.argv[3:]))
