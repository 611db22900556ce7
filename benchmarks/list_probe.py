"""Timing probe for the truncated-list EMS path (ops/listcn.py) on the
flagship Declercq_64800_R12_GF256 code.  Usage:

    python benchmarks/list_probe.py [frames] [nm] [nboper] [ebn0]

Prints compile time, steady-state s/iteration, convergence, and an
extrapolated frames/s at the measured average iteration count.
"""
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


def main(frames=32, nm=32, nboper=0, ebn0=1.8, iters=10,
         matrix="Declercq_64800_R12_GF256", dtype=jnp.bfloat16):
    code = registry.get_code(matrix)
    g = DeviceGraph.from_code(code)
    cw = jnp.zeros((frames, code.n), jnp.int32)
    sigma = sigma_for(ChannelSpec(), ebn0, code.rate)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, code.q, sigma)
    init_fn, step_fn = make_layered_list_stepper(g, nm, 0.3, nboper, dtype)
    t0 = time.time()
    state = init_fn(intr)
    np.asarray(state[5])
    print(f"init+compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state = step_fn(state)
    np.asarray(state[5])
    print(f"first step (compile) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    done = 1
    for _ in range(iters - 1):
        state = step_fn(state)
        done += 1
        if bool(np.asarray(state[5].all())):
            break
    np.asarray(state[5])
    dt = time.time() - t0
    conv = float(np.asarray(state[5]).mean())
    it = np.asarray(state[6])
    s_per_iter = dt / max(done - 1, 1)
    avg_it = float(it.mean())
    fps = frames / (s_per_iter * max(avg_it, 1.0))
    print(
        f"F={frames} nm={nm} nboper={nboper} {jnp.dtype(dtype).name}: "
        f"{done-1} steps in {dt:.1f}s = {s_per_iter:.3f}s/iter; "
        f"conv={conv:.2f} avg_it={avg_it:.2f}; "
        f"~{fps:.1f} frames/s at avg_it (C EMS nm=32: 0.673)",
        flush=True,
    )


if __name__ == "__main__":
    args = [float(a) for a in sys.argv[1:]]
    kw = {}
    names = ["frames", "nm", "nboper", "ebn0"]
    for name, val in zip(names, args):
        kw[name] = val if name == "ebn0" else int(val)
    main(**kw)
