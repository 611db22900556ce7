"""On-device A/B of the Pallas CN kernel vs the XLA paths (VERDICT r2 #2).

Times the FULL layered decode (jitted, fixed iteration count via
stop-free inputs) with cn_impl in {topk, pallas} on a GF(64) code and a
GF(256) code, plus the compressed list path for context.  Prints
s/iteration and frames/s.  Run on the real TPU.

Usage: python benchmarks/pallas_ab.py [gf64|gf256|both] [F] [impl,impl,...]
       [device|host]

The optional 4th arg selects the decode loop: ``device`` = one jitted
while_loop program (fastest, but the tunneled worker crashes on
monolithic layered programs in some windows — see benchmarks/NOTES.md);
``host`` = per-iteration jit (identical math; adds ~10 ms dispatch per
iteration to EVERY arm equally, so the A/B delta is preserved).
"""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ems_nbldpc_tpu.decoder.api import DecoderConfig, decode  # noqa: E402
from ems_nbldpc_tpu.decoder.graph import DeviceGraph  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.models.channels import bpsk_awgn, sigma_for, ChannelSpec  # noqa: E402


def bench(matrix, ebn0, impls, F, iters=10, nm=30, nboper=0, reps=3,
          loop="device"):
    code = registry.get_code(matrix)
    g = DeviceGraph.from_code(code)
    key = jax.random.PRNGKey(0)
    sigma = sigma_for(ChannelSpec(), ebn0, code.rate)
    cw = jnp.zeros((F, code.n), jnp.int32)
    intr, _ = bpsk_awgn(key, cw, code.q, sigma)
    intr = np.asarray(intr)
    for impl in impls:
        cfg = DecoderConfig(
            max_iters=iters, schedule="layered", cn="ems", nm=nm,
            offset=0.3, nboper=nboper,
            cn_impl=impl if impl != "list" else "auto",
            storage="compressed" if impl == "list" else "dense",
            dtype="bfloat16" if impl == "list" else "float32",
            loop=loop,
        )
        if loop == "host":
            # host-loop steppers manage their own per-iteration jits
            fn = lambda x, cfg=cfg: decode(g, jnp.asarray(x), cfg)  # noqa: E731
        else:
            # device loop: jit EVERY arm (incl. impl='list', whose
            # decode_layered_list is a fully-jittable while_loop) so the
            # A/B is symmetric — round-3 ADVICE item 1
            fn = jax.jit(lambda x, cfg=cfg: decode(g, jnp.asarray(x), cfg))
        try:
            d, it, conv = fn(intr)
            np.asarray(d)  # sync + compile
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                d, it, conv = fn(intr)
                np.asarray(d)
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            ai = float(np.asarray(it).mean())
            print(f"{matrix} F={F} impl={impl}: {dt:.3f} s/decode "
                  f"(avg_it {ai:.2f}, {F / dt:.1f} frames/s, "
                  f"all reps {['%.3f' % t for t in ts]})", flush=True)
        except Exception as e:
            print(f"{matrix} F={F} impl={impl}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    F = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    impls = sys.argv[3].split(",") if len(sys.argv) > 3 else [
        "topk", "pallas", "list"]
    loop = sys.argv[4] if len(sys.argv) > 4 else "device"
    if which in ("gf64", "both"):
        bench("KN/N576_K480_GF64.txt", 3.5, impls, F, nm=30, nboper=64,
              loop=loop)
    if which in ("gf256", "both"):
        bench("benchmarks/results_r2/rand48_gf256.ubs", 2.0, impls, F,
              nm=32, nboper=64, loop=loop)
