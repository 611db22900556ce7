"""One-shot flagship timing probe: Declercq_64800_R12_GF256, compressed
bf16 layered EMS, host loop.  Prints per-iteration time and frames/s."""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ems_nbldpc_tpu.decoder.graph import DeviceGraph  # noqa: E402
from ems_nbldpc_tpu.decoder.layered import (  # noqa: E402
    make_layered_compressed_stepper,
)
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.models.channels import (  # noqa: E402
    ChannelSpec, bpsk_awgn, sigma_for,
)


def main(frames=32, ebn0=1.8, iters=10, nm=32):
    code = registry.get_code("Declercq_64800_R12_GF256")
    g = DeviceGraph.from_code(code)
    cw = jnp.zeros((frames, code.n), jnp.int32)
    sigma = sigma_for(ChannelSpec(), ebn0, code.rate)
    intr, _ = bpsk_awgn(jax.random.PRNGKey(0), cw, 256, sigma)
    init_fn, step_fn = make_layered_compressed_stepper(g, nm, 0.3)
    t0 = time.time()
    state = init_fn(intr)
    np.asarray(state[5])
    print(f"init+compile {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    state = step_fn(state)
    np.asarray(state[5])
    print(f"first step (compile) {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    done_it = 1
    for i in range(iters - 1):
        state = step_fn(state)
        done_it += 1
        if bool(np.asarray(state[5].all())):
            break
    np.asarray(state[5])
    dt = time.time() - t0
    conv = float(np.asarray(state[5]).mean())
    it = np.asarray(state[6])
    print(
        f"{done_it-1} steps in {dt:.1f}s = {dt/max(done_it-1,1):.2f}s/iter; "
        f"conv={conv:.2f} avg_it={it.mean():.1f}; "
        f"~{frames/(dt/max(done_it-1,1)*10):.2f} frames/s at 10 it "
        f"(C reference: ~0.09 frames/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
