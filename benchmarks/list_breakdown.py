"""Component-level timing of the flagship list-EMS iteration (VERDICT #7).

Times each op of `_make_list_iteration` separately, jitted at the REAL
super-layer shapes of Declercq_64800_R12_GF256 (F=128 by default).  At
these shapes each op costs 10-100+ ms, far above the ~10 ms dispatch
overhead, so per-op timing is meaningful here (unlike generic
microbenches, benchmarks/NOTES.md).

Usage: python benchmarks/list_breakdown.py [F]
"""
import sys
import time

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ems_nbldpc_tpu.decoder.graph import DeviceGraph  # noqa: E402
from ems_nbldpc_tpu.decoder.layered import _layer_plan  # noqa: E402
from ems_nbldpc_tpu.models import registry  # noqa: E402
from ems_nbldpc_tpu.ops.listcn import (  # noqa: E402
    expand_list, fb_checknode_list, rotate_ids, saturate_list, topk_list,
)

NM, NBOPER = 32, 64


def timeit(name, fn, *args):
    r = fn(*args)
    np.asarray(jax.tree.leaves(r)[0])  # compile+sync
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(*args)
        np.asarray(jax.tree.leaves(r)[0])
        ts.append(time.perf_counter() - t0)
    print(f"  {name:28s} {min(ts)*1e3:8.1f} ms", flush=True)
    return r


def main(F=128):
    code = registry.get_code("Declercq_64800_R12_GF256")
    g = DeviceGraph.from_code(code)
    plans = _layer_plan(g)
    q = g.q
    key = jax.random.PRNGKey(0)
    app = jax.random.uniform(key, (F, code.n + 1, q), jnp.bfloat16) * 8
    cv_v = jnp.zeros((F, g.n_edges + 1, NM), jnp.bfloat16)
    cv_g = jnp.zeros((F, g.n_edges + 1, NM), jnp.uint8) + jnp.arange(
        NM, dtype=jnp.uint8
    )
    cv_sat = jnp.zeros((F, g.n_edges + 1), jnp.bfloat16)
    print(f"flagship F={F}: {len(plans)} super-layers, "
          f"shapes {[p['shape'] for p in plans]}", flush=True)
    p = plans[0]
    G, dc = p["shape"]
    edge_ids = jnp.asarray(p["edge_ids"])
    cols = jnp.asarray(p["cols"])
    rc_in = jnp.asarray(p["rc_in"])
    rc_out = jnp.asarray(p["rc_out"])

    gather_app = jax.jit(lambda a: a[:, cols])
    app_rows = timeit("gather app rows", gather_app, app)

    gather_cv = jax.jit(
        lambda v, gg, s: (v[:, edge_ids], gg[:, edge_ids], s[:, edge_ids])
    )
    cvv_rows, cvg_rows, sat_rows = timeit(
        "gather cv rows", gather_cv, cv_v, cv_g, cv_sat
    )

    expand = jax.jit(
        lambda v, gg, s: expand_list(
            v.astype(jnp.float32), gg, s.astype(jnp.float32), q, jnp.bfloat16
        )
    )
    ctov_rows = timeit("expand ctov (one-hot min)", expand,
                       cvv_rows, cvg_rows, sat_rows)

    vnsub = jax.jit(
        lambda a, c: (lambda m: m - jnp.min(m, axis=-1, keepdims=True))(a - c)
    )
    mvc = timeit("vn subtract + normalize", vnsub, app_rows, ctov_rows)

    trunc = jax.jit(lambda m: topk_list(m.astype(jnp.float32), NM))
    bv, bg = timeit("vn truncate (q-sort)", trunc, mvc)

    rot = jax.jit(lambda gg: rotate_ids(gg, rc_in[None]))
    bgr = timeit("rotate ids in", rot, bg)

    cn = jax.jit(lambda v, gg: fb_checknode_list(v, gg, NM, NBOPER))
    ov, ogr = timeit("fb list CN (3 merges)", cn, bv, bgr)

    rot2 = jax.jit(lambda gg: rotate_ids(gg, rc_out[None]))
    og = timeit("rotate ids out", rot2, ogr)

    satfn = jax.jit(lambda v: saturate_list(v, 0.3))
    ov2, sat = timeit("saturate", satfn, ov)

    exp2 = jax.jit(lambda v, gg, s: expand_list(v, gg, s, q, jnp.bfloat16))
    dense = timeit("expand output (one-hot min)", exp2, ov2, og, sat)

    appup = jax.jit(
        lambda a, m, d, r: a.at[:, cols].set((m + d).astype(a.dtype))
    )
    timeit("app scatter update", appup, app, mvc, dense, app_rows)

    cvup = jax.jit(
        lambda v, gg, s, nv, ng, ns: (
            v.at[:, edge_ids].set(nv.astype(v.dtype)),
            gg.at[:, edge_ids].set(ng.astype(gg.dtype)),
            s.at[:, edge_ids].set(ns.astype(s.dtype)),
        )
    )
    timeit("cv scatter update (x3)", cvup, cv_v, cv_g, cv_sat,
           ov2, og, sat)

    print(f"(layer 0 of {len(plans)}: G={G} dc={dc}; whole-iteration "
          f"reference: benchmarks/list_f_probe.py)", flush=True)
    print(f"done F={F} frames/s-reference", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)
