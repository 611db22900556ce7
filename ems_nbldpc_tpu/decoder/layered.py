"""Layered (horizontal) schedule over column-disjoint super-layers.

The reference sweeps check rows strictly sequentially, updating APP in place
(``NB_LDPC.c:313-472``).  Rows that share no variable commute, so the TPU
version partitions rows into a handful of column-disjoint *super-layers*
(host-side greedy coloring, ``models/code.py``) and processes each layer as
one batched CN step with conflict-free scatters.  Same fixed point and
near-identical convergence behavior, with M/L-way parallelism per step.

State: dense APP [F, N, q] + CtoV FIFO [F, E, q] — exactly the reference's
``decoder->APP`` / ``decoder->CtoV`` (init.c:310-384), with the frame axis
in front.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.minconv import (fb_checknode_dense, fb_checknode_topk,
                           delta_message, ems_input_truncate,
                           ems_output_saturate, topk_message)
from ..ops.syndrome_cn import syndrome_checknode
from ..ops.fht import fb_checknode_spa
from .flooding import syndrome_ok, use_topk
from .graph import DeviceGraph


def _layer_plan(g: DeviceGraph):
    """Pad layers to uniform arrays of row ids (pad row id = M -> dummy)."""
    m = g.code.m_rows
    e = g.n_edges
    n = g.code.n
    dc = g.code.dc_max
    plans = []
    for rows in g.layers:
        rows = np.asarray(rows)
        edge_ids = np.concatenate([g.row_edges, np.full((1, dc), e)], axis=0)[rows]
        cols = np.concatenate([g.code.row_cols, np.full((1, dc), n)], axis=0)[rows]
        valid = edge_ids < e
        rot = np.concatenate([g.rot, np.zeros((1, g.q), np.int32)], axis=0)[edge_ids]
        inv_rot = np.concatenate([g.inv_rot, np.zeros((1, g.q), np.int32)], axis=0)[edge_ids]
        plans.append(
            dict(
                edge_ids=edge_ids.astype(np.int32),
                cols=cols.astype(np.int32),
                valid=valid,
                rot=rot.astype(np.int32),
                inv_rot=inv_rot.astype(np.int32),
            )
        )
    return plans


def decode_layered(
    g: DeviceGraph,
    intrinsic,               # [F, N, q]
    max_iters: int,
    nm: int = 0,
    offset: float = 0.0,
    cn: str = "minsum",
    cn_impl: str = "auto",
    syn: dict | None = None,
):
    """Returns (decide [F,N], iters [F], converged [F]).

    Per super-layer (the TPU analog of NB_LDPC.c:320-466):
      mvc  = APP[cols] - CtoV[edges]      (VN extrinsic)
      mvc -= min (normalize, NB_LDPC.c:372)
      mcv  = CN(rotate(mvc))              (dense F/B min-conv)
      CtoV[edges] = mcv                    (FIFO write-back)
      APP[cols]   = mvc + mcv
    """
    f, n, q = intrinsic.shape
    e = g.n_edges
    plans = _layer_plan(g)
    truncate = cn == "ems" and nm < q
    topk_cn = use_topk(cn, nm, q, cn_impl)

    # pad APP and CtoV with one dummy column/edge for the scatter targets
    app0 = jnp.pad(intrinsic, ((0, 0), (0, 1), (0, 0)))
    ctov0 = jnp.zeros((f, e + 1, q), intrinsic.dtype)

    def one_iteration(app, ctov, active):
        for p in plans:
            edge_ids = jnp.asarray(p["edge_ids"])        # [G, dc]
            cols = jnp.asarray(p["cols"])
            rot = jnp.asarray(p["rot"])[None]            # [1, G, dc, q]
            inv_rot = jnp.asarray(p["inv_rot"])[None]
            valid = jnp.asarray(p["valid"])

            app_rows = app[:, cols]                      # [F, G, dc, q]
            ctov_rows = ctov[:, edge_ids]
            mvc = app_rows - ctov_rows
            mvc = mvc - jnp.min(mvc, axis=-1, keepdims=True)
            if truncate:
                mvc_cn = ems_input_truncate(mvc, nm)
            else:
                mvc_cn = mvc
            vr = jnp.take_along_axis(mvc_cn, inv_rot, axis=-1)
            neutral = delta_message(vr.shape[:-1], q, vr.dtype)
            vr = jnp.where(valid[None, ..., None], vr, neutral)
            if cn == "spa":
                mcv_r = fb_checknode_spa(vr)
            elif cn == "syndrome":
                nm_eff = nm if nm > 0 else min(q, 32)
                tvals, tgfs = topk_message(vr, nm_eff)
                mcv_r = syndrome_checknode(
                    tvals, tgfs, q, offset=offset, **(syn or {})
                )
            elif topk_cn:
                mcv_r = fb_checknode_topk(vr, nm)
            else:
                mcv_r = fb_checknode_dense(vr)
            mcv = jnp.take_along_axis(mcv_r, rot, axis=-1)
            if truncate:
                mcv = ems_output_saturate(mcv, nm, offset)
            mcv = mcv - jnp.min(mcv, axis=-1, keepdims=True)
            # freeze converged frames (their APP/CtoV stop changing)
            mcv = jnp.where(active[:, None, None, None], mcv, ctov_rows)
            new_app = jnp.where(
                active[:, None, None, None], mvc + mcv, app_rows
            )
            ctov = ctov.at[:, edge_ids].set(mcv)
            app = app.at[:, cols].set(new_app)
        return app, ctov

    d0 = jnp.argmin(app0[:, :n], axis=-1).astype(jnp.int32)
    conv0 = syndrome_ok(g, d0)

    def cond(state):
        it, _, _, _, conv, _ = state
        return (it < max_iters) & ~jnp.all(conv)

    def body(state):
        it, app, ctov, decide, conv, iters = state
        active = ~conv
        app, ctov = one_iteration(app, ctov, active)
        d_new = jnp.argmin(app[:, :n], axis=-1).astype(jnp.int32)
        decide = jnp.where(active[:, None], d_new, decide)
        conv_new = conv | syndrome_ok(g, decide)
        iters = iters + active.astype(jnp.int32)
        return it + 1, app, ctov, decide, conv_new, iters

    state = (jnp.int32(0), app0, ctov0, d0, conv0, jnp.zeros(f, jnp.int32))
    _, _, _, decide, conv, iters = jax.lax.while_loop(cond, body, state)
    return decide, iters, conv


def make_layered_stepper(
    g: DeviceGraph,
    nm: int = 0,
    offset: float = 0.0,
    cn: str = "minsum",
    cn_impl: str = "auto",
    syn: dict | None = None,
):
    """Host-loop variant for very large codes: one jitted XLA execution per
    decoding iteration, with buffer donation (no device copies).

    Keeps each device program short (robust against runtime limits on huge
    [F, E, q] state) and lets the host poll convergence cheaply.  Returns
    (init_fn, step_fn): ``state = init_fn(intrinsic)``,
    ``state = step_fn(state)``; state = (app, ctov, decide, conv, iters).
    """
    plans = _layer_plan(g)
    n, q, e = g.code.n, g.q, g.n_edges
    truncate = cn == "ems" and nm < q
    topk_cn = use_topk(cn, nm, q, cn_impl)

    def one_iteration(app, ctov, active):
        for p in plans:
            edge_ids = jnp.asarray(p["edge_ids"])
            cols = jnp.asarray(p["cols"])
            rot = jnp.asarray(p["rot"])[None]
            inv_rot = jnp.asarray(p["inv_rot"])[None]
            valid = jnp.asarray(p["valid"])
            app_rows = app[:, cols]
            ctov_rows = ctov[:, edge_ids]
            mvc = app_rows - ctov_rows
            mvc = mvc - jnp.min(mvc, axis=-1, keepdims=True)
            mvc_cn = ems_input_truncate(mvc, nm) if truncate else mvc
            vr = jnp.take_along_axis(mvc_cn, inv_rot, axis=-1)
            neutral = delta_message(vr.shape[:-1], q, vr.dtype)
            vr = jnp.where(valid[None, ..., None], vr, neutral)
            if cn == "spa":
                mcv_r = fb_checknode_spa(vr)
            elif cn == "syndrome":
                nm_eff = nm if nm > 0 else min(q, 32)
                tvals, tgfs = topk_message(vr, nm_eff)
                mcv_r = syndrome_checknode(
                    tvals, tgfs, q, offset=offset, **(syn or {})
                )
            elif topk_cn:
                mcv_r = fb_checknode_topk(vr, nm)
            else:
                mcv_r = fb_checknode_dense(vr)
            mcv = jnp.take_along_axis(mcv_r, rot, axis=-1)
            if truncate:
                mcv = ems_output_saturate(mcv, nm, offset)
            mcv = mcv - jnp.min(mcv, axis=-1, keepdims=True)
            mcv = jnp.where(active[:, None, None, None], mcv, ctov_rows)
            new_app = jnp.where(
                active[:, None, None, None], mvc + mcv, app_rows
            )
            ctov = ctov.at[:, edge_ids].set(mcv)
            app = app.at[:, cols].set(new_app)
        return app, ctov

    @jax.jit
    def init_fn(intrinsic):
        f = intrinsic.shape[0]
        app0 = jnp.pad(intrinsic, ((0, 0), (0, 1), (0, 0)))
        ctov0 = jnp.zeros((f, e + 1, q), intrinsic.dtype)
        d0 = jnp.argmin(app0[:, :n], axis=-1).astype(jnp.int32)
        conv0 = syndrome_ok(g, d0)
        return app0, ctov0, d0, conv0, jnp.zeros(f, jnp.int32)

    @partial(jax.jit, donate_argnums=(0,))
    def step_fn(state):
        app, ctov, decide, conv, iters = state
        active = ~conv
        app, ctov = one_iteration(app, ctov, active)
        d_new = jnp.argmin(app[:, :n], axis=-1).astype(jnp.int32)
        decide = jnp.where(active[:, None], d_new, decide)
        conv = conv | syndrome_ok(g, decide)
        iters = iters + active.astype(jnp.int32)
        return app, ctov, decide, conv, iters

    return init_fn, step_fn


def decode_layered_hostloop(g, intrinsic, max_iters, nm=0, offset=0.0,
                            cn="minsum", cn_impl="auto", syn=None):
    """decode() interface over make_layered_stepper."""
    import numpy as np

    init_fn, step_fn = make_layered_stepper(g, nm, offset, cn, cn_impl, syn)
    state = init_fn(intrinsic)
    for _ in range(max_iters):
        if bool(np.asarray(state[3].all())):
            break
        state = step_fn(state)
    _, _, decide, conv, iters = state
    return decide, iters, conv
