"""Pallas TPU kernel for the truncated EMS check node.

The XLA path (ops/minconv.py) round-trips every F/B combine through HBM:
for a [T, dc, q] super-layer batch that is ~6 tensor passes per combine.
This kernel keeps the whole forward/backward recursion of one row-tile in
VMEM: inputs are loaded once, all ``3*(dc-2)`` combines (the op structure
of ``/root/reference/bubble_decoder.c:97,166-227``) run on VPU registers/
VMEM scratch, and only the [TILE, dc, q] outputs are written back.

The elementary combine is the truncated tropical convolution
``out[s] = min_j bv[j] + a[s ^ bg[j]]`` with the XOR realized as log2(q)
conditional lane rolls (no gathers — see ops/minconv.xor_gather).

STATUS (round-4 verdict, per the round-3 prove-or-cut rule in
benchmarks/results_r3/HARVEST.md): **demoted to documented reference
material — NOT wired into cn_impl="auto"; opt-in only.**  Evidence:

- round 3, combined A/B job: the pallas arm sat >8 min device-wedged
  with no output where the XLA arms complete in seconds, then the TPU
  worker crashed ("TPU worker process crashed";
  results_r3/queue_attempt1.log).
- round 3/4, isolated single-arm treatment job with per-impl selection
  and its own timeout (`pallas_ab gf64 128 pallas host`, r3d queue):
  produced NO output within the 600 s budget on the same night the
  control (`topk`) measured 14.7 s/decode — the wedge reproduces in
  isolation (results_r3/queue.log).

The interpret-mode tests (tests/test_pallas_cn.py) pin the kernel's
semantics against the golden CN and remain green on CPU; the kernel
stays available via cn_impl="pallas" for future TPU runtimes where the
Mosaic lowering does not wedge this tunneled worker.  Per-impl A/B
remains in benchmarks/pallas_ab.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np



def _xor_gather_lanes(a, g, q):
    """a: [t, q]; g: [t] int32 -> a[t, s ^ g[t]] via conditional rolls."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, q), 1)
    for b in range(q.bit_length() - 1):
        s = 1 << b
        lo = (iota & s) == 0
        swapped = jnp.where(
            lo, pltpu_roll(a, -s), pltpu_roll(a, s)
        )
        bit = ((g >> b) & 1).astype(bool)
        a = jnp.where(bit[:, None], swapped, a)
    return a


def pltpu_roll(x, shift):
    """Lane roll; jnp.roll lowers fine in Mosaic for the last axis."""
    return jnp.roll(x, shift, axis=-1)


def _combine(acc, bv, bg, nm, q):
    """acc: [t, q]; bv/bg: [t, nm] -> min_j bv[:, j] + acc[:, s^bg[:, j]]."""
    out = None
    for j in range(nm):
        shifted = _xor_gather_lanes(acc, bg[:, j], q)
        cand = bv[:, j][:, None] + shifted
        out = cand if out is None else jnp.minimum(out, cand)
    return out


def _cn_kernel(vr_ref, bv_ref, bg_ref, out_ref, *, dc, nm, q):
    vr = vr_ref[...]
    bv = bv_ref[...]
    bg = bg_ref[...]
    fwd = [vr[:, 0, :]]
    bwd = [vr[:, dc - 1, :]]
    for i in range(1, dc - 1):
        j = dc - 1 - i
        fwd.append(_combine(fwd[-1], bv[:, i, :], bg[:, i, :], nm, q))
        bwd.append(_combine(bwd[-1], bv[:, j, :], bg[:, j, :], nm, q))
    bwd = bwd[::-1]
    out_ref[:, 0, :] = bwd[0]
    for i in range(1, dc - 1):
        # middle merge: combine(fwd[i-1], top-nm of bwd[i]); the truncated
        # list of each backward accumulator is precomputed outside (slots
        # dc.. in bv/bg) because top_k inside the kernel is expensive.
        out_ref[:, i, :] = _combine(
            fwd[i - 1], bv[:, dc + i - 1, :], bg[:, dc + i - 1, :], nm, q
        )
    out_ref[:, dc - 1, :] = fwd[-1]


def fb_checknode_pallas(vr, nm: int, tile: int = 128, interpret: bool = False):
    """vr: [T, dc, q] rotated dense inputs -> [T, dc, q] outputs.

    Equivalent to ops.minconv.fb_checknode_topk (same truncation
    structure); the middle-merge truncated lists (top-nm of each backward
    accumulator) are computed with XLA top_k outside the kernel and passed
    in as extra slots.
    """
    from jax.experimental import pallas as pl

    t, dc, q = vr.shape
    assert dc >= 3, "dc<3 handled by the dense path"
    negv, bg0 = jax.lax.top_k(-vr, nm)
    bv0 = -negv

    # backward accumulators for the middle merges need their own top-nm;
    # compute them with the XLA combine (cheap: dc-2 combines on [T, q])
    from .minconv import minconv_topk_shuffle

    bwd = [vr[:, dc - 1, :]]
    for i in range(1, dc - 1):
        j = dc - 1 - i
        bwd.append(minconv_topk_shuffle(bwd[-1], bv0[:, j], bg0[:, j]))
    bwd = bwd[::-1]  # bwd[i] = conv of slots i+1..dc-1
    extra_v, extra_g = [], []
    for i in range(1, dc - 1):
        nv, ng = jax.lax.top_k(-bwd[i], nm)
        extra_v.append(-nv)
        extra_g.append(ng)
    if extra_v:
        bv = jnp.concatenate([bv0, jnp.stack(extra_v, axis=1)], axis=1)
        bg = jnp.concatenate([bg0, jnp.stack(extra_g, axis=1)], axis=1)
    else:
        bv, bg = bv0, bg0

    pad = (-t) % tile
    if pad:
        vr = jnp.pad(vr, ((0, pad), (0, 0), (0, 0)))
        bv = jnp.pad(bv, ((0, pad), (0, 0), (0, 0)))
        bg = jnp.pad(bg, ((0, pad), (0, 0), (0, 0)))
    tt = vr.shape[0]

    kernel = functools.partial(_cn_kernel, dc=dc, nm=nm, q=q)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((tt, dc, q), vr.dtype),
        grid=(tt // tile,),
        in_specs=[
            pl.BlockSpec((tile, dc, q), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, bv.shape[1], nm), lambda i: (i, 0, 0)),
            pl.BlockSpec((tile, bg.shape[1], nm), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((tile, dc, q), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(vr, bv, bg)
    return out[:t]
