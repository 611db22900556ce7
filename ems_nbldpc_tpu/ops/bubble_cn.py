"""Device-side EXACT bubble-check emulation (validation tool, SURVEY §7.3).

The production device check nodes (ops/minconv.py, ops/listcn.py) are
*supersets* of the reference's nbOper-budgeted bubble check — they consider
at least every candidate a bubble trajectory can reach, so they decode
equal-or-better and are validated statistically (FER parity).  This module
is the complementary *exact* emulation: the sequential 8-bubble
ElementaryStep of ``/root/reference/bubble_decoder.c:316-593`` (and the v2
standalone decoder's 4-candidate L-bubble,
``EMS_HS_L-BubbleCheck_UBS_decoder_v2.c:1547-1701``) as a
``lax.fori_loop`` at a fixed nbOper budget, vmapped over frames x rows.

It reproduces the host oracle (``golden.elementary_bubble`` /
``golden.elementary_lbubble``) bit-exactly — including the quirky boundary
breaks and first-index tie-breaks — so batched device decodes can be
checked against the C algorithm *trajectory-for-trajectory* on real
hardware, not just in distribution.  It is deliberately sequential
(nbOper loop steps cannot be reordered without changing the algorithm)
and therefore slow; use ``cn_impl="bubble"``/``"lbubble"`` only for
validation, never for throughput.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .minconv import topk_message

BIG = 1e5  # the reference "infinity" (bubble_decoder.c:107,371)


def _elementary(v1, g1, v2, g2, *, nm: int, nb_oper: int, q: int,
                variant: str):
    """One exact elementary step on a single pair of truncated lists.

    v1, v2: [nm] float ascending (unfilled = BIG); g1, g2: [nm] int32
    poly-rep GF ids (unfilled = -1).  Returns (out_v [nm], out_g [nm])
    with the golden module's conventions.  Mirrors
    ``golden.elementary_bubble`` / ``golden.elementary_lbubble`` exactly.
    """
    if variant == "8":
        nb = 8
        half = nb // 2
        # rows 0..half-1 seed at column 0 and move right; the other half
        # seed at row `half`, columns 0..half-1, and move down
        bi0 = jnp.array([*range(half)] + [half] * half, jnp.int32)
        bj0 = jnp.array([0] * half + [*range(half)], jnp.int32)
        down = jnp.array([False] * half + [True] * half)
        # seeds check index bounds only (golden.py:51-56): unfilled slots
        # carry BIG values so their sums are already ~BIG
        iv = jnp.where(bi0 < nm, v1[jnp.clip(bi0, 0, nm - 1)], BIG)
        jv = jnp.where(bj0 < nm, v2[jnp.clip(bj0, 0, nm - 1)], BIG)
        bv0 = jnp.where((bi0 < nm) & (bj0 < nm), iv + jv, BIG)
    elif variant == "L":
        nb = 4
        # the "2 rows + 2 columns" L shape: bubbles 0,1 move right along
        # rows 0,1; bubbles 2,3 move down columns 0,1 (``u = pos>>1;
        # row += u; col += 1-u``, v2:1678-1684)
        bi0 = jnp.array([0, 1, 2, 2], jnp.int32)
        bj0 = jnp.array([0, 0, 0, 1], jnp.int32)
        down = jnp.array([False, False, True, True])
        # L-bubble seeds use cand(): unfilled (g<0) seeds are BIG
        # (golden.py:97-108)
        ic = jnp.clip(bi0, 0, nm - 1)
        jc = jnp.clip(bj0, 0, nm - 1)
        ok = ((bi0 < nm) & (bj0 < nm)
              & (g1[ic] >= 0) & (g2[jc] >= 0))
        bv0 = jnp.where(ok, v1[ic] + v2[jc], BIG)
    else:
        raise ValueError(variant)

    def body(_, st):
        out_v, out_g, seen, s, done, bv, bi, bj = st
        pos = jnp.argmin(bv)  # first minimal index, like Python min()
        i, j = bi[pos], bj[pos]
        ic = jnp.clip(i, 0, nm - 1)
        jc = jnp.clip(j, 0, nm - 1)
        # validity break BEFORE the output write (golden.py:61-62,113-114)
        done = done | (i >= nm) | (j >= nm) | (g1[ic] < 0) | (g2[jc] < 0)
        gf = (g1[ic] ^ g2[jc]) & (q - 1)
        new = (~done) & (~seen[gf])
        sc = jnp.clip(s, 0, nm - 1)
        out_v = out_v.at[sc].set(jnp.where(new, bv[pos], out_v[sc]))
        out_g = out_g.at[sc].set(jnp.where(new, gf, out_g[sc]))
        seen = seen.at[gf].set(seen[gf] | new)
        s = s + new.astype(jnp.int32)
        done = done | (s >= nm)
        # boundary break after the write (golden.py:72-74,123-124)
        done = done | (i >= nm - 1) | (j >= nm - 1)
        ni = jnp.where(down[pos], i + 1, i)
        nj = jnp.where(down[pos], j, j + 1)
        nic = jnp.clip(ni, 0, nm - 1)
        njc = jnp.clip(nj, 0, nm - 1)
        if variant == "8":
            # 8-bubble advance checks index bounds only (golden.py:79)
            nv = jnp.where((ni < nm) & (nj < nm), v1[nic] + v2[njc], BIG)
        else:
            nv = jnp.where(
                (ni < nm) & (nj < nm) & (g1[nic] >= 0) & (g2[njc] >= 0),
                v1[nic] + v2[njc], BIG,
            )
        keep = done
        bv = bv.at[pos].set(jnp.where(keep, bv[pos], nv))
        bi = bi.at[pos].set(jnp.where(keep, i, ni))
        bj = bj.at[pos].set(jnp.where(keep, j, nj))
        return out_v, out_g, seen, s, done, bv, bi, bj

    st = (
        jnp.full((nm,), BIG, v1.dtype),
        jnp.full((nm,), -1, jnp.int32),
        jnp.zeros((q,), bool),
        jnp.int32(0),
        jnp.array(False),
        bv0.astype(v1.dtype),
        bi0,
        bj0,
    )
    out_v, out_g, *_ = jax.lax.fori_loop(0, nb_oper, body, st)
    return out_v, out_g


def elementary_bubble_batch(v1, g1, v2, g2, nm: int, nb_oper: int,
                            q: int, variant: str = "8"):
    """Batched exact elementary step: [..., nm] lists -> [..., nm] lists."""
    fn = functools.partial(_elementary, nm=nm, nb_oper=nb_oper, q=q,
                           variant=variant)
    lead = v1.shape[:-1]
    flat = lambda a: a.reshape((-1,) + a.shape[len(lead):])
    ov, og = jax.vmap(fn)(flat(v1), flat(g1.astype(jnp.int32)),
                          flat(v2), flat(g2.astype(jnp.int32)))
    return ov.reshape(lead + (nm,)), og.reshape(lead + (nm,))


def fb_checknode_bubble(vr_rows, nm: int, nb_oper: int, offset: float,
                        variant: str = "8", valid=None):
    """Exact F/B bubble-check CN on rotated dense rows.

    vr_rows: [..., dc, q] rotated (coefficient-multiplied) dense min-cost
    messages.  Returns dense [..., dc, q] CtoV outputs in the rotated
    domain, offset-saturated exactly like ``golden.check_pass_ems``
    (bubble_decoder.c:249-278): fill value = (last kept) + offset; slots
    with an empty output list become uniform ``offset``.
    """
    dc, q = vr_rows.shape[-2], vr_rows.shape[-1]
    assert dc >= 3
    vals, gfs = topk_message(vr_rows, nm)            # [..., dc, nm]
    # the reference normalizes each sorted list to its min (NB_LDPC.c:371)
    vals = vals - vals[..., :1]

    elem = functools.partial(elementary_bubble_batch, nm=nm,
                             nb_oper=nb_oper, q=q, variant=variant)
    fwd_v = [vals[..., 0, :]]
    fwd_g = [gfs[..., 0, :]]
    bwd_v = [vals[..., dc - 1, :]]
    bwd_g = [gfs[..., dc - 1, :]]
    for t in range(1, dc - 1):
        u = dc - 1 - t
        fv, fg = elem(fwd_v[-1], fwd_g[-1], vals[..., t, :], gfs[..., t, :])
        bv, bg = elem(bwd_v[-1], bwd_g[-1], vals[..., u, :], gfs[..., u, :])
        fwd_v.append(fv)
        fwd_g.append(fg)
        bwd_v.append(bv)
        bwd_g.append(bg)
    # after reversal, bwd_v[i] is the conv of slots i+1..dc-1 (golden's
    # bwd_v[i+1]); fwd_v[i] is the conv of slots 0..i
    bwd_v = bwd_v[::-1]
    bwd_g = bwd_g[::-1]
    outs_v = [bwd_v[0]]
    outs_g = [bwd_g[0]]
    for t in range(1, dc - 1):
        ov, og = elem(fwd_v[t - 1], fwd_g[t - 1], bwd_v[t], bwd_g[t])
        outs_v.append(ov)
        outs_g.append(og)
    outs_v.append(fwd_v[dc - 2])
    outs_g.append(fwd_g[dc - 2])
    ov = jnp.stack(outs_v, axis=-2)                   # [..., dc, nm]
    og = jnp.stack(outs_g, axis=-2)

    filled = og >= 0
    any_filled = filled.any(axis=-1, keepdims=True)
    last = jnp.max(jnp.where(filled, ov, -BIG), axis=-1, keepdims=True)
    sat = jnp.where(any_filled, last + offset, offset)
    # scatter the kept entries over a dense [q] vector filled with sat;
    # unfilled slots scatter into a q-th scratch lane
    og_safe = jnp.where(filled, og, q)
    put = jnp.where(filled, ov, sat)
    dense = jnp.zeros(ov.shape[:-1] + (q + 1,), ov.dtype) + sat
    dense = _scatter_last(dense, og_safe, put)
    out = dense[..., :q]
    if valid is not None:
        out = jnp.where(valid[..., None], out, 0.0)
    return out


def _scatter_last(dense, idx, val):
    """dense[..., idx[..., k]] = val[..., k] along the last axis."""
    onehot = jax.nn.one_hot(idx, dense.shape[-1], dtype=bool,
                            axis=-1)                 # [..., nm, q+1]
    hit = onehot.any(axis=-2)
    # idx entries are unique where it matters (GF-dedup), so a min-reduce
    # over the one-hot picks the written value
    spread = jnp.min(
        jnp.where(onehot, val[..., None], jnp.inf), axis=-2
    )
    return jnp.where(hit, spread.astype(dense.dtype), dense)
