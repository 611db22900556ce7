"""Two-phase Monte-Carlo decoding: cheap first pass, compacted retry.

At operating SNRs most frames converge in 1-3 iterations, but a lockstep
batch pays for its slowest frame (SURVEY.md §7.3 hard part 2).  Phase A
decodes the full batch with a small iteration budget; the few unconverged
frames are compacted host-side into a fixed-size retry batch that gets the
full budget.  FER is unchanged (every frame still sees up to max_iters);
throughput improves by roughly avg_saved_iters / phase_a_iters at high SNR.
"""
from __future__ import annotations

import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.api import decode
from ..decoder.graph import DeviceGraph
from ..models.channels import simulate
from ..models.code import NBCode
from .mc import SimConfig, SimResult, _popcount


def make_twophase(code: NBCode, cfg: SimConfig, phase_a_iters: int = 3,
                  retry_frac: int = 4):
    """Returns run_batch(key) -> np counters [5]."""
    g = DeviceGraph.from_code(code)
    f = cfg.frames_per_batch
    cap = max(8, f // retry_frac)
    d = cfg.decoder

    from .mc import make_codeword_fn

    _cw, enc, pmat_np = make_codeword_fn(code, cfg)
    pmat_dev = jax.device_put(pmat_np)

    @jax.jit
    def gen(key, pmat):
        kinfo, kchan = jax.random.split(key)
        cw = _cw(kinfo, pmat)
        intr = simulate(kchan, cw, code.q, cfg.channel, cfg.ebn0_db,
                        code.rate)
        return cw, intr

    cfg_a = dataclasses.replace(d, max_iters=phase_a_iters)
    cfg_b = d

    # host-loop / compressed decoders carry python control flow and jit
    # internally per iteration; only whole-decode jit the pure variants
    jittable = d.loop != "host" and d.storage != "compressed"

    def phase_a(intr):
        return decode(g, intr, cfg_a)

    def phase_b(intr):
        return decode(g, intr, cfg_b)

    if jittable:
        phase_a = jax.jit(phase_a)
        phase_b = jax.jit(phase_b)

    @jax.jit
    def count(decide, cw, iters, conv):
        k = code.k
        diff = decide[:, :k] ^ cw[:, :k]
        bit_err = _popcount(diff).sum(axis=1)
        frame_err = bit_err > cfg.fake_bch_t
        return jnp.array([
            decide.shape[0], frame_err.sum(), bit_err.sum(),
            (frame_err & conv).sum(), iters.sum(),
        ], jnp.int32)

    def run_batch(key):
        cw, intr = gen(key, pmat_dev)
        decide, iters, conv = phase_a(intr)
        conv_np = np.array(conv)
        decide = np.array(decide)
        iters_np = np.array(iters)
        bad = np.nonzero(~conv_np)[0]
        for start in range(0, len(bad), cap):
            idx = bad[start: start + cap]
            pad = np.concatenate([idx, np.zeros(cap - len(idx), np.int64)])
            d2, it2, c2 = phase_b(intr[pad])
            d2, it2, c2 = np.asarray(d2), np.asarray(it2), np.asarray(c2)
            sel = np.arange(len(idx))
            decide[idx] = d2[sel]
            iters_np[idx] = it2[sel]
            conv_np[idx] = c2[sel]
        return np.asarray(count(
            jnp.asarray(decide), cw, jnp.asarray(iters_np),
            jnp.asarray(conv_np),
        ))

    return run_batch


def run_twophase(code: NBCode, cfg: SimConfig, phase_a_iters: int = 3,
                 verbose: bool = False) -> SimResult:
    run_batch = make_twophase(code, cfg, phase_a_iters)
    totals = np.zeros(5, dtype=np.int64)
    key = jax.random.PRNGKey(cfg.seed)
    t0 = time.perf_counter()
    b = 0
    while totals[0] < cfg.max_frames and totals[1] < cfg.stop_errors:
        totals += run_batch(jax.random.fold_in(key, b)).astype(np.int64)
        b += 1
        if verbose:
            print(f"\rFER={totals[1]}/{totals[0]}", end="", flush=True)
    if verbose:
        print()
    return SimResult(
        frames=int(totals[0]), frame_errors=int(totals[1]),
        bit_errors=int(totals[2]), undetected_errors=int(totals[3]),
        iter_sum=int(totals[4]), elapsed_s=time.perf_counter() - t0,
        config=cfg, code_name=code.name, n=code.n, k=code.k, logq=code.logq,
    )
