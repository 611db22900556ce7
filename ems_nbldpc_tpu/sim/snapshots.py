"""BER/FER snapshots at multiple iteration budgets in one decode pass.

The v2 standalone reference decoder reports BER for iteration budgets
10/20/30/40/50 from a single simulation
(``EMS_HS_L-BubbleCheck_UBS_decoder_v2.c:2174-2307``).  Here: run the
host-loop layered stepper once up to ``max(budgets)`` iterations and record
error counters at each budget — one decode, a whole iteration-budget sweep.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..decoder.graph import DeviceGraph
from ..decoder.layered import make_layered_stepper
from ..models.channels import simulate
from ..models.code import NBCode
from .mc import SimConfig, _popcount, make_codeword_fn


@dataclasses.dataclass
class SnapshotResult:
    budgets: list
    frames: int
    frame_errors: dict      # budget -> count
    bit_errors: dict        # budget -> count

    def fer(self, budget):
        return self.frame_errors[budget] / max(self.frames, 1)

    def ber(self, budget, k_bits):
        return self.bit_errors[budget] / max(self.frames * k_bits, 1)


def run_snapshots(code: NBCode, cfg: SimConfig, budgets=(10, 20, 30, 40, 50),
                  batches: int = 1) -> SnapshotResult:
    g = DeviceGraph.from_code(code)
    d = cfg.decoder
    init_fn, step_fn = make_layered_stepper(
        g, nm=d.nm, offset=d.offset, cn=d.cn, cn_impl=d.cn_impl,
    )
    budgets = sorted(budgets)
    k = code.k

    make_codeword, _enc, pmat_np = make_codeword_fn(code, cfg)
    pmat_dev = jax.device_put(pmat_np)

    @jax.jit
    def gen(key, pmat):
        kinfo, kchan = jax.random.split(key)
        cw = make_codeword(kinfo, pmat)
        intr = simulate(kchan, cw, code.q, cfg.channel, cfg.ebn0_db,
                        code.rate)
        return cw, intr

    @jax.jit
    def count_errors(decide, cw):
        diff = decide[:, :k] ^ cw[:, :k]
        be = _popcount(diff).sum(axis=1)
        return (be > cfg.fake_bch_t).sum(), be.sum()

    frames = 0
    fe = {b: 0 for b in budgets}
    be = {b: 0 for b in budgets}
    key = jax.random.PRNGKey(cfg.seed)
    for bidx in range(batches):
        cw, intr = gen(jax.random.fold_in(key, bidx), pmat_dev)
        state = init_fn(intr)
        frames += cfg.frames_per_batch
        it = 0
        for b in budgets:
            while it < b and not bool(np.asarray(state[3].all())):
                state = step_fn(state)
                it += 1
            f_err, b_err = count_errors(state[2], cw)
            fe[b] += int(np.asarray(f_err))
            be[b] += int(np.asarray(b_err))
    return SnapshotResult(budgets=list(budgets), frames=frames,
                          frame_errors=fe, bit_errors=be)
