"""The generic syndrome CN subsumes the ems2/ems3 fast specializations.

The reference's ``syndrome_ems2``/``syndrome_ems3``
(``syndrome_decoder.c:659-1303``; dormant — the call at ``NB_LDPC.c:390``
is commented out) avoid the per-edge decorrelation pass by caching, per GF
bucket, the global top-3 config LLRs (min3 subject to ``check_deviation``
:2232-2282, which guarantees every edge has a deviation-free entry among
the three) and then choosing per edge the first cached min whose config
does not deviate on that edge.

Our ``syndrome_checknode`` computes the *exact* per-edge decorrelated
minimum instead.  This test pins the relationship with a NumPy oracle of
the ems2 decorrelator (the reference's no-bayes "normal" variant,
``syndrome_decoder.c:838-850``):

* wherever the 3-min cache finds a deviation-free entry, that entry IS the
  exact decorrelated min — the generic CN must agree (to bf16 tolerance);
* wherever the cache misses (all three mins deviate on the edge), ems2
  substitutes min3, which under-estimates the true decorrelated min — the
  generic CN must be >= it (it is *better informed*, never optimistic).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from ems_nbldpc_tpu.ops.syndrome_cn import build_config_table, syndrome_checknode

SAT = 1e4  # stand-in for the reference's fixed sat init (10/20), set high
#            so "empty bucket" is unambiguous with random inputs


def ems2_oracle(vals, gfs, cfg, q):
    """Per-edge (value, case) of the ems2 3-min decorrelator, no bayes.

    vals/gfs: [dc, nm] sorted rotated lists.  Returns (out [dc, q],
    case [dc, q]) with case 0=empty bucket, 1=cache hit (exact), 2=cache
    miss (min3 substitution).
    """
    c, dc = cfg.shape
    llr = np.zeros(c)
    synd = np.zeros(c, np.int64)
    for t in range(dc):
        llr = llr + vals[t][cfg[:, t]]
        synd = synd ^ gfs[t][cfg[:, t]]
    min1 = np.full(q, SAT); idx1 = np.zeros(q, np.int64)
    min2 = np.full(q, SAT); idx2 = np.zeros(q, np.int64)
    min3 = np.full(q, SAT); idx3 = np.zeros(q, np.int64)
    # first step: running top-2 per bucket (syndrome_decoder.c:722-756)
    for i in range(c):
        b = synd[i]
        if min1[b] > llr[i]:
            min2[b], idx2[b] = min1[b], idx1[b]
            min1[b], idx1[b] = llr[i], i
        elif min2[b] > llr[i]:
            min2[b], idx2[b] = llr[i], i
    # second step: min3 with the deviation-disjointness guarantee
    # (syndrome_decoder.c:765-806)
    for i in range(c):
        b = synd[i]
        if min3[b] > llr[i] > min2[b]:
            prod = cfg[idx1[b]] * cfg[idx2[b]] * cfg[i]
            if prod.sum() == 0:
                min3[b], idx3[b] = llr[i], i
    out = np.zeros((dc, q))
    case = np.zeros((dc, q), np.int32)
    for t in range(dc):
        for s in range(q):
            b = int(s ^ gfs[t][0])      # bucket -> extrinsic symbol map
            if min1[b] >= SAT:
                out[t, s] = SAT
                case[t, s] = 0
            elif cfg[idx1[b]][t] == 0:
                out[t, s] = min1[b]
                case[t, s] = 1
            elif cfg[idx2[b]][t] == 0 and min2[b] < SAT:
                out[t, s] = min2[b]
                case[t, s] = 1
            elif min3[b] < SAT and cfg[idx3[b]][t] == 0:
                out[t, s] = min3[b]
                case[t, s] = 1
            else:
                out[t, s] = min3[b]
                case[t, s] = 2
    return out, case


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_generic_cn_subsumes_ems2_decorrelator(seed):
    q, dc, nm = 64, 8, 8
    d1, d2, d3, cap = 7, 3, 2, 200
    rng = np.random.default_rng(seed)
    dense = rng.random((dc, q)) * 9
    order = np.argsort(dense, axis=-1)[:, :nm]
    vals = np.take_along_axis(dense, order, axis=-1)
    vals = vals - vals[:, :1]
    gfs = order.astype(np.int64)

    cfg = build_config_table(dc, d1, d2, d3, "trapeze", cap)
    want, case = ems2_oracle(vals, gfs, cfg, q)

    got = np.asarray(syndrome_checknode(
        jnp.asarray(vals)[None], jnp.asarray(gfs)[None], q,
        n_cv=10**6, offset=0.0, d1=d1, d2=d2, d3=d3, shape="trapeze",
        max_configs=cap, use_bayes=False, presort=False,
    ))[0].astype(np.float64)

    hit = case == 1
    miss = case == 2
    assert hit.mean() > 0.5, "design point should mostly cache-hit"
    # bf16 packing in the bucket-min gives ~2^-8 relative error
    tol = 0.08 * np.maximum(want, 1.0)
    np.testing.assert_array_less(
        np.abs(got - want)[hit], tol[hit],
        err_msg="generic CN must equal ems2 where its 3-min cache hits",
    )
    # cache misses split two ways, and the generic CN refines both:
    # a real min3 under-estimates the true decorrelated min (ems2
    # optimistic -> ours >=); an exhausted cache (min3 still sat) throws
    # the bucket away entirely (ems2 pessimistic -> ours <=, recovering
    # the information)
    opt = miss & (want < SAT)
    pes = miss & (want >= SAT)
    if opt.any():
        assert (got[opt] >= want[opt] - tol[opt]).all(), (
            "generic CN must never be more optimistic than ems2's min3 "
            "substitution"
        )
    if pes.any():
        assert (got[pes] <= want[pes]).all(), (
            "where ems2's cache is exhausted the exact CN must recover "
            "a value, not saturate"
        )
