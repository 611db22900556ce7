"""config_key must capture everything that shapes a sweep point's RESULT.

Round-4 ADVICE (medium): trace-time env knobs that change numerics
(NBLDPC_LIST_FB=tree truncates differently than chain; NBLDPC_WHT /
NBLDPC_WHT_PRECISION change the SPA arithmetic) were missing from the
key, so a --resume sweep under a different knob setting would silently
skip the other setting's points.  Pure-speed knobs (bit-identical by
construction) must NOT fragment the key.
"""
import os

from ems_nbldpc_tpu.decoder.api import DecoderConfig
from ems_nbldpc_tpu.sim.mc import SimConfig, config_key


def _key(**env):
    saved = {k: os.environ.get(k) for k in env}
    try:
        for k, v in env.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        return config_key(SimConfig(ebn0_db=1.8, decoder=DecoderConfig()))
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_numerics_knobs_fragment_the_key():
    base = _key(NBLDPC_LIST_FB=None, NBLDPC_LIST_TRUNC=None,
                NBLDPC_WHT=None, NBLDPC_WHT_PRECISION=None)
    assert _key(NBLDPC_LIST_FB="tree") != base
    assert _key(NBLDPC_LIST_TRUNC="approx") != base
    assert _key(NBLDPC_WHT="1") != base
    assert _key(NBLDPC_WHT_PRECISION="highest") != base
    # defaults spelled explicitly alias the unset-env key
    assert _key(NBLDPC_LIST_FB="chain", NBLDPC_LIST_TRUNC="sort") == base


def test_speed_only_knobs_do_not_fragment_the_key():
    base = _key()
    for k, v in [("NBLDPC_LISTSORT", "flat"), ("NBLDPC_LIST_CNSEL", "topk"),
                 ("NBLDPC_LIST_DENSECV", "1"), ("NBLDPC_SPA_GROUPED",
                 "blocked"), ("NBLDPC_LAYER_SCAN", "1"), ("NBLDPC_ROT",
                 "matmul")]:
        assert _key(**{k: v}) == base, k


def test_coloring_version_is_in_the_key():
    # cross-round artifacts must not mix layer schedules (round-4 ADVICE)
    from ems_nbldpc_tpu.models.code import COLORING_VERSION
    assert f"col{COLORING_VERSION}" in _key()
