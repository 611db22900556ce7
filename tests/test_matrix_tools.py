import numpy as np

from ems_nbldpc_tpu.models import registry
from ems_nbldpc_tpu.models.formats import parse, parse_alist, parse_knubs
from ems_nbldpc_tpu.models.tools import (
    convert,
    from_dense,
    to_dense,
    write_alist,
    write_ubs,
)


def test_alist_roundtrip(tmp_path):
    src = registry.matrix_path("Mat24_N48_M24")
    parsed = parse(src)
    out = tmp_path / "code.alist"
    write_alist(parsed, str(out))
    back = parse_alist(str(out))
    assert np.array_equal(to_dense(back), to_dense(parsed))
    assert back.q == parsed.q


def test_ubs_roundtrip(tmp_path):
    src = registry.matrix_path("KN/N96_K48_GF64.txt")
    parsed = parse(src)
    out = tmp_path / "code_ubs.txt"
    write_ubs(parsed, str(out))
    back = parse_knubs(str(out), fmt="ubs")
    assert np.array_equal(to_dense(back), to_dense(parsed))


def test_dense_roundtrip():
    parsed = parse(registry.matrix_path("Mat26_N48_M16"))
    h = to_dense(parsed)
    back = from_dense(h, parsed.q)
    assert np.array_equal(to_dense(back), h)


def test_convert(tmp_path):
    dst = tmp_path / "x.alist"
    convert(registry.matrix_path("Mat24_N48_M24"), str(dst))
    assert parse_alist(str(dst)).n == 48
