"""Decoder conformance: Google's canonical vector corpus, decoded bit-exactly.

Mirrors the reference's test strategy (test/brotli.test.ts:88-101): every
`*.compressed*` file decodes to its paired original, byte-for-byte.
"""

import os
from pathlib import Path

import pytest

from brotli_tpu import decode, decoded_size, BrotliError

from conftest import VECTORS_DIR, BENCH_FIXTURES_DIR

VEC = Path(VECTORS_DIR)
BENCH = Path(BENCH_FIXTURES_DIR)

_PAIRS = sorted(
    (f.name, f.name.split(".compressed")[0])
    for f in VEC.iterdir()
    if ".compressed" in f.name
)


@pytest.mark.parametrize("comp,base", _PAIRS, ids=[p[0] for p in _PAIRS])
def test_vector(comp: str, base: str):
    out = decode((VEC / comp).read_bytes())
    assert out == (VEC / base).read_bytes()


_BENCH_PAIRS = sorted(
    (f.name, f.name[:-3] + ".bin")
    for f in BENCH.iterdir()
    if f.suffix == ".br" and (BENCH / (f.name[:-3] + ".bin")).exists()
)


@pytest.mark.slow
@pytest.mark.parametrize("comp,base", _BENCH_PAIRS, ids=[p[0] for p in _BENCH_PAIRS])
def test_bench_fixture(comp: str, base: str):
    out = decode((BENCH / comp).read_bytes())
    assert out == (BENCH / base).read_bytes()


def test_decoded_size_empty_stream():
    # ISLAST+ISLASTEMPTY one-byte stream
    assert decode(bytes([0x3B])) == b""


def test_decoded_size_single_metablock():
    data = (VEC / "alice29.txt.compressed").read_bytes()
    n = decoded_size(data)
    if n >= 0:
        assert n == len((VEC / "alice29.txt").read_bytes())


def test_max_output_size_enforced():
    data = (VEC / "alice29.txt.compressed").read_bytes()
    with pytest.raises(BrotliError):
        decode(data, max_output_size=100)
    full = (VEC / "alice29.txt").read_bytes()
    assert decode(data, max_output_size=len(full)) == full


def test_truncated_input_raises():
    data = (VEC / "alice29.txt.compressed").read_bytes()
    with pytest.raises(BrotliError):
        decode(data[: len(data) // 2])


def test_garbage_raises():
    with pytest.raises(BrotliError):
        decode(b"\x0c\xff\xff\xff\xff\xff\xff")


# --- native C++ decoder vs python golden engine ---

def test_native_matches_python_engine():
    from brotli_tpu.decode.engine import decode as py_decode
    from brotli_tpu.native import native_decode

    for comp, base in _PAIRS[:12]:
        data = (VEC / comp).read_bytes()
        assert native_decode(data) == py_decode(data) == (VEC / base).read_bytes()


def test_native_error_codes_match():
    from brotli_tpu.native import native_decode

    for bad in (b"\x1b\x03\x00\xff\xff\xff", b"\x00", b""):
        py_code = nat_code = None
        try:
            from brotli_tpu.decode.engine import decode as py_decode
            py_decode(bad)
        except BrotliError as e:
            py_code = e.code
        try:
            native_decode(bad)
        except BrotliError as e:
            nat_code = e.code
        assert (py_code is None) == (nat_code is None)
