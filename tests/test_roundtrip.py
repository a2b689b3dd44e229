"""Encoder round-trip tests across all qualities (reference test strategy
brotli.test.ts:199-312: quality sweep + deterministic fuzz + streaming)."""

import pytest

from brotli_tpu import decode
from brotli_tpu.encode import Encoder, encode

from conftest import VECTORS_DIR


def _xorshift32(seed):
    x = seed
    while True:
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        yield x


def _random_bytes(n, seed=1):
    g = _xorshift32(seed)
    return bytes(next(g) & 0xFF for _ in range(n))


def _ramp_bytes(n):
    return bytes(i & 0xFF for i in range(n))


ALICE = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()

CASES = [
    b"",
    b"x",
    b"hello world, hello world, hello world! " * 3,
    ALICE[:4500],
    _ramp_bytes(8192),
    b"\x00" * 10000,
    _random_bytes(5000),
]


@pytest.mark.parametrize("quality", list(range(12)))
def test_roundtrip_all_qualities(quality):
    for data in CASES:
        enc = encode(data, quality=quality)
        assert decode(enc) == data, f"q{quality} len={len(data)}"


@pytest.mark.parametrize("quality", [1, 5, 11])
def test_roundtrip_sizes_fuzz(quality):
    sizes = [1, 2, 3, 4, 5, 7, 8, 15, 16, 63, 64, 127, 256, 1000, 4095, 8192]
    for size in sizes:
        for maker, tag in [(_random_bytes, "rnd"), (_ramp_bytes, "ramp")]:
            data = maker(size)
            enc = encode(data, quality=quality)
            assert decode(enc) == data, f"q{quality} {tag} {size}"


def test_modes_roundtrip():
    data = ALICE[:8000]
    for mode in (0, 1, 2):  # GENERIC, TEXT, FONT
        for q in (1, 5, 11):
            enc = encode(data, quality=q, mode=mode)
            assert decode(enc) == data, f"mode={mode} q={q}"


def test_font_mode_differs_from_generic():
    data = open(f"{VECTORS_DIR}/../../../bench/fixtures/enc-ttf.bin", "rb").read()[:20000]
    generic = encode(data, quality=5, mode=0)
    font = encode(data, quality=5, mode=2)
    assert decode(font) == data
    assert font != generic  # npostfix/ndirect actually plumbed


@pytest.mark.parametrize("quality", [1, 4, 5, 9, 10, 11])
def test_streaming_random_chunks(quality):
    data = ALICE[:12000]
    enc = Encoder(quality=quality)
    out = bytearray()
    g = _xorshift32(7)
    i = 0
    while i < len(data):
        n = (next(g) % 257) + 1
        out.extend(enc.update(data[i : i + n]))
        i += n
    out.extend(enc.finish())
    assert decode(bytes(out)) == data


def test_compression_shrinks_text():
    data = ALICE[:40000]
    for q in (1, 5, 9, 11):
        assert len(encode(data, quality=q)) < len(data) * 0.6
