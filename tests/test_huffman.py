"""Unit tests for the shared Huffman table builder and bit reader."""

import pytest

from brotli_tpu.decode.bitreader import BitReader, BrotliError
from brotli_tpu.decode.huffman import build_huffman_table, read_symbol


def _encode_bits(bit_string: str) -> bytes:
    """LSB-first bit string -> bytes."""
    out = bytearray()
    for i in range(0, len(bit_string), 8):
        chunk = bit_string[i : i + 8]
        out.append(sum(int(b) << j for j, b in enumerate(chunk)))
    return bytes(out)


def _canonical_codes(lengths):
    """(code, len) per symbol, canonical order, MSB-first code values."""
    pairs = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln)
    codes = {}
    code = 0
    prev_len = pairs[0][0]
    for ln, sym in pairs:
        code <<= ln - prev_len
        prev_len = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


@pytest.mark.parametrize(
    "lengths",
    [
        [1, 1],
        [1, 2, 2],
        [2, 2, 2, 2],
        [1, 2, 3, 3],
        [3, 3, 3, 3, 3, 2, 4, 4],
        # lengths > 8 exercise the two-level subtables
        [1] + [10] * 16 + [12] * 64 + [15] * 256,
    ],
)
def test_roundtrip_table(lengths):
    codes = _canonical_codes(lengths)
    table = [0] * 4096
    build_huffman_table(table, 0, 8, list(lengths))
    for sym, (code, ln) in codes.items():
        # brotli writes codes LSB-first with bit-reversed canonical values
        rev = int(format(code, f"0{ln}b")[::-1], 2)
        bits = format(rev, f"0{ln}b")[::-1]  # LSB-first string
        br = BitReader(_encode_bits(bits + "0" * 16))
        assert read_symbol(table, 0, br) == sym, f"sym {sym} len {ln}"
        assert br.bitpos == ln


def test_single_symbol_zero_bits():
    table = [0] * 256
    lengths = [0] * 10
    lengths[7] = 1
    build_huffman_table(table, 0, 8, lengths)
    br = BitReader(b"\xff\xff")
    assert read_symbol(table, 0, br) == 7
    assert br.bitpos == 0  # degenerate code consumes no bits


def test_bitreader_basic():
    br = BitReader(bytes([0b10110100, 0xFF]))
    assert br.read(2) == 0b00
    assert br.read(3) == 0b101
    assert br.peek(3) == 0b101
    assert br.read(3) == 0b101
    assert br.read(8) == 0xFF
    br.check_health()
    br.read(8)
    with pytest.raises(BrotliError):
        br.check_health()
