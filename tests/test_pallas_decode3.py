"""v3 fused full-format decode kernel (interpret mode).

The bar (VERDICT round 2, item 3): reference-encoded streams — context
maps, block switching, tree groups, static-dictionary transforms — decode
through the device path bit-exactly.  The small Google-encoded corpus
vectors exercise all of it with reference bytes (quickfox/ukkonooa are
dictionary+transform words; monkey/cp852 use context maps + block
switching); this framework's own full-path q5/q11 encodes cover
multi-tree context-modeled streams at test scale.

Interpret-mode cost scales with the ring sweep, so tests use H=512.
"""

import numpy as np
import pytest

from brotli_tpu.decode import decode as host_decode
from brotli_tpu.encode import encode
from brotli_tpu.ops import pallas_decode3 as P3

from conftest import VECTORS_DIR

H = 512   # small VMEM ring: inputs below keep distances < H-16


def _vec(name: str) -> bytes:
    return open(f"{VECTORS_DIR}/{name}", "rb").read()


# single-compressed-metablock Google-encoded vectors (quickfox/xyzzy use an
# uncompressed metablock — a stream shape the host handles)
GOOGLE_SMALL = [
    "ukkonooa", "10x10y", "64x", "monkey", "cp852-utf8", "cp1251-utf16le",
]


def test_google_vectors_on_device():
    """Google-encoded reference streams, bit-exact through the fused kernel
    (multi-tree literal groups, context maps — monkey has 2 literal trees,
    cp1251-utf16le has 7)."""
    streams = [_vec(f"{n}.compressed") for n in GOOGLE_SMALL]
    expected = [_vec(n) for n in GOOGLE_SMALL]
    assert P3.preflight_v3(streams, max_groups=8) is not None, \
        "vectors must be eligible"
    from brotli_tpu.ops.pallas_decode2 import fallback_stats

    before = fallback_stats()["lanes_fallback"]
    got = P3.decode_batch_v3(streams, H=2048, interpret=True, max_groups=8)
    assert got == expected
    assert fallback_stats()["lanes_fallback"] == before, "lanes fell back"


def test_dictionary_transforms_on_device():
    """Crafted valid stream of pure static-dictionary references across
    transform classes (identity / omit-first / omit-last / uppercase-first
    / uppercase-all, with prefixes+suffixes); host-verified, then device."""
    from brotli_tpu.decode import dictionary as sd
    from brotli_tpu.decode.transforms import TRANSFORM_LIST, transform_word
    from brotli_tpu.encode.api import _NO_MASK
    from brotli_tpu.encode.bitwriter import BitWriter, encode_window_bits
    from brotli_tpu.encode.command import make_command
    from brotli_tpu.encode.metablock import store_metablock_trivial

    picks = []
    for tf, (pre, op, suf) in enumerate(TRANSFORM_LIST):
        picks.append((tf, op))
    # one representative per op class, favoring ones with prefix/suffix
    chosen, seen_ops = [], set()
    for tf, op in picks:
        if op not in seen_ops:
            chosen.append(tf)
            seen_ops.add(op)
    parts, commands, pos = [], [], 0
    for k, tf in enumerate(chosen):
        wlen = 6 + (k % 5)
        shift = sd.size_bits(wlen)
        widx = (37 * k) % (1 << shift)
        word = sd.get_word(wlen, widx)
        out = transform_word(word, tf)
        distance = min(pos, (1 << 22) - 16) + 1 + ((tf << shift) | widx)
        commands.append(make_command(0, wlen, 0, distance + 15, 0, 0))
        parts.append(out)
        pos += len(out)
    expected = b"".join(parts)
    w = BitWriter()
    nb, val = encode_window_bits(22, False)
    w.write(nb, val)
    store_metablock_trivial(
        w, expected, 0, len(expected), _NO_MASK, True, commands, 64, 0, 0
    )
    stream = w.finish()
    assert host_decode(stream) == expected   # valid brotli, host golden
    assert P3.preflight_one_v3(stream) is not None
    got = P3.decode_batch_v3([stream], H=H, interpret=True)
    assert got == [expected]


def test_own_full_path_streams():
    """This framework's q5/q11 full-metablock-path streams (block splits,
    context modeling, multiple trees) decode on device."""
    alice = _vec("alice29.txt")
    cases = [
        encode(alice[:480], quality=11),
        encode(alice[480:960], quality=11),
        encode(alice[:400], quality=5),
        encode(bytes(reversed(alice[:450])), quality=9),
    ]
    expected = [host_decode(s) for s in cases]
    got = P3.decode_batch_v3(cases, H=H, interpret=True)
    assert got == expected


def test_binning_mixed_signatures():
    """Streams with distinct table signatures bin into separate groups."""
    alice = _vec("alice29.txt")
    streams = [
        encode(alice[:300], quality=11),
        encode(alice[:300], quality=11),   # same sig -> same group
        encode(alice[300:650], quality=5),
        _vec("ukkonooa.compressed"),
    ]
    batch = P3.preflight_v3(streams)
    assert batch is not None
    assert batch.groups == 3
    got = P3.decode_batch_v3(streams, H=H, interpret=True)
    assert got == [host_decode(s) for s in streams]


def test_far_distance_decodes_via_hbm_fetch():
    """Distances beyond the VMEM ring resolve through the far-fetch
    staging window (flushed output rows DMA'd back from HBM) — no host
    fallback, bit-exact (VERDICT r4 missing #1; reference ring realloc
    engine.ts:608-630)."""
    alice = _vec("alice29.txt")
    data = alice[:3000]          # > H: far distances guaranteed at q11
    s = encode(data, quality=11)
    from brotli_tpu.ops.pallas_decode2 import fallback_stats

    before = fallback_stats()["lanes_fallback"]
    got = P3.decode_batch_v3([s], H=H, interpret=True)
    assert got == [data]
    assert fallback_stats()["lanes_fallback"] == before


def test_v3_truncated_lane_flags_not_garbage():
    """Mid-body truncation must be flagged (widx overrun vs n_words), and
    intact lanes in the same batch stay bit-exact.  The zero-padded word
    table otherwise lets a truncated lane reach DONE decoding zeros
    (reference analog: unexpected-EOF, engine.ts:2136-2144)."""
    alice = _vec("alice29.txt")
    chunks = [alice[0:450], alice[450:900], alice[900:1350]]
    streams = [encode(c, quality=5) for c in chunks]
    bad_i = 1
    p_bad = P3.preflight_one_v3(streams[bad_i])
    hdr_bytes = p_bad.cmd_start_bit // 8 + 1
    keep = hdr_bytes + (len(streams[bad_i]) - hdr_bytes) // 4
    streams[bad_i] = streams[bad_i][:keep]   # drop 75% of the body
    assert P3.preflight_one_v3(streams[bad_i]) is not None, \
        "cut must hit the body, not the header"
    batch = P3.preflight_v3(streams)
    out, n_out = P3.run_batch_v3(batch, H=H, interpret=True)
    errs = out[:, n_out].reshape(-1)
    widx = out[:, n_out + 4].reshape(-1).astype(np.int64)
    flagged = (errs != 0) | (widx > batch.n_words.astype(np.int64) + 4)
    slot_of = {int(batch.perm[s]): s
               for s in range(batch.groups * 1024) if batch.perm[s] >= 0}
    assert flagged[slot_of[bad_i]], "truncated lane must flag"
    words = out[:, :n_out]
    by_stream = np.transpose(words, (0, 2, 3, 1)).reshape(
        batch.groups * 1024, -1
    )
    raw = np.ascontiguousarray(by_stream).astype("<u4").view(np.uint8)
    raw = raw.reshape(batch.groups * 1024, -1)
    for i in (0, 2):
        s = slot_of[i]
        assert not flagged[s]
        assert bytes(raw[s, : batch.mlens[s]]) == chunks[i]
    # the library batch path surfaces it as the host fallback's error
    from brotli_tpu import BrotliError

    with pytest.raises(BrotliError):
        P3.decode_batch_v3(streams, H=H, interpret=True)


def test_v3_poisoned_distance_flags():
    """A crafted stream whose copy distance lands beyond both the window
    and the static-dictionary range must flag ERR_STREAM on device (and
    raise on host) — never hang, never emit silent garbage."""
    from brotli_tpu.encode.api import _NO_MASK
    from brotli_tpu.encode.bitwriter import BitWriter, encode_window_bits
    from brotli_tpu.encode.command import make_command
    from brotli_tpu.encode.metablock import store_metablock_trivial

    data = b"ABCDEFGH????"          # 8 literals + 4 'copied' bytes
    bogus_dist = (1 << 22) + (1 << 25)   # far past maxbw + dict range
    commands = [make_command(8, 4, 0, bogus_dist + 15, 0, 0)]
    w = BitWriter()
    nb, val = encode_window_bits(22, False)
    w.write(nb, val)
    store_metablock_trivial(
        w, data, 0, len(data), _NO_MASK, True, commands, 64, 0, 0
    )
    stream = w.finish()
    from brotli_tpu import BrotliError

    with pytest.raises(BrotliError):
        host_decode(stream)
    assert P3.preflight_one_v3(stream) is not None
    batch = P3.preflight_v3([stream])
    out, n_out = P3.run_batch_v3(batch, H=H, interpret=True)
    errs = out[:, n_out].reshape(-1)
    assert errs[0] != 0, "poisoned distance must flag the lane"


def test_preflight_caps():
    """Streams over the static caps (e.g. enc-ttf's 61 literal block
    types) are host-handled, not mis-decoded."""
    big = open("/root/reference/bench/fixtures/enc-ttf.br", "rb").read()
    assert P3.preflight_one_v3(big) is None
    got = P3.decode_batch_v3([big], H=H, interpret=True)
    assert got == [host_decode(big)]


def test_preflight_caps_full_path():
    """The full path's raised caps admit enc-ttf's 80-tree/61-type
    metablock (device decode of the reference's headline fixture; the
    kernel run itself is chip-scale, covered by bench.py)."""
    from brotli_tpu.decode.bitreader import BitReader
    from brotli_tpu.decode.engine import (
        _MetablockState,
        _decode_window_bits,
        _read_metablock_length,
    )

    big = open("/root/reference/bench/fixtures/enc-ttf.br", "rb").read()
    br = BitReader(big)
    _decode_window_bits(br, False)
    input_end = bool(br.read(1))
    if input_end:
        assert br.read(1) == 0     # not ISLASTEMPTY
    mbl, is_unc, is_meta = _read_metablock_length(br, input_end)
    assert not is_unc and not is_meta
    st = _MetablockState(br, large_window=False)
    assert len(st.lit_group) == 80 and max(st.num_types) == 61
    assert P3._caps_full_ok(st), "enc-ttf must be device-eligible"


def test_multimetablock_stream_on_device():
    """A streaming-encoder stream (several compressed metablocks whose LZ
    window crosses the boundaries) decodes fully on device: each round
    carries the prior output as the HBM history prefix plus the distance
    ring and p1/p2 from the status tail (reference metablock loop
    engine.ts:631-678)."""
    from brotli_tpu.encode.api import Encoder
    from brotli_tpu.ops.pallas_decode2 import fallback_stats

    data = _vec("alice29.txt")[:6144]
    enc = Encoder(quality=5, lgwin=18)
    stream = b""
    for off in range(0, len(data), 1024):
        stream += enc.update(data[off:off + 1024])
    stream += enc.finish()
    assert host_decode(stream) == data
    before = fallback_stats()["lanes_fallback"]
    got = P3.decode_batch_v3_full([stream], H=1024, interpret=True)
    assert got[0] == data
    assert fallback_stats()["lanes_fallback"] == before


def test_full_path_google_vectors():
    """Small Google-encoded vectors through the multi-metablock driver."""
    from brotli_tpu.ops.pallas_decode2 import fallback_stats

    names = ["10x10y", "64x", "ukkonooa", "monkey"]
    streams = [_vec(n + ".compressed") for n in names]
    exp = [_vec(n) for n in names]
    before = fallback_stats()["lanes_fallback"]
    got = P3.decode_batch_v3_full(streams, H=1024, interpret=True)
    assert got == exp
    assert fallback_stats()["lanes_fallback"] == before


def test_full_path_metadata_and_uncompressed_blocks():
    """Streams containing metadata splice blocks (parallel_encode's
    byte-aligned fragment seams) and uncompressed metablocks decode
    through the full driver (VERDICT r4 missing #5; reference
    engine.ts:838-866)."""
    from brotli_tpu.parallel.shard import parallel_encode

    data = _vec("alice29.txt")[:4096]
    spliced = parallel_encode(data, shard_size=1024, quality=5)
    got = P3.decode_batch_v3_full([spliced], H=1024, interpret=True)
    assert got[0] == data

    unc = encode(data, quality=0)   # uncompressed metablocks only
    got0 = P3.decode_batch_v3_full([unc], H=1024, interpret=True)
    assert got0[0] == data
