"""On-device LZ resolve kernel (ops/pallas_resolve.py), interpret mode.

Small V/DT configs keep interpret time sane (kernel-body size multiplies
interpret cost); the real-chip configuration is exercised by bench.py.
"""

import numpy as np
import pytest

from brotli_tpu.encode.sharded import encode_sharded
from brotli_tpu.ops import pallas_decode2 as P2
from brotli_tpu.ops import pallas_resolve as PR

from conftest import VECTORS_DIR

ALICE = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()


def _xorshift_bytes(n, seed=99):
    x = seed
    out = bytearray()
    while len(out) < n:
        x ^= (x << 13) & 0xFFFFFFFF
        x ^= x >> 17
        x ^= (x << 5) & 0xFFFFFFFF
        out.append(x & 0xFF)
    return bytes(out)


def _resolve_hand_tokens(tok_cols, mlens, H=256, DT=16):
    """tok_cols: list of per-stream token lists; build (R, 8, 128) array."""
    R = max(DT * 2, max(len(c) for c in tok_cols))
    R = -(-R // DT) * DT
    toks = np.zeros((R, 8, 128), np.uint32)
    for s, col in enumerate(tok_cols):
        toks[: len(col), s // 128, s % 128] = col
    full_mlens = np.zeros(1024, np.int64)
    full_mlens[: len(mlens)] = mlens
    out, n_rows = PR.resolve_tokens_device(
        toks, full_mlens, H=H, DT=DT, interpret=True
    )
    outs, errs = PR.unpack_resolved(np.asarray(out), n_rows, full_mlens)
    return outs[: len(mlens)], errs[: len(mlens)]


def _lit(*bs):
    assert 1 <= len(bs) <= 3
    t = len(bs) << 24
    for k, b in enumerate(bs):
        t |= b << (8 * k)
    return t


def _fused(length, dist):
    assert 2 <= length <= 255 and dist <= 0x3FFFFF
    return (3 << 30) | (length << 22) | dist


def _long_copy(length, dist):
    return [(1 << 30) | length, (2 << 30) | dist]


def test_hand_tokens_literals_and_copies():
    # stream 0: 4 lits then fused copy dist=4 len=8 (abcdabcdabcd)
    col0 = [_lit(97, 98, 99), _lit(100), _fused(8, 4)]
    # stream 1: pure literals with pads interleaved
    col1 = [_lit(65, 66), 0, 0, _lit(67), 0, _lit(68, 69, 70)]
    # stream 2: long-form copy pair
    col2 = [_lit(120, 121), _lit(122), *_long_copy(9, 3)]
    outs, errs = _resolve_hand_tokens(
        [col0, col1, col2], [12, 6, 12]
    )
    assert errs[:3].tolist() == [0, 0, 0]
    assert outs[0] == b"abcdabcdabcd"
    assert outs[1] == b"ABCDEF"
    assert outs[2] == b"xyz" + b"xyzxyzxyz"


@pytest.mark.parametrize("dist", [1, 2, 3, 4, 5, 6, 7])
def test_hand_tokens_small_distance_replication(dist):
    seed = bytes(range(65, 65 + dist))
    col = [_lit(*seed[i : i + 3]) for i in range(0, dist, 3)]
    col.append(_fused(17, dist))
    expect = (seed * 32)[: dist + 17]
    outs, errs = _resolve_hand_tokens([col], [len(expect)])
    assert errs[0] == 0
    assert outs[0] == expect, f"dist={dist}"


def test_hand_tokens_far_distance_flags_error():
    col = [_lit(1, 2, 3), _lit(4), _fused(4, 300)]  # H=256 -> too far
    # make pos large enough that dist 300 is plausible: pad with literals
    col = [_lit(7, 7, 7)] * 120 + [_fused(4, 300)]
    outs, errs = _resolve_hand_tokens([col], [364])
    assert errs[0] & PR.ERR_FAR_DIST


def test_hand_tokens_malformed_distance_flags_error():
    col = [_lit(1, 2, 3), (2 << 30) | 2]  # tag-2 with no pending tag-1
    outs, errs = _resolve_hand_tokens([col], [10])
    assert errs[0] & PR.ERR_MALFORMED


def _e2e(data, chunk, H=512, groups=None, max_fallback=0):
    # stream rows (chunk/4) must stay under V - FLUSH so inter-lane output
    # skew cannot hit the flush-frontier cap in these tiny configs
    streams = encode_sharded(data, chunk_size=chunk, max_distance=H - 16)
    before = P2.fallback_stats()["lanes_fallback"]
    got = P2.decode_batch_device_e2e(streams, H=H, interpret=True,
                                     groups=groups, token_row_cap=512)
    assert b"".join(got) == data
    fell = P2.fallback_stats()["lanes_fallback"] - before
    assert fell <= max_fallback, f"{fell} lanes fell back to host"


def test_e2e_text():
    _e2e(ALICE[:1600], 192)


def test_e2e_zeros_runs():
    _e2e(bytes(800), 160)


def test_e2e_random_literals():
    _e2e(_xorshift_bytes(700), 224)


def test_e2e_mixed_partial_tail():
    _e2e(ALICE[:777] + bytes(100) + _xorshift_bytes(50), 256)


def test_e2e_far_distance_falls_back_to_host():
    # no max_distance cap: a 1.5 KB-period repetition forces far matches
    block = ALICE[:1500]
    data = block + block
    streams = encode_sharded(data, chunk_size=3000)
    before = P2.fallback_stats()["lanes_fallback"]
    got = P2.decode_batch_device_e2e(streams, H=256, interpret=True,
                                     token_row_cap=512)
    assert b"".join(got) == data
    assert P2.fallback_stats()["lanes_fallback"] > before


def test_resolve_matches_host_resolver_on_kernel_tokens():
    """Entropy-kernel tokens resolved on device == native host resolver."""
    data = ALICE[:1024]
    streams = encode_sharded(data, chunk_size=256, max_distance=400)
    batch = P2.preflight_shared(streams)
    assert batch is not None
    tokens, phases = P2.run_batch(batch, interpret=True)
    tokens = tokens[:320]  # actual token rows fit; budget tail is garbage
    # host path
    from brotli_tpu.native import lz_resolve_batch_v2

    expected = np.zeros(P2.NSTREAM, dtype=np.int64)
    expected[: batch.n_streams] = batch.mlens[: batch.n_streams]
    host_out, host_lens = lz_resolve_batch_v2(
        tokens.reshape(tokens.shape[0], -1), expected.copy(), 2
    )
    dev, n_rows = PR.resolve_tokens_device(
        tokens, expected, H=512, interpret=True
    )
    outs, errs = PR.unpack_resolved(np.asarray(dev), n_rows, expected)
    for i in range(batch.n_streams):
        assert errs[i] == 0
        assert outs[i] == bytes(host_out[i, : host_lens[i]])
