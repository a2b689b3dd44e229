"""v2 lockstep kernel: shared-table batch decode (interpret mode on CPU).

Covers the fused-phase machinery end to end: multi-literal rows, spilled
insert/copy/distance extra bits, fused vs long-form copy tokens, window
sliding/stalls, and the host fallbacks.
"""

import numpy as np
import pytest

import brotli_tpu
from brotli_tpu.encode.sharded import encode_sharded
from brotli_tpu.ops.pallas_decode2 import (
    DONE,
    decode_batch_pallas2,
    preflight_shared,
    resolve_tokens_py,
    run_batch,
)

ALICE = open("/root/reference/test/fixtures/vectors/alice29.txt", "rb").read()


def test_sharded_text_roundtrip():
    data = ALICE[:8192]
    streams = encode_sharded(data, chunk_size=1024)
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == data


def test_python_resolver_matches_kernel_tokens():
    data = ALICE[:2048]
    streams = encode_sharded(data, chunk_size=512)
    batch = preflight_shared(streams)
    assert batch is not None
    tokens, phases = run_batch(batch, interpret=True)
    assert all(phases.reshape(-1)[: len(streams)] == DONE)
    for i in range(len(streams)):
        got = resolve_tokens_py(tokens, i // 128, i % 128, int(batch.mlens[i]))
        assert got == data[i * 512 : (i + 1) * 512]


def test_zeros_overlapping_copies():
    z = bytes(16384)
    streams = encode_sharded(z, chunk_size=4096)
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == z


def test_random_all_literals():
    rng = np.random.default_rng(3)
    r = rng.integers(0, 256, 6000, dtype=np.uint8).tobytes()
    streams = encode_sharded(r, chunk_size=2048)
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == r


def test_long_form_copy_tokens():
    # streaming q5 emits trivial metablocks with copies > 255 -> DIST2 path
    e = brotli_tpu.Encoder(quality=5)
    rep = (b"abcdefgh" * 400)[:3000]
    s = e.update(rep) + e.finish()
    got = decode_batch_pallas2([s], interpret=True)
    assert got[0] == rep


def test_uneven_tail_chunk():
    data = ALICE[: 3 * 1024 + 137]
    streams = encode_sharded(data, chunk_size=1024)
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == data


def test_mixed_table_batch_falls_back():
    # two independently-encoded streams have different tables -> v1/host path
    a = brotli_tpu.encode(ALICE[:700], quality=1)
    b = brotli_tpu.encode(bytes(500), quality=1)
    assert preflight_shared([a, b]) is None
    got = decode_batch_pallas2([a, b], interpret=True)
    assert got[0] == ALICE[:700]
    assert got[1] == bytes(500)


def test_native_resolver_v2_matches_python():
    from brotli_tpu.native import lz_resolve_batch_v2

    data = ALICE[:4096]
    streams = encode_sharded(data, chunk_size=1024)
    batch = preflight_shared(streams)
    tokens, phases = run_batch(batch, interpret=True)
    expected = np.zeros(1024, dtype=np.int64)
    expected[: len(streams)] = batch.mlens[: len(streams)]
    out, lens = lz_resolve_batch_v2(tokens.reshape(tokens.shape[0], -1), expected, 4)
    for i in range(len(streams)):
        assert lens[i] == batch.mlens[i]
        py = resolve_tokens_py(tokens, i // 128, i % 128, int(batch.mlens[i]))
        assert bytes(out[i, : lens[i]]) == py == data[i * 1024 : (i + 1) * 1024]


@pytest.mark.slow
def test_larger_batch_roundtrip():
    data = (ALICE * 2)[: 64 * 2048]
    streams = encode_sharded(data, chunk_size=2048)
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == data


def test_interleaved_groups():
    # 2 independent 1024-stream groups in one kernel (latency-hiding mode)
    data = ALICE[:6144]
    streams = encode_sharded(data, chunk_size=512)
    got = decode_batch_pallas2(streams, interpret=True, groups=2)
    assert b"".join(got) == data


def test_truncated_lane_flags_not_garbage():
    """A mid-body truncated stream must be forced off the fast path.

    The batch word table is zero-padded, so the kernel happily decodes
    zeros past a truncated lane's real content (reference analog: the
    bitreader raises unexpected-EOF, engine.ts:2136-2144).  The widx
    overrun check must flag exactly that lane; intact lanes stay
    bit-exact.
    """
    from brotli_tpu.ops.pallas_decode2 import lane_overran

    data = ALICE[:8192]
    streams = list(encode_sharded(data, chunk_size=1024))
    streams[3] = streams[3][: len(streams[3]) // 2]
    batch = preflight_shared(streams)
    assert batch is not None  # header still parses; only the body is cut
    tokens, phases, widx = run_batch(batch, interpret=True, with_widx=True)
    overran = lane_overran(batch, widx)
    assert overran[3]
    good = [i for i in range(8) if i != 3]
    assert not overran[good].any()
    for i in good:
        got = resolve_tokens_py(tokens, i // 128, i % 128, int(batch.mlens[i]))
        assert got == data[i * 1024 : (i + 1) * 1024]


def test_truncated_lane_library_path_raises():
    # the batch e2e entry must surface the truncation as BrotliError from
    # the per-lane host fallback — never hang, never return padded garbage
    from brotli_tpu import BrotliError
    from brotli_tpu.ops.pallas_decode2 import decode_batch_device_e2e

    data = ALICE[:4096]
    streams = list(encode_sharded(data, chunk_size=1024))
    streams[1] = streams[1][: len(streams[1]) // 2]
    with pytest.raises(BrotliError):
        decode_batch_device_e2e(streams, interpret=True)


def test_bitflip_lane_isolated():
    """Poisoned body bits in one lane never corrupt its neighbours, and
    the kernel always terminates (row budget) — the lane itself either
    flags, overruns, or mis-decodes (brotli has no integrity check; the
    reference mis-decodes too)."""
    data = ALICE[:8192]
    streams = list(encode_sharded(data, chunk_size=1024))
    bad = bytearray(streams[5])
    for off in range(len(bad) // 2, len(bad) // 2 + 16):
        bad[off] ^= 0xA5
    streams[5] = bytes(bad)
    batch = preflight_shared(streams)
    assert batch is not None
    tokens, phases, widx = run_batch(batch, interpret=True, with_widx=True)
    for i in (0, 1, 2, 3, 4, 6, 7):
        got = resolve_tokens_py(tokens, i // 128, i % 128, int(batch.mlens[i]))
        assert got == data[i * 1024 : (i + 1) * 1024]


def test_binned_mixed_table_batches():
    """Streams from two different shared-table encodes decode on the v2
    fast path via per-group table binning (VERDICT round-1 item 4)."""
    import numpy as np

    from brotli_tpu.ops.pallas_decode2 import (
        decode_batch_pallas2,
        preflight_binned,
        preflight_shared,
    )

    a = ALICE[:4096]
    b = bytes(range(256)) * 16  # very different histogram -> other tables
    sa = encode_sharded(a, chunk_size=1024)
    sb = encode_sharded(b, chunk_size=1024)
    mixed = sa + sb
    assert preflight_shared(mixed) is None  # tables differ across the mix
    res = preflight_binned(mixed)
    assert res is not None
    batch, perm = res
    assert batch.groups == 2
    assert sorted(int(p) for p in perm if p >= 0) == list(range(len(mixed)))
    got = decode_batch_pallas2(mixed, interpret=True)
    assert b"".join(got) == a + b
