"""Pallas entropy kernel (interpret mode on CPU) + native LZ resolver."""

import numpy as np
import pytest

from brotli_tpu.encode import encode
from brotli_tpu.ops.device_decode import preflight
from brotli_tpu.ops.pallas_decode import (
    decode_batch_pallas,
    resolve_tokens_py,
    run_pallas_batch,
)

from conftest import VECTORS_DIR

ALICE = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()


def test_pipeline_interpret_mode():
    datas = [ALICE[i * 800 : (i + 1) * 800] for i in range(4)]
    datas.append(b"\x00" * 600)       # degenerate single-symbol stream
    datas.append(bytes(range(256)))   # short ramp
    streams = [encode(d, quality=1) for d in datas]
    outs = decode_batch_pallas(streams, interpret=True)
    for out, d in zip(outs, datas):
        assert out == d


def test_pipeline_fallback_mixed():
    datas = [ALICE[:800], ALICE[800:1600]]
    streams = [encode(datas[0], quality=1), encode(datas[1], quality=11)]
    outs = decode_batch_pallas(streams, interpret=True)
    assert outs[0] == datas[0]
    assert outs[1] == datas[1]


def test_native_resolver_matches_python():
    from brotli_tpu.native import lz_resolve_batch

    datas = [ALICE[i * 700 : (i + 1) * 700] for i in range(3)]
    batch = [preflight(encode(d, quality=1)) for d in datas]
    tokens, phases, mlens = run_pallas_batch(batch, interpret=True)
    expected = np.zeros(tokens.shape[1], dtype=np.int64)
    expected[: len(batch)] = [p.mlen for p in batch]
    out, lens = lz_resolve_batch(tokens, expected, n_threads=2)
    for i, d in enumerate(datas):
        assert lens[i] == len(d)
        assert bytes(out[i, : lens[i]]) == d
        assert resolve_tokens_py(tokens, i, int(mlens[i])) == d


def test_native_resolver_rejects_garbage():
    from brotli_tpu.native import lz_resolve_batch

    # distance token with no prior copy token -> malformed
    tokens = np.full((4, 128), 0xFFFFFFFF, dtype=np.uint32)
    tokens[0, 0] = 0x80000005
    expected = np.zeros(128, dtype=np.int64)
    expected[0] = 10
    out, lens = lz_resolve_batch(tokens, expected, n_threads=1)
    assert lens[0] == -1
