"""Batched lockstep device decoder vs host golden decoder (CPU backend)."""

import pytest

from brotli_tpu.encode import encode
from brotli_tpu.ops.device_decode import decode_batch_device, preflight

from conftest import VECTORS_DIR

ALICE = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()


def test_preflight_eligibility():
    assert preflight(encode(ALICE[:5000], quality=1)) is not None
    # context-modeled stream (multiple trees) -> host path
    assert preflight(encode(ALICE[:20000], quality=5)) is None
    # empty stream -> host path
    assert preflight(encode(b"", quality=1)) is None
    # garbage -> host path (which will raise)
    assert preflight(b"\xff\xff\xff\xff") is None


def test_device_batch_matches_host():
    datas = [ALICE[i * 3000 : (i + 1) * 3000] for i in range(6)]
    datas.append(b"\x00" * 2000)          # degenerate: single-symbol streams
    datas.append(bytes(range(256)) * 8)   # ramp
    streams = [encode(d, quality=1) for d in datas]
    outs = decode_batch_device(streams)
    for out, d in zip(outs, datas):
        assert out == d


def test_device_batch_mixed_fallback():
    """Device-ineligible streams transparently fall back to the host."""
    datas = [ALICE[:2000], ALICE[2000:4000], ALICE[4000:6000]]
    streams = [
        encode(datas[0], quality=1),
        encode(datas[1], quality=11),  # ineligible
        encode(datas[2], quality=2),
    ]
    outs = decode_batch_device(streams)
    for out, d in zip(outs, datas):
        assert out == d
