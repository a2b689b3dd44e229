"""TPU device encoder (ops/device_encode.py): CPU/interpret correctness."""

import numpy as np
import pytest

from brotli_tpu.decode import decode
from brotli_tpu.ops.device_encode import encode_device_batch

ALICE = open("/root/reference/test/fixtures/vectors/alice29.txt", "rb").read()


def roundtrip(data, cs, **kw):
    streams = encode_device_batch(data, chunk_size=cs, interpret=True, **kw)
    assert len(streams) == -(-len(data) // cs)
    got = b"".join(decode(s) for s in streams)
    assert got == data
    return sum(len(s) for s in streams)


def test_text_roundtrip():
    roundtrip(ALICE[: 16 * 1024], 1024)


def test_tail_chunk():
    roundtrip(ALICE[: 3 * 1024 + 257], 1024)


def test_zeros_long_runs():
    n = roundtrip(bytes(16384), 1024)
    assert n < 16384 // 8


def test_periodic_runs():
    roundtrip((b"xyz" * 4000)[:8192], 1024)


def test_random_all_literals():
    rng = np.random.default_rng(11)
    roundtrip(rng.integers(0, 256, 4096, dtype=np.uint8).tobytes(), 1024)


def test_tiny_single_chunk():
    roundtrip(ALICE[:1000], 1024)


def test_hash_stride_2():
    roundtrip(ALICE[:8192], 1024, hash_stride=2)


def test_binary_fixture():
    data = open("/root/reference/bench/fixtures/enc-ttf.bin", "rb").read()[:8192]
    roundtrip(data, 1024)


def test_device_streams_decode_in_lockstep_kernel():
    # device-encoded chunks share tables -> v2 decoder takes them as a batch
    from brotli_tpu.ops.pallas_decode2 import decode_batch_pallas2, preflight_shared

    data = ALICE[:4096]
    streams = encode_device_batch(data, chunk_size=1024, interpret=True)
    assert preflight_shared(streams) is not None
    got = decode_batch_pallas2(streams, interpret=True)
    assert b"".join(got) == data


def test_compression_is_real():
    n = roundtrip(ALICE[: 32 * 1024], 1024)
    assert n < 0.7 * 32 * 1024
