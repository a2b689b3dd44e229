"""Parallel layer: mesh-sharded decode (8 virtual CPU devices) + sharded encode."""

import jax
import pytest

from brotli_tpu import decode
from brotli_tpu.encode import encode
from brotli_tpu.encode.api import encode_fragment
from brotli_tpu.parallel import get_mesh, parallel_encode, sharded_decode_batch
from brotli_tpu.parallel.mesh import broadcast_dictionary

from conftest import VECTORS_DIR

ALICE = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()


def test_mesh_has_8_devices():
    assert get_mesh().devices.size == 8


@pytest.mark.parametrize("quality", [1, 5, 11])
def test_parallel_encode_roundtrip(quality):
    enc = parallel_encode(ALICE, quality=quality, shard_size=20000, num_workers=2)
    assert decode(enc) == ALICE


def test_parallel_encode_single_shard_matches_oneshot():
    enc = parallel_encode(ALICE[:30000], quality=5, shard_size=1 << 20)
    assert enc == encode(ALICE[:30000], quality=5, size_hint=30000)


def test_fragment_concat_various_counts():
    data = ALICE[:60000]
    for n in (2, 3, 7):
        size = -(-len(data) // n)
        frags = []
        for i in range(n):
            off = i * size
            shard = data[off : off + size]
            prelude = (data[off - 1], data[off - 2]) if off >= 2 else (0, 0)
            frags.append(
                encode_fragment(
                    shard, quality=5, first=(i == 0), last=(i == n - 1),
                    context_prelude=prelude,
                )
            )
        assert decode(b"".join(frags)) == data


def test_sharded_decode_over_mesh():
    mesh = get_mesh()
    datas = [ALICE[i * 1500 : (i + 1) * 1500] for i in range(16)]
    streams = [encode(d, quality=1) for d in datas]
    outs = sharded_decode_batch(streams, mesh)
    assert all(o == d for o, d in zip(outs, datas))


def test_dictionary_broadcast_replicated():
    mesh = get_mesh()
    d = broadcast_dictionary(mesh)
    assert d.shape == (122784,)
    assert bytes(d[:4].tolist()) == b"time"


def test_multichip_v2_decode_groups():
    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.parallel.mesh import decode_batches_multichip, get_mesh

    data = ALICE[:16384]
    streams = encode_sharded(data, chunk_size=1024)
    mesh = get_mesh(4)
    # group_size=4 -> 4 batches round-robined over the mesh devices
    got = decode_batches_multichip(streams, mesh, interpret=True, group_size=4)
    assert b"".join(got) == data


def test_multichip_v2_mixed_fallback():
    import brotli_tpu
    from brotli_tpu.parallel.mesh import decode_batches_multichip, get_mesh

    # different tables per stream -> groups fail preflight -> fallback paths
    a = brotli_tpu.encode(ALICE[:600], quality=1)
    b = brotli_tpu.encode(bytes(900), quality=1)
    got = decode_batches_multichip([a, b], get_mesh(2), interpret=True,
                                   group_size=2)
    assert got[0] == ALICE[:600]
    assert got[1] == bytes(900)


def test_multichip_decode_is_device_resident(monkeypatch):
    """The multichip decode path must run BOTH kernels on device — the
    host C++ LZ resolver must never be touched (VERDICT r3 #5)."""
    import brotli_tpu.native as native
    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.parallel.mesh import decode_batches_multichip, get_mesh

    def _boom(*a, **k):  # pragma: no cover - tripwire
        raise AssertionError("host LZ resolver used on the flagship path")

    monkeypatch.setattr(native, "lz_resolve_batch_v2", _boom)
    data = ALICE[:16384]
    streams = encode_sharded(data, chunk_size=1024, max_distance=2048 - 16)
    got = decode_batches_multichip(streams, get_mesh(4), interpret=True,
                                   group_size=4)
    assert b"".join(got) == data


def test_multichip_encode_batches():
    from brotli_tpu.decode import decode
    from brotli_tpu.parallel.mesh import encode_batches_multichip, get_mesh

    # > 1 MB so the input splits into two per-device batches (1024 x 1 KB)
    data = (ALICE * 12)[: 1600 * 1024]
    streams = encode_batches_multichip(
        data, get_mesh(2), chunk_size=1024, interpret=True
    )
    assert len(streams) == 1600
    assert b"".join(decode(s) for s in streams) == data


def test_multichip_encode_matches_single_chip_config():
    """Bench-config knobs (chain_depth, context trees, table groups,
    hist_stride) pass through the multichip encode verbatim: per-batch
    output bytes equal the single-chip encode of the same piece."""
    from brotli_tpu.ops.device_encode import encode_device_batch
    from brotli_tpu.parallel.mesh import encode_batches_multichip, get_mesh

    data = (ALICE * 12)[: 1300 * 1024]  # 2 pieces at 1024 lanes x 1 KB
    cfg = dict(chunk_size=1024, max_distance=2048 - 16, chain_depth=3,
               table_groups=2, lit_ctx_trees=2, hist_stride=16)
    multi = encode_batches_multichip(data, get_mesh(2), interpret=True,
                                     **cfg)
    single = []
    for off in range(0, len(data), 1024 * 1024):
        single.extend(
            encode_device_batch(data[off : off + 1024 * 1024],
                                interpret=True, **cfg)
        )
    assert len(multi) == len(single)
    assert multi == single


def test_multihost_sim_two_processes():
    """Two real OS processes x 4 CPU devices through jax.distributed:
    per-host batch ownership, local-mesh device decode, ordered
    cross-host reassembly (SURVEY section 2.3 communication backend;
    VERDICT r4 missing #2).  ~1-2 min on the 1-core host."""
    import json
    import os
    import subprocess
    import sys

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    r = subprocess.run(
        [sys.executable, os.path.join(root, "tools", "multihost_sim.py")],
        capture_output=True, timeout=880, env=env,
    )
    assert r.returncode == 0, r.stdout.decode() + r.stderr.decode()[-1500:]
    report = json.loads(r.stdout.decode().strip().splitlines()[-1])
    assert report["multihost_sim"] == "ok"
    assert all(w["roundtrip_ok"] for w in report["workers"])


def test_v3_multichip_broadcast_dictionary_consumed():
    """VERDICT r4 #7: the replicated dictionary broadcast is CONSUMED by
    the v3 kernels — each device's kernel reads its local shard of the
    broadcast array (no per-call re-staging), and dictionary-word
    streams decode correctly through it."""
    from brotli_tpu.ops.pallas_decode3 import decode_batch_v3_full
    from brotli_tpu.parallel.mesh import (
        broadcast_dictionary_chunks,
        decode_batch_v3_multichip,
    )

    mesh = get_mesh(4)
    bcast = broadcast_dictionary_chunks(mesh)
    # dictionary-heavy content: quickfox is literally static-dict words
    streams = [
        open(f"{VECTORS_DIR}/ukkonooa.compressed", "rb").read(),
        encode(b"the quick brown fox jumps over the lazy dog " * 3,
               quality=11),
    ]
    exp = [decode(s) for s in streams]
    got = decode_batch_v3_multichip(
        streams, mesh, H=1024, interpret=True, group_size=1,
        dict_bcast=bcast,
    )
    assert got == exp
    # single-device path also accepts the shard directly
    shard = bcast.addressable_shards[0].data
    got1 = decode_batch_v3_full([streams[0]], H=1024, interpret=True,
                                dict_dev=shard)
    assert got1 == exp[:1]
