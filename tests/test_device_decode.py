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


def test_native_preflight_matches_python():
    """The C++ batch header parser must be bit-identical to the Python
    preflight on eligible, ineligible, and malformed streams."""
    import numpy as np

    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.ops.device_decode import preflight, preflight_many

    data = open(f"{VECTORS_DIR}/alice29.txt", "rb").read()[: 48 * 1024]
    streams = encode_sharded(data, chunk_size=2048, max_distance=2032)
    streams += [
        b"\x1b\x76\x00",                                   # truncated
        open(f"{VECTORS_DIR}/quickfox.compressed", "rb").read(),  # multi-mb
        open(f"{VECTORS_DIR}/alice29.txt.compressed", "rb").read(),
    ]
    native = preflight_many(streams)
    for i, s in enumerate(streams):
        py = preflight(s)
        nv = native[i]
        assert (nv is None) == (py is None), i
        if py is None:
            continue
        assert (nv.mlen, nv.cmd_start_bit, nv.npostfix, nv.ndirect,
                nv.max_backward) == (py.mlen, py.cmd_start_bit, py.npostfix,
                                     py.ndirect, py.max_backward), i
        for a, b in ((nv.lit_table, py.lit_table),
                     (nv.cmd_table, py.cmd_table),
                     (nv.dist_table, py.dist_table)):
            assert np.array_equal(a, b), i
        assert np.array_equal(nv.dist_extra[:544],
                              np.asarray(py.dist_extra)[:544]), i
        assert np.array_equal(nv.dist_offset[:544],
                              np.asarray(py.dist_offset)[:544]), i


def test_profile_e2e_decode_report():
    """The per-phase profiler runs the real staged pipeline: phases cover
    host preflight + both kernels, the summary's throughput/error fields
    are consistent, and the report renders one line per phase."""
    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.utils import phase_report, profile_e2e_decode

    data = (b"profiling the lockstep pipeline " * 2048)[: 32 * 512]
    streams = encode_sharded(data, chunk_size=512, max_distance=496)
    phases, summary = profile_e2e_decode(streams, H=512, rep=1,
                                         interpret=True)
    names = [p.name for p in phases]
    assert names == ["preflight (host)", "entropy kernel",
                     "resolve kernel", "e2e device chain"]
    assert all(p.seconds > 0 for p in phases)
    assert summary["err_lanes"] == 0
    assert summary["bytes"] == len(data)
    assert summary["e2e_mbps"] > 0
    assert 0 < summary["token_rows_used"] <= summary["token_row_budget"]
    report = phase_report(phases, total_bytes=summary["bytes"])
    assert len(report.splitlines()) == len(phases)
    assert "err_lanes=0" in report
