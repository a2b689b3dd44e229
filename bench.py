"""Benchmark: batched device decode throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's single-core JS decode throughput, ~0.15 GB/s
(BASELINE.md: noto-tc 7 MB in 47 ms on M2 Max).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_GBPS = 0.15  # reference decode, M2 Max single core


def main() -> None:
    from brotli_tpu.encode import encode
    from brotli_tpu.ops.device_decode import preflight, run_device_batch

    # corpus: font + text fixtures sharded into device-eligible q1 streams
    data = (
        open("/root/reference/bench/fixtures/enc-ttf.bin", "rb").read()
        + open("/root/reference/test/fixtures/vectors/alice29.txt", "rb").read()
        + open("/root/reference/test/fixtures/vectors/lcet10.txt", "rb").read()
    )
    CHUNK = 8192
    B = min(96, len(data) // CHUNK)
    shards = [data[i * CHUNK : (i + 1) * CHUNK] for i in range(B)]
    batch = [preflight(encode(s, quality=1)) for s in shards]
    assert all(p is not None for p in batch)
    total_bytes = sum(p.mlen for p in batch)

    outs, lens, errs = run_device_batch(batch)  # compile + warm
    assert not errs.any()

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        outs, lens, errs = run_device_batch(batch)
        times.append(time.perf_counter() - t0)
    best = min(times)
    gbps = total_bytes / best / 1e9

    # correctness gate: the benchmark only counts if output is bit-exact
    ok = all(
        bytes(outs[i, : lens[i]]) == shards[i] for i in range(len(shards))
    )
    assert ok, "bench decode output mismatch"

    print(
        json.dumps(
            {
                "metric": "batched_device_decode_throughput",
                "value": round(gbps * 1000, 3),
                "unit": "MB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
