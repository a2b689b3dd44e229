"""Benchmark: v2 lockstep shared-table decode throughput on the real TPU.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

Baseline: the reference's single-core JS decode throughput, ~0.15 GB/s
(BASELINE.md: noto-tc 7 MB in 47 ms on M2 Max).

Methodology:
  * Timed: the v2 Pallas kernel (GROUPS x 1024 streams x 32 KB, real
    mixed text+binary fixture data; the 1024-stream batch is replicated
    across groups to keep host-side prep fast — each group still decodes
    its full compressed input) run REP times inside one jit; the axon
    tunnel's ~33 ms per-invocation round-trip is measured on a trivial op
    and subtracted once.  Output tokens stay in HBM; a tiny checksum
    forces completion.
  * Untimed correctness gate: a smaller batch (1024 x 2 KB, tokens are
    cheap to pull through the ~1 MB/s axon tunnel) runs the FULL pipeline
    (kernel + native LZ resolve) and must match the input bit-exactly.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_GBPS = 0.15  # reference decode, M2 Max single core
CHUNK = 32768
REP = 4
GROUPS = 8   # independent 1024-stream groups interleaved per kernel launch

FIXTURES = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
    "/root/reference/bench/fixtures/enc-ttf.bin",
)


def _base_data() -> bytes:
    base = b""
    for f in FIXTURES:
        base += open(f, "rb").read()
    return base


def main() -> None:
    import jax
    import jax.numpy as jnp

    from brotli_tpu.encode.sharded import encode_sharded
    import brotli_tpu.ops.pallas_decode2 as P2

    base = _base_data()

    # ---- correctness gate (untimed): full pipeline on a small batch ----
    small = (base * 2)[: 1024 * 2048]
    small_streams = encode_sharded(small, chunk_size=2048)
    got = P2.decode_batch_pallas2(small_streams)
    assert b"".join(got) == small, "bench correctness gate failed"

    # ---- timed: big batch, kernel only, RTT-calibrated ----
    data = (base * 32)[: 1024 * CHUNK]
    streams = encode_sharded(data, chunk_size=CHUNK) * GROUPS
    batch = P2.preflight_shared(streams, groups=GROUPS)
    assert batch is not None
    n_blocks = P2.plan_blocks(batch)
    kernel = P2.get_kernel(
        batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, False,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    args = [
        jnp.asarray(x)
        for x in (batch.wt, batch.lit_t, batch.cmd_t, batch.dist_t,
                  batch.dx_t, batch.consts, batch.scal)
    ]

    from brotli_tpu.utils import time_device_fn

    # the kernel is side-effecting (pallas DMA) so it cannot be hoisted out
    # of the repeat loop; perturbation would corrupt the compressed input
    per_decode = time_device_fn(
        lambda *a: kernel(*a)[:8].astype(jnp.int32), *args, rep=REP, samples=3,
        perturb=False,
    )
    total = int(batch.mlens.sum())
    gbps = total / per_decode / 1e9

    print(
        json.dumps(
            {
                "metric": "lockstep_decode_throughput_1chip",
                "value": round(gbps * 1000, 1),
                "unit": "MB/s",
                "vs_baseline": round(gbps / BASELINE_GBPS, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
