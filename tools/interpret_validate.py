"""Interpret-mode validation pass for every Pallas kernel module.

Runs a small bit-exact round-trip through each kernel family with
``interpret=True`` on the CPU backend, then records the modules' source
digests in ``.interpret_ok.json``.  The interpret-gate
(`brotli_tpu.utils.interpret_gate`) refuses ``interpret=False`` compiles
for any kernel module whose current source lacks a recorded pass — the
mechanical form of the "never run a new kernel variant on chip before
interpret validation" rule (CLAUDE.md Mosaic pitfalls; a bad lowering
wedges the chip for hours).

Usage:  python tools/interpret_validate.py          (~2-4 min, CPU only)
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["BROTLI_TPU_NO_GATE"] = "1"   # the validator itself may compile

import jax

jax.config.update("jax_platforms", "cpu")   # never touch the chip here

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import brotli_tpu.ops.device_encode as DE
    import brotli_tpu.ops.pallas_decode2 as P2
    import brotli_tpu.ops.pallas_decode3 as P3
    import brotli_tpu.ops.pallas_resolve as PR
    from brotli_tpu.decode import decode as host_decode
    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.utils.interpret_gate import record_validated

    data = (open("/root/reference/test/fixtures/vectors/alice29.txt",
                 "rb").read() * 2)[: 16 * 1024]

    t0 = time.time()
    # v2 entropy + resolve kernels (decode_batch_device_e2e drives both)
    streams = encode_sharded(data, chunk_size=1024, max_distance=2048 - 16)
    got = P2.decode_batch_device_e2e(streams, H=2048, interpret=True)
    assert b"".join(got) == data, "v2 e2e interpret validation failed"
    record_validated(P2.__file__)
    record_validated(PR.__file__)
    print(f"v2 entropy+resolve ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    # device encoder (incl. the Pallas pack kernel), context-modeled
    # output validated through the host decoder AND the v3 fused kernel
    enc = DE.encode_device_batch(
        data, chunk_size=2048, interpret=True, table_groups=2,
        lit_ctx_trees=4,
    )
    assert b"".join(host_decode(s) for s in enc) == data, \
        "device-encode interpret validation failed (host decode)"
    record_validated(DE.__file__)
    print(f"device encode ok ({time.time() - t0:.1f}s)", flush=True)

    t0 = time.time()
    got3 = P3.decode_batch_v3(enc, H=2048, interpret=True)
    assert b"".join(got3) == data, "v3 interpret validation failed"
    record_validated(P3.__file__)
    print(f"v3 fused ok ({time.time() - t0:.1f}s)", flush=True)

    print("all kernel modules validated; digests recorded")


if __name__ == "__main__":
    main()
