"""On-chip encode config sweep: (table_groups, ctx_trees, block_types,
sample_stride) -> steady-state MB/s + exact ratio, on the bench corpus.

Run WITHOUT JAX_PLATFORMS (axon TPU).
Usage: python tools/sweep_encode_chip.py [n_reps]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
CHUNK = 32768
DEPTH = 4

FIXTURES = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
    "/root/reference/bench/fixtures/enc-ttf.bin",
)

CONFIGS = (
    # (table_groups, ctx_trees, block_types, block_seg, sample_stride)
    (2, 8, 1, 2048, 2048),    # round-3 bench config
    (2, 8, 1, 2048, 256),     # finer lane-clustering sample
    (8, 8, 1, 2048, 256),     # more table groups
    (8, 8, 4, 512, 256),      # + block splitting
)


def main():
    import jax.numpy as jnp

    from brotli_tpu.ops import device_encode as DE

    base = b"".join(open(f, "rb").read() for f in FIXTURES)
    data = (base * 64)[: 1024 * CHUNK]
    pad = CHUNK * DE.B_LANES - len(data)
    arr = np.frombuffer(data + b"\x00" * pad, np.uint8).reshape(
        DE.B_LANES, CHUNK
    )
    data_np = np.concatenate(
        [arr, np.zeros((DE.B_LANES, DE.MATCH_CAP + 4), np.uint8)], axis=1
    )
    nv = np.full(DE.B_LANES, CHUNK, np.int32)
    dev_in = (jnp.asarray(data_np), jnp.asarray(nv))

    for tg, nt, nbt, seg, ss in CONFIGS:
        def start():
            return DE._encode_start(
                data, CHUNK, 1, ss, None, DEPTH, device_input=dev_in,
                lit_ctx=nt > 1, hist_stride=16,
                block_types=nbt, block_seg=seg,
            )

        try:
            t0 = time.time()
            st = start()
            DE._encode_mid(st, 22, False, tg, nt)
            sizes = DE.stream_sizes(st)
            warm_s = time.time() - t0
            ratio = sum(sizes) / len(data)
            t0 = time.time()
            s_cur = start()
            for k in range(REPS):
                s_nxt = start() if k + 1 < REPS else None
                DE._encode_mid(s_cur, 22, False, tg, nt)
                DE.stream_sizes(s_cur)
                s_cur = s_nxt
            dt = (time.time() - t0) / REPS
            print(f"tg={tg} nt={nt} nbt={nbt} seg={seg} ss={ss}: "
                  f"{len(data)/dt/1e6:.1f} MB/s ratio={ratio:.4f} "
                  f"(warm {warm_s:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001 - sweep survives a bad config
            print(f"tg={tg} nt={nt} nbt={nbt} ss={ss}: FAILED {e!r}",
                  flush=True)


if __name__ == "__main__":
    main()
