"""On-chip phase breakdown of the device-encode pipeline (bench metric 3).

Times each stage of the steady-state loop separately: XLA stages dispatch +
sync, device histogram fetch, host table+header build, pack/assembly
dispatch, size fetch.  Usage: python tools/diag_encode.py [depth] [nt]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

DEPTH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NT = int(sys.argv[2]) if len(sys.argv) > 2 else 8
G = 2
CHUNK = 32768


def main():
    import jax.numpy as jnp

    from brotli_tpu.ops import device_encode as DE

    text = b"".join(open(f, "rb").read() for f in (
        "/root/reference/test/fixtures/vectors/alice29.txt",
        "/root/reference/test/fixtures/vectors/lcet10.txt",
        "/root/reference/test/fixtures/vectors/plrabn12.txt"))
    ttf = open("/root/reference/bench/fixtures/enc-ttf.bin", "rb").read()
    data = ((text + ttf) * 64)[: 1024 * CHUNK]
    pad = CHUNK * DE.B_LANES - len(data)
    arr = np.frombuffer(data + b"\x00" * pad, np.uint8).reshape(
        DE.B_LANES, CHUNK)
    data_np = np.concatenate(
        [arr, np.zeros((DE.B_LANES, DE.MATCH_CAP + 4), np.uint8)], axis=1)
    nv = np.full(DE.B_LANES, CHUNK, np.int32)
    dev_in = (jnp.asarray(data_np), jnp.asarray(nv))

    def once(verbose=False):
        t0 = time.time()
        state = DE._encode_start(data, CHUNK, 1, 2048, None, DEPTH,
                                 device_input=dev_in, lit_ctx=NT > 1)
        t_start = time.time() - t0
        # force the stages to finish (sample fetch syncs)
        t0 = time.time()
        _ = np.asarray(state["rec0_sample_dev"])
        t_stages = time.time() - t0
        t0 = time.time()
        DE._encode_mid(state, 22, False, G, NT)
        t_mid = time.time() - t0
        t0 = time.time()
        sizes = DE.stream_sizes(state)
        t_sizes = time.time() - t0
        if verbose:
            print(f"start(dispatch) {t_start*1e3:6.1f} ms")
            print(f"stages sync     {t_stages*1e3:6.1f} ms")
            print(f"mid (hist+tables+pack+asm dispatch) {t_mid*1e3:6.1f} ms")
            print(f"sizes fetch     {t_sizes*1e3:6.1f} ms")
        return sizes

    sizes = once()          # compile everything
    t0 = time.time()
    sizes = once(verbose=True)
    wall = time.time() - t0
    ratio = sizes.sum() / len(data)
    print(f"steady wall {wall*1e3:.0f} ms -> {len(data)/wall/1e6:.1f} MB/s, "
          f"ratio {ratio:.4f}")

    # finer mid breakdown
    state = DE._encode_start(data, CHUNK, 1, 2048, None, DEPTH,
                             device_input=dev_in, lit_ctx=NT > 1)
    rec0_sample = np.asarray(state["rec0_sample_dev"])
    t0 = time.time()
    group_of, modes = DE._cluster_lanes(rec0_sample, G, state["n_chunks"])
    t_cl = time.time() - t0
    signed_mode = np.asarray([modes[g] == 3 for g in group_of], np.int32)
    hist_fn = DE._jitted_group_hist(len(modes), state["hist_stride"])
    t0 = time.time()
    flat = np.asarray(hist_fn(state["rec0"],
                              jnp.asarray(group_of.astype(np.int32)),
                              jnp.asarray(signed_mode)))
    t_hist = time.time() - t0
    t0 = time.time()
    tables = [DE._group_tables_from_hists(*DE._split_group_hist(flat, j), NT)
              for j in range(len(modes))]
    t_tab = time.time() - t0
    t0 = time.time()
    for j, t in enumerate(tables):
        t["mode"] = modes[j]
        DE._header_bits(CHUNK, 22, t)
    t_hdr = time.time() - t0
    print(f"cluster {t_cl*1e3:.1f} ms  hist(fetch) {t_hist*1e3:.1f} ms  "
          f"huffman-build {t_tab*1e3:.1f} ms  headers {t_hdr*1e3:.1f} ms")


if __name__ == "__main__":
    main()
