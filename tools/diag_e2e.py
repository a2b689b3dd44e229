"""On-chip diagnostic for the e2e decode path at bench configuration.

Round-2 driver bench measured 818/1024 error lanes at (8 KB chunks, H=4096,
G=1).  Suspected cause: resolve row budget ignored R_tok.  This script runs
the bench-config batch with the round-3 fixes (R_tok-aware budget,
POPS_PER_ROW=2, token-row trim) and reports error flags, r_pop, per-lane
rows, and throughput.

Usage: python tools/diag_e2e.py [chunk_kb] [groups]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

CHUNK = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 8192
GROUPS = int(sys.argv[2]) if len(sys.argv) > 2 else 1
import os
H = int(os.environ.get("DIAG_H", 4096))

TEXT_FIXTURES = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
)


def main():
    import jax.numpy as jnp

    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.ops import pallas_decode2 as P2
    from brotli_tpu.ops import pallas_resolve as PR
    from brotli_tpu.utils import time_device_fn

    text = b"".join(open(f, "rb").read() for f in TEXT_FIXTURES)
    data = (text * 64)[: 1024 * CHUNK * GROUPS]
    t0 = time.time()
    streams = encode_sharded(data, chunk_size=CHUNK, max_distance=H - 16)
    print(f"encode_sharded: {time.time()-t0:.1f}s, "
          f"{sum(map(len, streams))/len(data):.3f} ratio", flush=True)

    t0 = time.time()
    batch = P2.preflight_shared(streams, groups=GROUPS, rate_sort=True)
    preflight_s = time.time() - t0
    print(f"preflight: {preflight_s:.2f}s for {len(streams)} streams", flush=True)
    assert batch is not None

    n_blocks = P2.plan_blocks(batch)
    rows = n_blocks * P2.DEFAULT_BLOCK_ROWS
    kernel = P2.get_kernel(
        batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, False,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                                     batch.dist_t, batch.dx_t, batch.consts,
                                     batch.scal)]
    t0 = time.time()
    out = kernel(*args)
    phases = np.asarray(out[rows]).reshape(-1)
    print(f"entropy kernel: {time.time()-t0:.1f}s (incl compile), "
          f"not-DONE lanes: {int((phases[:batch.n_streams] != P2.DONE).sum())}",
          flush=True)

    t0 = time.time()
    r_cap = P2.used_token_rows(out, n_blocks)
    print(f"token rows: budget {rows} used<= {r_cap} ({time.time()-t0:.1f}s)",
          flush=True)

    toks = jnp.transpose(
        out[:r_cap].reshape(r_cap, GROUPS, 8, 128), (1, 0, 2, 3)
    ).reshape(GROUPS * r_cap, 8, 128)
    mlens = batch.mlens
    max_mlen = int(mlens.max())
    n_out = max(PR.FLUSH, -(-max_mlen // 4 // PR.FLUSH) * PR.FLUSH)
    scal_j = jnp.asarray(mlens.astype(np.int32).reshape(GROUPS * 8, 128))
    rkernel = PR.get_resolve_kernel(r_cap, n_out, H // 4, PR.DEFAULT_DT,
                                    GROUPS, None, False)
    t0 = time.time()
    res = rkernel(toks, scal_j)
    res4 = np.asarray(res).reshape(GROUPS, n_out + 8, 8, 128)
    print(f"resolve kernel: {time.time()-t0:.1f}s (incl compile+fetch)",
          flush=True)
    errs = res4[:, n_out].reshape(-1)[: batch.n_streams]
    r_lane = res4[:, n_out + 1].reshape(-1)[: batch.n_streams]
    r_pop = res4[0, n_out + 2, 0, 0]
    n_err = int((errs != 0).sum())
    print(f"err lanes: {n_err}  flags histogram: "
          f"{np.unique(errs, return_counts=True)}", flush=True)
    print(f"r_pop final: {r_pop} / R_tok {r_cap}", flush=True)
    print(f"r_lane min/max among valid: {r_lane.min()} {r_lane.max()}",
          flush=True)

    # correctness: unpack and compare
    outs, _ = PR.unpack_resolved(res4, n_out, mlens)
    perm = batch.perm
    ok = 0
    bad = 0
    for slot in range(len(mlens)):
        i = slot if perm is None else int(perm[slot])
        if i < 0 or i >= batch.n_streams:
            continue
        if errs[slot] == 0 and phases[slot] == P2.DONE:
            exp = data[i * CHUNK:(i + 1) * CHUNK]
            if outs[slot] == exp:
                ok += 1
            else:
                bad += 1
    print(f"bit-exact lanes: {ok}, MISMATCH lanes: {bad}", flush=True)

    # timing (marginal method)
    def e2e(*a):
        o = kernel(*a)
        t = jnp.transpose(
            o[:r_cap].reshape(r_cap, GROUPS, 8, 128), (1, 0, 2, 3)
        ).reshape(GROUPS * r_cap, 8, 128)
        r = rkernel(t, scal_j)
        return r[0, 0, :8].astype(jnp.int32)

    t_e2e = time_device_fn(e2e, *args, rep=3, samples=3, perturb=False)
    total = int(mlens.sum())
    print(f"e2e: {t_e2e*1e3:.1f} ms for {total/1e6:.1f} MB -> "
          f"{total/t_e2e/1e9:.3f} GB/s", flush=True)


if __name__ == "__main__":
    main()
