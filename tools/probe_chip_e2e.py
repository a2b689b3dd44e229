"""Real-TPU probe: correctness + timing of the e2e decode (entropy+resolve).

Run WITHOUT JAX_PLATFORMS (axon TPU). Usage:
    python tools/probe_chip_e2e.py [chunk_kb] [H] [groups]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

chunk = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 2048
H = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
groups = int(sys.argv[3]) if len(sys.argv) > 3 else 1

from brotli_tpu.encode.sharded import encode_sharded
from brotli_tpu.ops import pallas_decode2 as P2
from brotli_tpu.ops import pallas_resolve as PR

FIX = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
    "/root/reference/bench/fixtures/enc-ttf.bin",
)
base = b"".join(open(f, "rb").read() for f in FIX)

# ---- correctness: small batch, full pipeline, bytes fetched ----
t0 = time.time()
small = (base * 2)[: 256 * 2048]
streams = encode_sharded(small, chunk_size=2048, max_distance=H - 16)
print(f"encoded {len(streams)} x 2KB in {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
got = P2.decode_batch_device_e2e(streams, H=H)
print(f"e2e decode (compile+run+fetch): {time.time()-t0:.1f}s", flush=True)
assert b"".join(got) == small, "correctness FAIL"
print("correctness OK; fallbacks:", P2.fallback_stats(), flush=True)

# ---- timing: full-size batch, bytes stay in HBM ----
import jax
import jax.numpy as jnp

data = (base * 64)[: 1024 * chunk * groups]
t0 = time.time()
streams = encode_sharded(data, chunk_size=chunk, max_distance=H - 16)
print(f"encoded timed batch in {time.time()-t0:.1f}s", flush=True)
batch = P2.preflight_shared(streams, groups=groups, rate_sort=True)
assert batch is not None
n_blocks = P2.plan_blocks(batch)
kernel = P2.get_kernel(
    batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
    batch.npostfix, batch.ndirect, batch.maxbw, False,
    lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
    dx_k=batch.dx_k, groups=batch.groups,
)
rows = n_blocks * P2.DEFAULT_BLOCK_ROWS
mlens = batch.mlens
max_mlen = int(mlens.max())
n_out_rows = max(PR.FLUSH, -(-(-(-max_mlen // 4)) // PR.FLUSH) * PR.FLUSH)
rkernel = PR.get_resolve_kernel(rows, n_out_rows, H // 4, PR.DEFAULT_DT,
                                groups, None, False)
scal = mlens.astype(np.int32).reshape(groups * 8, 128)

args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                                 batch.dist_t, batch.dx_t, batch.consts,
                                 batch.scal)]
scal_j = jnp.asarray(scal)


def entropy_only(*a):
    out = kernel(*a)
    return out[0, 0, :8].astype(jnp.int32)


def e2e(*a):
    out = kernel(*a)
    toks = out[:rows]
    toks_g = jnp.transpose(
        toks.reshape(rows, groups, 8, 128), (1, 0, 2, 3)
    )
    res = rkernel(toks_g, scal_j)
    return res[0, 0, 0, :8].astype(jnp.int32)


from brotli_tpu.utils import time_device_fn

total = int(mlens.sum())
t0 = time.time()
t_ent = time_device_fn(entropy_only, *args, rep=3, samples=3, perturb=False)
print(f"entropy-only: {t_ent*1e3:.1f} ms -> {total/t_ent/1e9:.2f} GB/s "
      f"(compile+meas {time.time()-t0:.0f}s)", flush=True)
t0 = time.time()
t_e2e = time_device_fn(e2e, *args, rep=3, samples=3, perturb=False)
print(f"e2e:          {t_e2e*1e3:.1f} ms -> {total/t_e2e/1e9:.2f} GB/s "
      f"(compile+meas {time.time()-t0:.0f}s)", flush=True)

# resolve status check on the timed batch (flags only, cheap fetch)
out = kernel(*args)
toks_g = jnp.transpose(out[:rows].reshape(rows, groups, 8, 128), (1, 0, 2, 3))
res = rkernel(toks_g, scal_j)
errs = np.asarray(res[:, n_out_rows]).reshape(-1)
rl = np.asarray(res[:, n_out_rows + 1]).reshape(-1)
n = batch.n_streams
print(f"err lanes: {(errs[:n] != 0).sum()}/{n}; "
      f"r_lane min/max {rl[:n].min()}/{rl[:n].max()}", flush=True)
