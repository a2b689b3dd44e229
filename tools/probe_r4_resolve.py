"""Round-4 chip probe: resolve kernel redesigns, correctness + speed.

Usage: python tools/probe_r4_resolve.py [chunk_kb] [H] [groups] [W]
Set SKIP_SMALL=1 to skip the small-batch library-path gate.
Encoded batches are cached in /tmp (keyed by chunk/H/groups).
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

chunk = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 8
H = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
groups = int(sys.argv[3]) if len(sys.argv) > 3 else 1
W = int(sys.argv[4]) if len(sys.argv) > 4 else None

from brotli_tpu.encode.sharded import encode_sharded
from brotli_tpu.ops import pallas_decode2 as P2
from brotli_tpu.ops import pallas_resolve as PR


TEXT = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
)
text = b"".join(open(f, "rb").read() for f in TEXT)

if not os.environ.get("SKIP_SMALL"):
    # ---- correctness: small batch through the full library path ----
    t0 = time.time()
    small = (text * 2)[: 256 * 2048]
    cache = f"/tmp/r4small_{H}.npz"
    if os.path.exists(cache):
        z = np.load(cache, allow_pickle=True)
        streams = [bytes(s) for s in z["streams"]]
    else:
        streams = encode_sharded(small, chunk_size=2048, max_distance=H - 16)
        np.savez(cache, streams=np.asarray(
            [np.frombuffer(s, np.uint8) for s in streams], dtype=object))
    got = P2.decode_batch_device_e2e(streams, H=H)
    assert b"".join(got) == small, "correctness FAIL"
    print(f"small-batch correctness OK ({time.time()-t0:.0f}s); "
          f"fallbacks: {P2.fallback_stats()}", flush=True)

# ---- timed batch (bench configuration shape) ----
import jax.numpy as jnp

data = (text * 64)[: 1024 * chunk * groups]
cache = f"/tmp/r4big_{chunk}_{H}_{groups}.npz"
if os.path.exists(cache):
    z = np.load(cache, allow_pickle=True)
    streams = [bytes(s) for s in z["streams"]]
else:
    t0 = time.time()
    streams = encode_sharded(data, chunk_size=chunk, max_distance=H - 16)
    print(f"encoded in {time.time()-t0:.0f}s", flush=True)
    np.savez(cache, streams=np.asarray(
        [np.frombuffer(s, np.uint8) for s in streams], dtype=object))
t0 = time.time()
batch = P2.preflight_shared(streams, groups=groups, rate_sort=True)
preflight_s = time.time() - t0
assert batch is not None
n_blocks = P2.plan_blocks(batch)
kernel = P2.get_kernel(
    batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
    batch.npostfix, batch.ndirect, batch.maxbw, False,
    lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
    dx_k=batch.dx_k, groups=batch.groups,
)
mlens = batch.mlens
n_out = max(PR.FLUSH, -(-int(mlens.max()) // 4 // PR.FLUSH) * PR.FLUSH)
args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                                 batch.dist_t, batch.dx_t, batch.consts,
                                 batch.scal)]
out0 = kernel(*args)
r_cap = P2.used_token_rows(out0, n_blocks)
rkernel = PR.get_resolve_kernel(r_cap, n_out, H // 4, PR.DEFAULT_DT,
                                groups, None, False, W)
scal_j = jnp.asarray(mlens.astype(np.int32).reshape(groups * 8, 128))


def e2e(*a):
    out = kernel(*a)
    toks = jnp.transpose(
        out[:r_cap].reshape(r_cap, groups, 8, 128), (1, 0, 2, 3)
    ).reshape(groups * r_cap, 8, 128)
    res = rkernel(toks, scal_j)
    return res[0, 0, :8].astype(jnp.int32)


from brotli_tpu.utils import time_device_fn

total = int(mlens.sum())
t0 = time.time()
t_e2e = time_device_fn(e2e, *args, rep=3, samples=3, perturb=False)
print(f"e2e: {t_e2e*1e3:.1f} ms -> {total/t_e2e/1e9:.3f} GB/s "
      f"(V={H//4}, H={H}, G={groups}, "
      f"chunk={chunk}, {total/1e6:.1f} MB; compile+meas {time.time()-t0:.0f}s;"
      f" preflight {preflight_s*1e3:.0f} ms)", flush=True)

# flag + bit-exactness check on the timed batch
toks0 = jnp.transpose(
    out0[:r_cap].reshape(r_cap, groups, 8, 128), (1, 0, 2, 3)
).reshape(groups * r_cap, 8, 128)
res4 = np.asarray(rkernel(toks0, scal_j)).reshape(groups, n_out + 8, 8, 128)
errs = res4[:, n_out].reshape(-1)
n = batch.n_streams
print(f"err lanes: {(errs[:n] != 0).sum()}/{n}", flush=True)
outs, _ = PR.unpack_resolved(res4, n_out, mlens)
ok = 0
for slot in range(groups * 1024):
    i = int(batch.perm[slot]) if batch.perm is not None else slot
    if 0 <= i < n and errs[slot] == 0:
        ok += int(outs[slot] == data[i * chunk:(i + 1) * chunk])
print(f"bit-exact streams: {ok}/{n}", flush=True)
