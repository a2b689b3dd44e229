"""Diag: resolve err-flag histogram + progress spread on the bench config.

Usage: python tools/probe_r4_diag.py [chunk_kb] [H] [W]
Caches the encoded batch in /tmp/r4diag_<chunk>.npz to skip re-encoding.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

chunk = int(sys.argv[1]) * 1024 if len(sys.argv) > 1 else 8192
H = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
W = int(sys.argv[3]) if len(sys.argv) > 3 else 256

from brotli_tpu.encode.sharded import encode_sharded
from brotli_tpu.ops import pallas_decode2 as P2
from brotli_tpu.ops import pallas_resolve as PR

TEXT = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
)
text = b"".join(open(f, "rb").read() for f in TEXT)
data = (text * 64)[: 1024 * chunk]

cache = f"/tmp/r4diag_{chunk}_{H}.npz"
if os.path.exists(cache):
    z = np.load(cache, allow_pickle=True)
    streams = [bytes(s) for s in z["streams"]]
else:
    t0 = time.time()
    streams = encode_sharded(data, chunk_size=chunk, max_distance=H - 16)
    print(f"encoded in {time.time()-t0:.0f}s", flush=True)
    np.savez(cache, streams=np.asarray(
        [np.frombuffer(s, np.uint8) for s in streams], dtype=object))

import jax.numpy as jnp

batch = P2.preflight_shared(streams, groups=1, rate_sort=True)
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
print(f"r_cap={r_cap} n_out={n_out}", flush=True)
rkernel = PR.get_resolve_kernel(r_cap, n_out, H // 4, PR.DEFAULT_DT,
                                1, None, False, W)
scal_j = jnp.asarray(mlens.astype(np.int32).reshape(8, 128))
toks0 = out0[:r_cap]
t0 = time.time()
res4 = np.asarray(rkernel(toks0, scal_j)).reshape(1, n_out + 8, 8, 128)
print(f"resolve ran in {time.time()-t0:.1f}s (incl compile)", flush=True)
errs = res4[:, n_out].reshape(-1)
rl = res4[:, n_out + 1].reshape(-1).astype(np.int64)
rpop = res4[0, n_out + 2, 0, 0]
n = batch.n_streams
vals, cnts = np.unique(errs[:n], return_counts=True)
print("err histogram:", dict(zip(vals.tolist(), cnts.tolist())), flush=True)
need = (mlens[:n] + 3) // 4
print(f"r_lane: min={rl[:n].min()} max={rl[:n].max()} "
      f"need_max={need.max()}; done lanes={(rl[:n] >= need).sum()}/{n}; "
      f"r_pop={rpop} R_tok={r_cap}", flush=True)
outs, _ = PR.unpack_resolved(res4, n_out, mlens)
ok = 0
for slot in range(1024):
    i = int(batch.perm[slot]) if batch.perm is not None else slot
    if 0 <= i < n and errs[slot] == 0:
        ok += int(outs[slot] == data[i * chunk:(i + 1) * chunk])
print(f"bit-exact: {ok}/{n}", flush=True)
