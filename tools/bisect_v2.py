import time
import numpy as np
import jax, jax.numpy as jnp
from brotli_tpu.encode.sharded import encode_sharded
import brotli_tpu.ops.pallas_decode2 as P2

base = b''
for f in ('/root/reference/test/fixtures/vectors/alice29.txt',
          '/root/reference/test/fixtures/vectors/lcet10.txt',
          '/root/reference/test/fixtures/vectors/plrabn12.txt'):
    base += open(f, 'rb').read()
data = (base * 6)[:1024 * 4096]
streams = encode_sharded(data, chunk_size=4096)
batch = P2.preflight_shared(streams)
N_BLOCKS = 64   # fixed: 2048 rows

args = None

def run(stub, label):
    global args
    kernel = P2.get_kernel(batch.Wpad, 64, 32, N_BLOCKS, batch.npostfix,
                           batch.ndirect, batch.maxbw, False, debug_stub=stub)
    if args is None:
        args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                batch.dist_t, batch.dx_t, batch.consts, batch.scal)]
    @jax.jit
    def run_ck(*a):
        out = kernel(*a)
        return jnp.sum(jax.lax.bitcast_convert_type(out, jnp.int32), dtype=jnp.int32)
    t0 = time.perf_counter(); int(run_ck(*args)); comp = time.perf_counter() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); int(run_ck(*args)); times.append(time.perf_counter() - t0)
    best = min(times)
    print(f'{label:34s} {best*1e3:8.2f} ms  ({best/2048*1e9:7.0f} ns/row)  compile {comp:.0f}s')

def run2(stub, block_rows, n_blocks, label):
    kernel = P2.get_kernel(batch.Wpad, 64, block_rows, n_blocks, batch.npostfix,
                           batch.ndirect, batch.maxbw, False, debug_stub=stub)
    a = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
            batch.dist_t, batch.dx_t, batch.consts, batch.scal)]
    @jax.jit
    def run_ck(*aa):
        out = kernel(*aa)
        return jnp.sum(jax.lax.bitcast_convert_type(out, jnp.int32), dtype=jnp.int32)
    int(run_ck(*a))
    times = []
    for _ in range(3):
        t0 = time.perf_counter(); int(run_ck(*a)); times.append(time.perf_counter() - t0)
    best = min(times); rows = block_rows * n_blocks
    print(f'{label:40s} {best*1e3:8.2f} ms  ({best/rows*1e9:7.0f} ns/row)')

run2(8, 32, 64, 'full')
run2(8+4, 32, 64, 'no CMD')
run2(8+16, 32, 64, 'no LIT')
run2(8+32, 32, 64, 'no DIST')
run2(8+64, 32, 64, 'no EX')
run2(8+4+16+32+64, 32, 64, 'no phases at all')
run2(8+4+16+32+64+1+2, 32, 64, 'skeleton (no phases/fetch/lookup)')
