"""Structural probe: which kernel-structure element costs 14us/row?"""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = (8, 128)
ROWS = 2048
BLOCKS = 64
BLOCK_ROWS = ROWS // BLOCKS
NCARRY = 18


def bench(label, *, while_outer=False, reduces=False, dma_in=False,
          dma_out=False, ncarry=4):
    def kernel(a_ref, wt_ref, out_ref, win, staging, sem_in, sem_out):
        st0 = a_ref[:].astype(jnp.uint32)
        carry0 = tuple(st0 + i for i in range(ncarry))

        def row(r, carry):
            c = list(carry)
            c[0] = c[0] ^ (c[1] + jnp.uint32(12345))
            c[1] = c[1] + (c[0] >> 3)
            for i in range(2, ncarry):
                c[i] = c[i] + jnp.uint32(i)
            staging[r] = c[0]
            return tuple(c)

        def block_body_common(blk, filled, carry):
            if reduces:
                minp = jnp.min(jnp.where(carry[0] > 0, carry[1].astype(jnp.int32), 1 << 30))
                do_refill = (minp >= filled - 32) & (filled + 32 <= 960)
            else:
                do_refill = filled < 960
            if dma_in:
                @pl.when(do_refill)
                def _():
                    slot = jax.lax.rem(filled, 64)
                    dma = pltpu.make_async_copy(
                        wt_ref.at[pl.ds(filled, 32)], win.at[pl.ds(slot, 32)], sem_in
                    )
                    dma.start()
                    dma.wait()
            filled = jnp.where(do_refill, filled + 32, filled)
            carry = jax.lax.fori_loop(0, BLOCK_ROWS, row, carry)
            if dma_out:
                dma = pltpu.make_async_copy(
                    staging, out_ref.at[pl.ds(0, BLOCK_ROWS)], sem_out
                )
                dma.start()
                dma.wait()
            return filled, carry

        if while_outer:
            def cond(c):
                blk = c[0]
                if reduces:
                    return (blk < BLOCKS) & jnp.any(c[2][0] < jnp.uint32(0xFFFFFFFF))
                return blk < BLOCKS

            def body(c):
                blk, filled, carry = c
                filled, carry = block_body_common(blk, filled, carry)
                return (blk + 1, filled, carry)

            _, _, carry = jax.lax.while_loop(
                cond, body, (jnp.int32(0), jnp.int32(64), carry0)
            )
        else:
            def body(blk, c):
                filled, carry = c
                filled, carry = block_body_common(blk, filled, carry)
                return (filled, carry)

            _, carry = jax.lax.fori_loop(0, BLOCKS, body, (jnp.int32(64), carry0))

        staging[0] = carry[0]
        dma_f = pltpu.make_async_copy(staging.at[pl.ds(0, 8)], out_ref.at[pl.ds(0, 8)], sem_out)
        dma_f.start()
        dma_f.wait()

    a = np.random.randint(0, 1 << 30, S).astype(np.int32)
    wt = np.random.randint(0, 1 << 30, (1024, 8, 128)).astype(np.uint32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BLOCK_ROWS, 8, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((64, 8, 128), jnp.uint32),
            pltpu.VMEM((BLOCK_ROWS, 8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    ))
    r = f(a, wt); jax.block_until_ready(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter(); r = f(a, wt); jax.block_until_ready(r)
        best = min(best, time.perf_counter() - t0)
    print(f"{label:52s} {best/ROWS*1e9:9.0f} ns/row")


bench("fori outer, 4 carry", ncarry=4)
bench("fori outer, 18 carry", ncarry=18)
bench("while outer, 18 carry", ncarry=18, while_outer=True)
bench("while + reduces, 18 carry", ncarry=18, while_outer=True, reduces=True)
bench("while + reduces + dma_in", ncarry=18, while_outer=True, reduces=True, dma_in=True)
bench("while + reduces + dma_in + dma_out (full)", ncarry=18, while_outer=True,
      reduces=True, dma_in=True, dma_out=True)
