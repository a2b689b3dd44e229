"""Additive microprobe: find what makes a pallas row cost 14us."""
import time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = (8, 128)
ROWS = 2048
BLOCKS = 8
BLOCK_ROWS = ROWS // BLOCKS


def bench(label, level):
    def kernel(a_ref, out_ref, staging, sem):
        st0 = a_ref[:].astype(jnp.uint32)

        def row(r, carry):
            b0, b1, b2, q = carry
            # level 1: basic elementwise
            b0 = b0 ^ (b1 + jnp.uint32(12345))
            q = (q + 7) & 31

            if level >= 2:  # variable shifts (peek-like), x4
                for _ in range(4):
                    m = (q & 31).astype(jnp.uint32)
                    r_ = (b0 >> m) | jnp.where(
                        m == 0, jnp.uint32(0), b1 << ((32 - m) & 31)
                    )
                    q = q + (r_ & 7).astype(jnp.int32)

            if level >= 3:  # consume-like limb shift
                lsel = q >> 5
                c0 = jnp.where(lsel >= 1, b1, b0)
                c1 = jnp.where(lsel >= 1, b2, b1)
                c2 = jnp.where(lsel >= 1, jnp.uint32(0), b2)
                mq = (q & 31).astype(jnp.uint32)
                b0 = (c0 >> mq) | jnp.where(mq == 0, jnp.uint32(0), c1 << ((32 - mq) & 31))
                b1 = (c1 >> mq) | jnp.where(mq == 0, jnp.uint32(0), c2 << ((32 - mq) & 31))
                b2 = c2 >> mq

            if level >= 4:  # dynamic staging store
                staging[r % BLOCK_ROWS] = b0

            if level >= 5:  # gather
                idx = (b0 & 127).astype(jnp.int32)
                g = jnp.take_along_axis(a_ref[0:8, :], idx, axis=1)
                b1 = b1 + g.astype(jnp.uint32)

            return (b0, b1, b2, q)

        def block(blk, carry):
            carry = jax.lax.fori_loop(
                blk * BLOCK_ROWS, (blk + 1) * BLOCK_ROWS, row, carry
            )
            return carry

        carry = (st0, st0 + 1, st0 + 2, jnp.zeros(S, jnp.int32))
        carry = jax.lax.fori_loop(0, BLOCKS, block, carry)
        out_ref[:] = carry[0]

    a = np.random.randint(0, 1 << 30, S).astype(np.int32)
    f = jax.jit(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(S, jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((BLOCK_ROWS, 8, 128), jnp.uint32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    ))
    r = f(a); jax.block_until_ready(r)
    t0 = time.perf_counter(); r = f(a); jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    print(f"{label:44s} {dt/ROWS*1e9:9.0f} ns/row")


bench("L1 elementwise only", 1)
bench("L2 + 4x variable-shift peeks", 2)
bench("L3 + limb consume", 3)
bench("L4 + dynamic staging store", 4)
bench("L5 + lane gather", 5)
