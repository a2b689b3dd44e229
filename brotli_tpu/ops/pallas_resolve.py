"""Pallas LZ-resolve kernel: v2 token streams -> decoded bytes, on device.

Round-1's decode fast path stopped at a token stream in HBM and resolved LZ
on a 1-core host (native/lz_resolve.cpp) — the 6 GB/s entropy phase fed a
host phase that cannot keep up, so an honest end-to-end number requires
bytes to be produced in HBM on device (VERDICT round 1, item 1).  This
kernel is that phase 2; together with ops/pallas_decode2.py it makes the
whole decode path (compressed bits -> decoded bytes) device-resident.

Architecture (TPU-native; the reference's byte loop engine.ts:1378-1433 is a
scalar-CPU design with no analog here):

* **History ring + one-hot sweep.**  The last H bytes of every stream live
  in VMEM as (V=H/4, 8, 128) u32, lane = stream, slot = absolute output
  word index mod V.  A per-lane read of words w0,w0+1 is a single sweep
  over the V ring vregs with one compare and two selects per vreg (the
  compare for w0+1 reuses the previous iteration's compare for w0) — the
  measured-cheapest per-lane gather on this hardware (XLA gather: ~0.07 G
  elem/s; tpu.dynamic_gather: lane-shared tables only).  Writes are a
  symmetric scatter sweep.
* **Uniform token intake.**  The entropy kernel produced every lane's
  token for shared row r in lockstep, so resolve re-reads that shared row
  axis: one scalar-indexed read per row from a small (DT, 8, 128) sliding
  VMEM window — O(1), where a per-lane row pointer would cost an O(window)
  one-hot gather over an unbounded window (lanes consume token rows at
  data-dependent rates).  Each lane parks its token in a K-deep register
  FIFO until its byte stream reaches it; the shared row cursor advances
  only when every still-buffering lane has space.
* **Per-lane progress, ordered byte FIFO.**  Each lane independently pulls
  buffered tokens (literals append to an 8-byte FIFO; copies drain into it
  at up to 4 B/row from the ring) and emits one output word per row at its
  own pace — no global emission barrier, so one lane's token starvation or
  long copy drain can throttle but never wedge the others.  Output blocks
  flush to HBM as the minimum live lane row passes them; the flush
  frontier in turn caps how far ahead a lane may run (V - FLUSH rows).
* **Copies with dist < 4** replicate from bytes appended earlier in the
  same row / still in the FIFO; dist in [4, H-16] reads the ring;
  dist > H-16 flags the lane (host fallback).  The device encoder avoids
  far distances by construction (max_distance, ops/device_encode.py).

Output layout: (G, R_out + 8, 8, 128) u32 — group-major so every DMA slice
is contiguous.  Row R_out holds per-lane error flags, R_out+1 per-lane
emitted rows, R_out+2 the final shared token row.  Stream s of group g is
the little-endian bytes of out[g, :, s//128, s%128], length mlens[g*1024+s].
"""

from __future__ import annotations

import functools

import numpy as np

SUB = 8
LANES = 128
NSTREAM = SUB * LANES

DEFAULT_H = 4096          # history window bytes per stream (V = H/4 vregs)
MAX_DEVICE_DISTANCE = DEFAULT_H - 16  # encoder-side cap for device streams
DEFAULT_DT = 64           # token window rows in VMEM (uniform slide)
KBUF = 8                  # per-lane token buffer depth (register FIFO)
PULLS_PER_ROW = 2         # buffer-head consumptions per lane per row
POPS_PER_ROW = 2          # shared token rows consumed per kernel row: must
                          # match the pull rate or token-dense regions (and
                          # the all-pad tail) bound the whole kernel at one
                          # token row per kernel row
FLUSH = 32                # emitted rows per output DMA (must divide V)
STAG_LIMIT = 192          # no-progress rows before declaring skew deadlock

# lane error flags (bitmask in the status row)
ERR_FAR_DIST = 1          # copy distance beyond the ring window
ERR_STARVED = 2           # supply exhausted before mlen bytes
ERR_MALFORMED = 4         # tag-2 distance without a pending tag-1 length


def _build(R_tok: int, n_out_rows: int, V: int, DT: int, groups: int,
           row_budget: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = (SUB, LANES)
    H = V * 4
    HALF_DT = DT // 2
    assert V % FLUSH == 0 and n_out_rows % FLUSH == 0

    def kernel(tok_ref, scal_ref, out_ref, ring, twin, sem_in, sem_out):
        g = pl.program_id(0)
        zeros_u = jnp.zeros(S, jnp.uint32)
        zeros_i = jnp.zeros(S, jnp.int32)

        mlen = scal_ref[pl.ds(g * SUB, SUB), :]
        # flat row layouts (group-major): 4-D refs with a scalar group index
        # in DMA slices are fragile under Mosaic at grid > 1
        tok0 = g * R_tok
        out0 = g * (n_out_rows + 8)

        dma0 = pltpu.make_async_copy(
            tok_ref.at[pl.ds(tok0, DT)], twin, sem_in
        )
        dma0.start()
        dma0.wait()

        def ring_read2(w0):
            """Per-lane ring words ((w0) % V, (w0+1) % V) via one-hot sweep.

            Manually 8x-unrolled fori (Mosaic supports only full/no unroll);
            the w0+1 compare reuses the previous step's w0 compare."""
            q = jax.lax.rem(w0, V)

            def body(i, carry):
                a0, a1, m_prev_i = carry   # carry as i32: Mosaic cannot
                m_prev = m_prev_i > 0      # round-trip i1 loop carries
                for k in range(8):
                    v = 8 * i + k
                    rv = ring[v]
                    m = q == v
                    a0 = jnp.where(m, rv, a0)
                    a1 = jnp.where(m_prev, rv, a1)
                    m_prev = m
                return a0, a1, m_prev.astype(jnp.int32)

            a0, a1, _ = jax.lax.fori_loop(
                0, V // 8, body, (zeros_u, zeros_u, zeros_i)
            )
            a1 = jnp.where(q == V - 1, ring[0], a1)
            return a0, a1

        # One ordered byte FIFO per lane (lo|hi = 8 bytes, oldest in lo LSB):
        # literal pulls append to it, the active copy DRAINS into it every
        # row (decoupled from global emission — this is what makes copy
        # tails < 4 bytes deadlock-free), emission takes 4 bytes from it.
        # `qp` = bytes ever queued; emitted boundary = qp - cnt = 4*r_out.
        #
        # Token intake is UNIFORM: the entropy kernel produced every lane's
        # token for shared row r in lockstep, so resolve re-reads that shared
        # row axis with a single scalar-indexed window access per row (O(1),
        # not an O(window) per-lane gather) and parks each lane's token in a
        # K-deep register FIFO (tbuf) until the lane's byte stream reaches
        # it.  The window never needs to slide backward and r_pop only
        # advances when every still-buffering lane has space.
        state0 = dict(
            fifo_lo=zeros_u, fifo_hi=zeros_u, cnt=zeros_i,
            qp=zeros_i, r_lane=zeros_i,
            cp_dist=zeros_i, cp_rem=zeros_i,
            pend_len=jnp.full(S, -1, jnp.int32),
            err=zeros_i,
            tcnt=zeros_i,
            **{f"tbuf{k}": zeros_u for k in range(KBUF)},
        )
        order = sorted(state0.keys())

        def fifo_append(st, add_u64_lo, n):
            """Append n (<=4) bytes (LSB-first in add) at offset cnt."""
            sh = (8 * st["cnt"]).astype(jnp.uint32)
            lo_add = jnp.where(sh < 32, add_u64_lo << (sh & 31), jnp.uint32(0))
            hi_add = jnp.where(
                sh < 32,
                jnp.where(sh > 0, add_u64_lo >> ((32 - sh) & 31), jnp.uint32(0)),
                add_u64_lo << ((sh - 32) & 31),
            )
            st["fifo_lo"] = st["fifo_lo"] | lo_add
            st["fifo_hi"] = st["fifo_hi"] | hi_add
            st["cnt"] = st["cnt"] + n
            st["qp"] = st["qp"] + n

        def drain(st):
            """Move up to 4 bytes of the active copy into the FIFO."""
            st = dict(st)
            can = (st["cp_rem"] > 0) & (st["cnt"] <= 4) & (st["err"] == 0)
            far = can & (st["cp_dist"] > H - 16)
            st["err"] = st["err"] | jnp.where(far, ERR_FAR_DIST, 0)
            can = can & ~far
            e = jnp.where(can, jnp.minimum(st["cp_rem"], 4), 0)

            src_base = st["qp"] - st["cp_dist"]
            w0 = jnp.maximum(src_base, 0) >> 2
            f0, f1 = ring_read2(w0)
            fsh = ((src_base & 3) * 8).astype(jnp.uint32)
            fw = (f0 >> fsh) | jnp.where(
                fsh == 0, jnp.uint32(0), f1 << ((32 - fsh) & 31)
            )
            # fifo as a byte source for dist < cnt (not yet emitted bytes)
            eb_off = st["cnt"] - st["cp_dist"]   # fifo index of src byte 0
            add = zeros_u
            appended = []
            for j in range(4):
                ring_b = (fw >> (8 * j)) & jnp.uint32(0xFF)
                fi = eb_off + j                  # fifo byte index of source
                fsh2 = (8 * jnp.clip(fi, 0, 7)).astype(jnp.uint32)
                fifo_b = jnp.where(
                    fsh2 < 32,
                    (st["fifo_lo"] >> (fsh2 & 31))
                    | jnp.where(
                        (fsh2 & 31) == 0, jnp.uint32(0),
                        st["fifo_hi"] << ((32 - fsh2) & 31),
                    ),
                    st["fifo_hi"] >> ((fsh2 - 32) & 31),
                ) & jnp.uint32(0xFF)
                b = jnp.where(fi >= 0, fifo_b, ring_b)
                # dist < 4: source inside this row's appended run
                for jj in range(j):
                    b = jnp.where(
                        (j - st["cp_dist"]) == jj, appended[jj], b
                    )
                appended.append(b)
                add = add | (b << (8 * j))
            mask_e = (jnp.uint32(1) << (8 * e).astype(jnp.uint32)) - 1
            mask_e = jnp.where(e >= 4, jnp.uint32(0xFFFFFFFF), mask_e)
            fifo_append(st, add & mask_e, e)
            st["cp_rem"] = st["cp_rem"] - e
            return st

        def pop_uniform(st, r_pop, filled):
            """Buffer every lane's token from shared window row r_pop.

            Returns (st, popped): popped is SCALAR — either all lanes take
            row r_pop into their buffers (pads skipped for free) or none do
            (some still-buffering lane is full, or the window is dry).
            """
            st = dict(st)
            buffering = (st["err"] == 0) & (st["qp"] < mlen)
            # plain boolean algebra: a select over i1 vectors does not lower
            can_pop = (
                jnp.all(~buffering | (st["tcnt"] < KBUF))
                & (r_pop < filled)
                & (r_pop < R_tok)
            )
            t = twin[jax.lax.rem(r_pop, DT)]
            take = can_pop & buffering & (t != 0)
            for k in range(KBUF):
                st[f"tbuf{k}"] = jnp.where(
                    take & (st["tcnt"] == k), t, st[f"tbuf{k}"]
                )
            st["tcnt"] = st["tcnt"] + take.astype(jnp.int32)
            return st, can_pop

        def pull(st):
            """Consume the buffer head when the lane's byte stream needs it:
            literals append to the byte FIFO (order: only when no copy is
            active), copy tokens arm cp_dist/cp_rem."""
            st = dict(st)
            t = st[f"tbuf0"]
            can = (
                (st["tcnt"] > 0) & (st["cp_rem"] == 0)
                & (st["err"] == 0) & (st["qp"] < mlen)
            )
            tag = (t >> 30).astype(jnp.int32)
            is_lit = can & (tag == 0) & (st["cnt"] <= 5)
            is_len = can & (tag == 1)
            is_dist = can & (tag == 2)
            is_fused = can & (tag == 3)

            cnt_t = ((t >> 24) & 3).astype(jnp.int32)
            payload = t & jnp.uint32(0xFFFFFF)
            st2 = dict(st)
            fifo_append(st2, payload, cnt_t)
            for k2 in ("fifo_lo", "fifo_hi", "cnt", "qp"):
                st[k2] = jnp.where(is_lit, st2[k2], st[k2])

            st["pend_len"] = jnp.where(
                is_len, (t & jnp.uint32(0xFFFFFF)).astype(jnp.int32),
                st["pend_len"],
            )
            bad = is_dist & (st["pend_len"] < 0)
            st["err"] = st["err"] | jnp.where(bad, ERR_MALFORMED, 0)
            arm = is_dist & ~bad
            st["cp_dist"] = jnp.where(
                arm, (t & jnp.uint32(0x3FFFFFFF)).astype(jnp.int32),
                jnp.where(
                    is_fused, (t & jnp.uint32(0x3FFFFF)).astype(jnp.int32),
                    st["cp_dist"],
                ),
            )
            st["cp_rem"] = jnp.where(
                arm, st["pend_len"],
                jnp.where(
                    is_fused, ((t >> 22) & 0xFF).astype(jnp.int32),
                    st["cp_rem"],
                ),
            )
            st["pend_len"] = jnp.where(arm, -1, st["pend_len"])

            pulled = is_lit | is_len | is_dist | is_fused
            for k in range(KBUF - 1):
                st[f"tbuf{k}"] = jnp.where(
                    pulled, st[f"tbuf{k + 1}"], st[f"tbuf{k}"]
                )
            st["tcnt"] = st["tcnt"] - pulled.astype(jnp.int32)
            return st

        def emit(st, flush_base):
            """Per-lane emission: write the FIFO's low word to the lane's
            own ring row (scatter sweep) and advance its row counter.

            Per-lane (not lockstep) so no lane's starvation can wedge
            another's progress; the flush frontier caps how far ahead a
            lane may run (ring slots must stay flushable)."""
            st = dict(st)
            P0 = 4 * st["r_lane"]
            done = (st["err"] != 0) | (P0 >= mlen)
            need = jnp.clip(mlen - P0, 0, 4)
            can = (
                ~done & (st["cnt"] >= need)
                & (st["r_lane"] < flush_base + (V - FLUSH))
            )
            word = st["fifo_lo"]
            # fold the emit mask into the integer query (-1 matches no slot):
            # capturing an i1 vector in the loop region trips Mosaic's i8/i1
            # round-trip, an i32 does not.
            q = jnp.where(can, jax.lax.rem(st["r_lane"], V), -1)

            def wbody(i, _):
                for k in range(8):
                    v = 8 * i + k
                    ring[v] = jnp.where(q == v, word, ring[v])
                return 0

            jax.lax.fori_loop(0, V // 8, wbody, 0)
            st["fifo_lo"] = jnp.where(can, st["fifo_hi"], st["fifo_lo"])
            st["fifo_hi"] = jnp.where(can, zeros_u, st["fifo_hi"])
            st["cnt"] = jnp.where(can, jnp.maximum(st["cnt"] - 4, 0), st["cnt"])
            st["r_lane"] = st["r_lane"] + can.astype(jnp.int32)
            return st

        def to_tuple(st):
            return tuple(st[k] for k in order)

        def to_dict(t):
            return dict(zip(order, t))

        def body(carry):
            row, flush_base, r_pop, filled, stag, st_t = carry
            st = to_dict(st_t)
            # progress = any lane emitting anywhere + the token cursor; a
            # frozen MIN row alone is normal while one lane drains a long
            # copy and the rest wait for tokens, so sum, don't min.
            tot_r_prev = jnp.sum(st["r_lane"])
            r_pop_prev = r_pop

            # ---- token window advance (uniform: driven by scalar r_pop) ----
            do_refill = (r_pop >= filled - HALF_DT) & (filled + HALF_DT <= R_tok)

            @pl.when(do_refill)
            def _():
                slot = jax.lax.rem(filled, DT)
                dma = pltpu.make_async_copy(
                    tok_ref.at[pl.ds(tok0 + filled, HALF_DT)],
                    twin.at[pl.ds(slot, HALF_DT)],
                    sem_in,
                )
                dma.start()
                dma.wait()

            filled = jnp.where(do_refill, filled + HALF_DT, filled)

            st = drain(st)
            for _ in range(POPS_PER_ROW):
                st, popped = pop_uniform(st, r_pop, filled)
                r_pop = r_pop + popped.astype(jnp.int32)
            for _ in range(PULLS_PER_ROW):
                st = pull(st)
            st = emit(st, flush_base)

            # token supply is finite: a lane still short of bytes with dry
            # buffers once the window is exhausted can never complete.
            dry = (
                (st["err"] == 0) & (st["qp"] < mlen)
                & (st["tcnt"] == 0) & (st["cp_rem"] == 0)
                & (r_pop >= R_tok)
            )
            st["err"] = st["err"] | jnp.where(dry, ERR_STARVED, 0)

            # ---- flush: one FLUSH-aligned block per row once every live
            # lane has emitted past it (done/err lanes do not hold it up) --
            live = (st["err"] == 0) & (4 * st["r_lane"] < mlen)
            min_r = jnp.min(
                jnp.where(live, st["r_lane"], jnp.int32(1 << 30))
            )

            @pl.when(flush_base + FLUSH <= min_r)
            def _():
                dma = pltpu.make_async_copy(
                    ring.at[pl.ds(jax.lax.rem(flush_base, V), FLUSH)],
                    out_ref.at[pl.ds(out0 + flush_base, FLUSH)],
                    sem_out,
                )
                dma.start()
                dma.wait()

            flush_base = jnp.where(
                flush_base + FLUSH <= min_r, flush_base + FLUSH, flush_base
            )

            # global-stagnation detector: if neither the token cursor nor
            # ANY lane's emission advanced for STAG_LIMIT rows, the batch
            # skew exceeded the ring headroom (V - FLUSH rows) and the
            # remaining lanes can only deadlock — flag them and exit so the
            # caller's host fallback takes over (never a hang).
            stuck = (jnp.sum(st["r_lane"]) == tot_r_prev) & (r_pop == r_pop_prev)
            stag = jnp.where(stuck, stag + 1, 0)
            st["err"] = st["err"] | jnp.where(
                (stag > STAG_LIMIT)
                & (st["err"] == 0) & (4 * st["r_lane"] < mlen),
                ERR_STARVED, 0,
            )
            return row + 1, flush_base, r_pop, filled, stag, to_tuple(st)

        def cond(carry):
            row, flush_base, r_pop, filled, stag, st_t = carry
            st = to_dict(st_t)
            alive = jnp.any((st["err"] == 0) & (4 * st["r_lane"] < mlen))
            return (row < row_budget) & alive

        row, flush_base, r_pop, filled, stag, st_t = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(DT),
             jnp.int32(0), to_tuple(state0)),
        )
        st = to_dict(st_t)

        # lanes that did not reach mlen (row budget exhausted) are truncated
        # — they MUST carry an error flag or the caller would accept
        # zero-padded output as decoded bytes.
        short = (st["err"] == 0) & (4 * st["r_lane"] < mlen)
        st["err"] = st["err"] | jnp.where(short, ERR_STARVED, 0)

        # ---- flush every remaining block (err/done lanes' tails) ----
        n_left = (n_out_rows - flush_base) // FLUSH

        def fbody(i, fb):
            dma = pltpu.make_async_copy(
                ring.at[pl.ds(jax.lax.rem(fb, V), FLUSH)],
                out_ref.at[pl.ds(out0 + fb, FLUSH)],
                sem_out,
            )
            dma.start()
            dma.wait()
            return fb + FLUSH

        flush_base = jax.lax.fori_loop(0, n_left, fbody, flush_base)

        # ---- status tail ----
        ring[0] = st["err"].astype(jnp.uint32)
        ring[1] = st["r_lane"].astype(jnp.uint32)
        ring[2] = jnp.zeros(S, jnp.uint32) + r_pop.astype(jnp.uint32)
        for k in range(3, 8):
            ring[k] = jnp.zeros(S, jnp.uint32)
        dma_tail = pltpu.make_async_copy(
            ring.at[pl.ds(0, 8)],
            out_ref.at[pl.ds(out0 + n_out_rows, 8)],
            sem_out,
        )
        dma_tail.start()
        dma_tail.wait()

    def runner(tokens_g, scal):
        import jax

        return pl.pallas_call(
            kernel,
            grid=(groups,),
            out_shape=jax.ShapeDtypeStruct(
                (groups * (n_out_rows + 8), SUB, LANES), jnp.uint32
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),   # tokens (G,R,8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),  # scal (G*8,128) mlen
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((V, SUB, LANES), jnp.uint32),    # history ring
                pltpu.VMEM((DT, SUB, LANES), jnp.uint32),   # token window
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(tokens_g, scal)

    return runner


@functools.lru_cache(maxsize=8)
def get_resolve_kernel(R_tok: int, n_out_rows: int, V: int = DEFAULT_H // 4,
                       DT: int = DEFAULT_DT, groups: int = 1,
                       row_budget: int | None = None,
                       interpret: bool = False):
    import jax

    if row_budget is None:
        # Hang-guard only — the while_loop exits as soon as every lane is
        # done, so a generous budget costs nothing in the good case.  It
        # must cover a full traversal of the token rows (the shared cursor
        # r_pop advances <= POPS_PER_ROW per kernel row; round-2's
        # 3*n_out_rows guard ignored R_tok and truncated every lane whose
        # tokens sat beyond it — the 818-lane bench failure) plus the
        # emission rows with stall margin.
        row_budget = -(-R_tok // POPS_PER_ROW) + 3 * n_out_rows + 4 * DT
    return jax.jit(
        _build(R_tok, n_out_rows, V, DT, groups, row_budget, interpret)
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def resolve_tokens_device(tokens, mlens, *, H: int = DEFAULT_H,
                          DT: int | None = None, interpret: bool = False,
                          row_budget: int | None = None):
    """Resolve (R, G*8, 128) u32 entropy tokens to bytes on device.

    `mlens` has G*1024 entries (decoded size per stream, 0 for pad lanes).
    Returns (out device array (G, R_out+8, 8, 128) u32, n_out_rows).
    Truncated/malformed/too-far lanes carry error flags in the status row;
    a degraded configuration falls back to host decode, never to silent
    corruption.
    """
    import jax.numpy as jnp

    import jax.numpy as _jnp

    R, GS, _ = tokens.shape
    G = GS // SUB
    V = H // 4
    if DT is None:
        DT = DEFAULT_DT
    mlens = np.asarray(mlens, dtype=np.int64).reshape(-1)
    assert mlens.size == G * NSTREAM
    # the window refills in DT/2-row steps: a tail shorter than DT/2 would
    # never be loaded (ADVICE r2) — pad with zero rows (PAD tokens, free)
    pad_rows = (-R) % (DT // 2)
    if R < DT:
        pad_rows = DT - R
    if pad_rows:
        tokens = _jnp.concatenate(
            [tokens, _jnp.zeros((pad_rows, GS, LANES), tokens.dtype)], axis=0
        )
        R += pad_rows
    max_mlen = int(mlens.max()) if mlens.size else 0
    n_out_rows = max(FLUSH, _round_up(-(-max_mlen // 4), FLUSH))
    tokens_g = jnp.transpose(
        jnp.asarray(tokens).reshape(R, G, SUB, LANES), (1, 0, 2, 3)
    ).reshape(G * R, SUB, LANES)
    scal = mlens.astype(np.int32).reshape(G * SUB, LANES)
    kernel = get_resolve_kernel(
        R, n_out_rows, V, DT, G, row_budget, interpret
    )
    out = kernel(tokens_g, jnp.asarray(scal))
    # free reshape back to the group-major 4-D view callers index
    return out.reshape(G, n_out_rows + 8, SUB, LANES), n_out_rows


def unpack_resolved(out_np: np.ndarray, n_out_rows: int,
                    mlens) -> tuple[list[bytes], np.ndarray]:
    """(G, R_out+8, 8, 128) u32 host array -> per-stream bytes + err flags."""
    G = out_np.shape[0]
    mlens = np.asarray(mlens).reshape(-1)
    errs = out_np[:, n_out_rows].reshape(G * NSTREAM)
    words = out_np[:, :n_out_rows]                    # (G, R, 8, 128)
    by_stream = np.transpose(words, (0, 2, 3, 1)).reshape(G * NSTREAM, -1)
    raw = np.ascontiguousarray(by_stream).astype("<u4").view(np.uint8)
    raw = raw.reshape(G * NSTREAM, -1)
    outs = [bytes(raw[i, : mlens[i]]) for i in range(len(mlens))]
    return outs, errs
