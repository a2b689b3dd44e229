"""Pallas LZ-resolve kernel: v2 token streams -> decoded bytes, on device.

Round-1's decode fast path stopped at a token stream in HBM and resolved LZ
on a 1-core host (native/lz_resolve.cpp) — the 6 GB/s entropy phase fed a
host phase that cannot keep up, so an honest end-to-end number requires
bytes to be produced in HBM on device (VERDICT round 1, item 1).  This
kernel is that phase 2; together with ops/pallas_decode2.py it makes the
whole decode path (compressed bits -> decoded bytes) device-resident.

Architecture (TPU-native; the reference's byte loop engine.ts:1378-1433 is a
scalar-CPU design with no analog here):

* **Uniform output rows.**  All 1024 streams of a group advance in lockstep
  through OUTPUT byte space: row r emits bytes 4r..4r+3 of every stream as
  one u32 vreg.  Writes therefore use a *scalar* ring index (cheap); only
  READS (copy sources) are per-lane dynamic.
* **History ring + one-hot sweep.**  The last H bytes of every stream live
  in VMEM as (V=H/4, 8, 128) u32, lane = stream.  A per-lane read of words
  w0,w0+1 is a single sweep over the V ring vregs with one compare and two
  selects per vreg (the compare for w0+1 reuses the previous iteration's
  compare for w0) — the measured-cheapest per-lane gather on this hardware
  (XLA gather: ~0.07 G elem/s; tpu.dynamic_gather: lane-shared tables only).
* **Global stall rows.**  A row commits only when every live lane can fill
  its word (literal FIFO + at most one active copy).  Lanes that cannot
  (copy->copy transitions, token-pad runs) force a stall row in which all
  lanes still PREFETCH (token pops), so the next row usually commits.
* **Sliding token window.**  Entropy-kernel token rows stream through a
  (DT, 8, 128) VMEM window by async DMA, exactly like the decode kernel's
  bitstream window; up to POPS_PER_ROW tokens are consumed per lane per row
  (pad tokens from entropy stall rows are skipped by the same pops).
* **Copies with dist < 4** replicate from bytes assembled earlier in the
  same row (the doubling trick in byte form); dist in [4, H-8] reads the
  ring; dist > H-8 flags the lane (host fallback).  The device encoder
  avoids far distances by construction (max_distance, ops/device_encode.py).

Output layout: (G, R_out + 8, 8, 128) u32 — group-major so every DMA slice
is contiguous.  Row R_out holds per-lane error flags, R_out+1 the emitted
row count, R_out+2 the final token index.  Stream s of group g is the
little-endian bytes of out[g, :, s//128, s%128], length mlens[g*1024+s].
"""

from __future__ import annotations

import functools

import numpy as np

SUB = 8
LANES = 128
NSTREAM = SUB * LANES

DEFAULT_H = 4096          # history window bytes per stream (V = H/4 vregs)
MAX_DEVICE_DISTANCE = DEFAULT_H - 8   # encoder-side cap for device streams
DEFAULT_DT = 32           # token window rows in VMEM
POPS_PER_ROW = 3          # token pops per lane per row
FLUSH = 32                # emitted rows per output DMA (must divide V)

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

        dma0 = pltpu.make_async_copy(tok_ref.at[g, pl.ds(0, DT)], twin, sem_in)
        dma0.start()
        dma0.wait()

        def ring_read2(w0):
            """Per-lane ring words ((w0) % V, (w0+1) % V) via one-hot sweep."""
            q = jax.lax.rem(w0, V)

            def body(v, carry):
                a0, a1, m_prev = carry
                m = q == v
                a0 = jnp.where(m, ring[v], a0)
                a1 = jnp.where(m_prev, ring[v], a1)
                return a0, a1, m

            a0, a1, _ = jax.lax.fori_loop(
                0, V, body, (zeros_u, zeros_u, jnp.zeros(S, jnp.bool_)),
                unroll=8,
            )
            a1 = jnp.where(q == V - 1, ring[0], a1)
            return a0, a1

        def tok_read(idx, filled):
            """Per-lane token at row idx from the sliding window."""
            ok = idx < filled
            p_rel = jax.lax.rem(idx, DT)

            def body(d, acc):
                return jnp.where(p_rel == d, twin[d], acc)

            acc = jax.lax.fori_loop(0, DT, body, zeros_u, unroll=8)
            return jnp.where(ok, acc, jnp.uint32(0)), ok

        # One ordered byte FIFO per lane (lo|hi = 8 bytes, oldest in lo LSB):
        # literal pops append to it, the active copy DRAINS into it every
        # row (decoupled from global emission — this is what makes copy
        # tails < 4 bytes deadlock-free), emission takes 4 bytes from it.
        # `qp` = bytes ever queued; emitted boundary = qp - cnt = 4*r_out.
        state0 = dict(
            tok_idx=zeros_i,
            fifo_lo=zeros_u, fifo_hi=zeros_u, cnt=zeros_i,
            qp=zeros_i,
            cp_dist=zeros_i, cp_rem=zeros_i,
            pend_len=jnp.full(S, -1, jnp.int32),
            err=zeros_i,
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

        def pops(st, filled):
            """Up to POPS_PER_ROW token pops per lane (always committed)."""
            st = dict(st)
            for _ in range(POPS_PER_ROW):
                t, ok = tok_read(st["tok_idx"], filled)
                alive = ok & (st["err"] == 0)
                is_pad = alive & (t == 0)        # pads skip even mid-copy
                # order: the FIFO must hold only bytes that precede the
                # active copy, so data pops wait for cp_rem == 0
                can = alive & (st["cp_rem"] == 0) & (st["cnt"] <= 5)
                tag = (t >> 30).astype(jnp.int32)
                is_lit = can & (tag == 0) & (t != 0)
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

                consumed = is_pad | is_lit | is_len | is_dist | is_fused
                st["tok_idx"] = st["tok_idx"] + consumed.astype(jnp.int32)
            return st

        def row_work(st, r_out):
            """Emission decision for row r_out: word = FIFO low 4 bytes."""
            P0 = 4 * r_out
            done = (st["err"] != 0) | (P0 >= mlen)
            need = jnp.clip(mlen - P0, 0, 4)
            can_emit = done | (st["cnt"] >= need)
            word = st["fifo_lo"]
            new = dict(
                fifo_lo=st["fifo_hi"],
                fifo_hi=zeros_u,
                cnt=jnp.maximum(st["cnt"] - 4, 0),
            )
            return word, can_emit, done, new

        def to_tuple(st):
            return tuple(st[k] for k in order)

        def to_dict(t):
            return dict(zip(order, t))

        def body(carry):
            row, r_out, filled, stall_run, st_t = carry
            st = to_dict(st_t)

            # ---- token window advance ----
            active = (st["err"] == 0) & (4 * r_out < mlen)
            min_tok = jnp.min(
                jnp.where(active, st["tok_idx"], jnp.int32(1 << 30))
            )
            do_refill = (min_tok >= filled - HALF_DT) & (filled + HALF_DT <= R_tok)

            @pl.when(do_refill)
            def _():
                slot = jax.lax.rem(filled, DT)
                dma = pltpu.make_async_copy(
                    tok_ref.at[g, pl.ds(filled, HALF_DT)],
                    twin.at[pl.ds(slot, HALF_DT)],
                    sem_in,
                )
                dma.start()
                dma.wait()

            filled = jnp.where(do_refill, filled + HALF_DT, filled)

            st = drain(st)
            st = pops(st, filled)
            word, can_emit, done, new = row_work(st, r_out)
            live = ~done
            emit = jnp.all(jnp.where(live, can_emit, True))

            # starvation: a stall run longer than any legitimate prep phase
            # means some lane can never fill — flag it so decode falls back.
            stall_run = jnp.where(emit, 0, stall_run + 1)
            starved = stall_run > DT + 8 * POPS_PER_ROW
            st["err"] = st["err"] | jnp.where(
                starved & live & ~can_emit, ERR_STARVED, 0
            )

            @pl.when(emit)
            def _():
                ring[jax.lax.rem(r_out, V)] = word

            commit = emit & live
            for k2 in ("fifo_lo", "fifo_hi", "cnt"):
                st[k2] = jnp.where(commit, new[k2], st[k2])

            r_next = r_out + jnp.where(emit, 1, 0)

            @pl.when(emit & (jax.lax.rem(r_next, FLUSH) == 0))
            def _():
                start = r_next - FLUSH
                dma = pltpu.make_async_copy(
                    ring.at[pl.ds(jax.lax.rem(start, V), FLUSH)],
                    out_ref.at[g, pl.ds(start, FLUSH)],
                    sem_out,
                )
                dma.start()
                dma.wait()

            return row + 1, r_next, filled, stall_run, to_tuple(st)

        def cond(carry):
            row, r_out, filled, stall_run, st_t = carry
            st = to_dict(st_t)
            alive = jnp.any((st["err"] == 0) & (4 * r_out < mlen))
            return (row < row_budget) & (r_out < n_out_rows) & alive

        row, r_out, filled, stall_run, st_t = jax.lax.while_loop(
            cond, body,
            (jnp.int32(0), jnp.int32(0), jnp.int32(DT),
             jnp.int32(0), to_tuple(state0)),
        )
        st = to_dict(st_t)

        # lanes that did not reach mlen (row budget exhausted, window
        # starvation) are truncated — they MUST carry an error flag or the
        # caller would accept zero-padded output as decoded bytes.
        short = (st["err"] == 0) & (4 * r_out < mlen)
        st["err"] = st["err"] | jnp.where(short, ERR_STARVED, 0)

        # ---- final partial flush (r_out not FLUSH-aligned) ----
        part = jax.lax.rem(r_out, FLUSH)

        @pl.when(part > 0)
        def _():
            start = r_out - part
            dma = pltpu.make_async_copy(
                ring.at[pl.ds(jax.lax.rem(start, V), FLUSH)],
                out_ref.at[g, pl.ds(start, FLUSH)],
                sem_out,
            )
            dma.start()
            dma.wait()

        # ---- status tail ----
        ring[0] = st["err"].astype(jnp.uint32)
        ring[1] = jnp.zeros(S, jnp.uint32) + r_out.astype(jnp.uint32)
        ring[2] = st["tok_idx"].astype(jnp.uint32)
        for k in range(3, 8):
            ring[k] = jnp.zeros(S, jnp.uint32)
        dma_tail = pltpu.make_async_copy(
            ring.at[pl.ds(0, 8)],
            out_ref.at[g, pl.ds(n_out_rows, 8)],
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
                (groups, n_out_rows + 8, SUB, LANES), jnp.uint32
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
        row_budget = 3 * n_out_rows + 4 * DT
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

    **Token residency constraint.**  Lanes consume token rows at different
    rates relative to their (lockstep) output position, so a small sliding
    window can deadlock: a lane mid-copy pins the window's minimum while
    another lane has exhausted it.  With DT >= R the whole token array is
    VMEM-resident and the window never slides — the default (DT=None) does
    exactly that.  A smaller DT is only safe when the inter-lane divergence
    of token-row consumption is known to stay under DT/2 (tiny streams,
    single-lane tests); truncated lanes are flagged ERR_STARVED either way,
    so a wrong DT degrades to host fallback, never to silent corruption.
    The fused decode3 kernel removes this constraint by resolving inside
    the entropy pass.
    """
    import jax.numpy as jnp

    R, GS, _ = tokens.shape
    G = GS // SUB
    V = H // 4
    if DT is None:
        DT = R
    mlens = np.asarray(mlens, dtype=np.int64).reshape(-1)
    assert mlens.size == G * NSTREAM
    assert R >= DT, f"token rows {R} < window {DT}"
    max_mlen = int(mlens.max()) if mlens.size else 0
    n_out_rows = max(FLUSH, _round_up(-(-max_mlen // 4), FLUSH))
    tokens_g = jnp.transpose(
        jnp.asarray(tokens).reshape(R, G, SUB, LANES), (1, 0, 2, 3)
    )
    scal = mlens.astype(np.int32).reshape(G * SUB, LANES)
    kernel = get_resolve_kernel(
        R, n_out_rows, V, DT, G, row_budget, interpret
    )
    out = kernel(tokens_g, jnp.asarray(scal))
    return out, n_out_rows


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
