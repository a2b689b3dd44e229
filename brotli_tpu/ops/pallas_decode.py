"""Pallas lockstep entropy-decode kernel (phase 1 of device decode).

TPU-native split of Brotli decode (SURVEY.md section 7):
  phase 1 (this kernel): the bit-serial work — Huffman symbol decode,
    length/distance reconstruction, distance-ring maintenance — runs in SIMD
    lockstep, one stream per lane, all state in vector registers, tables in
    VMEM. Emits a per-lane TOKEN stream (literal bytes / copy lengths /
    distances) in globally synchronized rows, so every store is a dense
    (1, L) row write and every HBM transfer is a contiguous block DMA —
    no per-lane scatter anywhere.
  phase 2 (ops.lz / native resolver): LZ resolution of the token streams —
    pure memory bandwidth, no bit twiddling.

Per-lane table lookups are one-hot compare+reduce over (L, T) VMEM tiles
(~0.25 us per 1K-entry table at L=256 on v5e); Mosaic has no per-lane vector
gather for this shape. Phases are split so each iteration consumes <= 24
bits, which a single masked 32-bit refill per iteration provably keeps ahead
of (read-time avail >= 32).

Token format (u32), resolved sequentially per lane:
  0x00000000-0x000000FF literal byte
  0x40000000 | copy_len  copy token (next non-pad token is its distance)
  0x80000000 | distance  distance token
  0xFFFFFFFF             pad (lane idle this row)
"""

from __future__ import annotations

import functools

import numpy as np

from ..constants import (
    COPY_LENGTH_N_BITS,
    COPY_LENGTH_OFFSET,
    DISTANCE_SHORT_CODE_DELTA,
    DISTANCE_SHORT_CODE_INDEX,
    INSERT_LENGTH_N_BITS,
    INSERT_LENGTH_OFFSET,
)

# phases
INIT, CMD_SYM, CMD_INS, CMD_CP, LIT, DIST_SYM, DIST_EXTRA, DONE, ERR = range(9)

TOKEN_PAD = 0xFFFFFFFF
TOKEN_COPY = 0x40000000
TOKEN_DIST = 0x80000000

LIT_TSIZE = 640    # literal table, padded (max 630)
CMD_TSIZE = 1152   # command table, padded (max 1080)
DIST_TSIZE = 1024  # distance table, padded (max 920)
BLOCK_ROWS = 256   # token rows per HBM DMA block


def _build(L: int, W: int, n_blocks: int, interpret: bool):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def lut24(table, code):
        """Tiny shared-constant lookup: (T,) x (L,) -> (L,)."""
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, table.shape[0]), 1)
        return jnp.sum(jnp.where(iota == code[:, None], table[None, :], 0), axis=1)

    def onehot(tab, idx):
        """Per-lane table lookup: tab (L, T), idx (L,) -> (L,) int32."""
        T = tab.shape[1]
        iota = jax.lax.broadcasted_iota(jnp.int32, (L, T), 1)
        return jnp.sum(jnp.where(iota == idx[:, None], tab, 0), axis=1)

    def read_symbol(tab_full, v15, mask):
        """Two-level canonical-table decode from 15 peeked bits."""
        root_idx = (v15 & 0xFF).astype(jnp.int32)
        e0 = onehot(tab_full[:, :256], jnp.where(mask, root_idx, 0))
        bits0 = e0 >> 16
        need_sub = mask & (bits0 > 8)
        sub_mask = (
            (jnp.uint32(1) << jnp.clip(bits0, 0, 15).astype(jnp.uint32)) - 1
        )
        sub_idx = root_idx + (e0 & 0xFFFF) + ((v15 & sub_mask) >> 8).astype(jnp.int32)
        e1 = onehot(tab_full, jnp.where(need_sub, sub_idx, 0))
        sym = jnp.where(need_sub, e1 & 0xFFFF, e0 & 0xFFFF)
        nbits = jnp.where(need_sub, (e1 >> 16) + 8, bits0)
        return sym, nbits

    def kernel(words_ref, lit_ref, cmd_ref, dist_ref, scal_ref, consts_ref,
               out_ref, staging, sem):
        word_iota = jax.lax.broadcasted_iota(jnp.int32, (L, W), 1)
        lanes_u32 = jnp.zeros((L,), jnp.uint32)
        # full 128-wide rows (lane-aligned); codes are < 24/16 so the padded
        # tail never matches in the one-hot compare
        INS_NB = consts_ref[0, :]
        INS_OFF = consts_ref[1, :]
        CP_NB = consts_ref[2, :]
        CP_OFF = consts_ref[3, :]
        SHORT_IDX = consts_ref[4, :]
        SHORT_DELTA = consts_ref[5, :]

        start_bit = scal_ref[0, :]
        mlen = scal_ref[1, :]
        maxbw = scal_ref[2, :]
        npostfix = scal_ref[3, :]
        ndirect = scal_ref[4, :]

        def fetch_words(widx):
            """words[lane, widx[lane]] via one-hot over (L, W).

            Mosaic can't reduce unsigned ints; reduce as int32 and bitcast
            (one-hot selection -> exactly one non-zero, no overflow issue).
            """
            sel = word_iota == widx[:, None]
            w_i32 = jax.lax.bitcast_convert_type(words_ref[:], jnp.int32)
            picked = jnp.sum(jnp.where(sel, w_i32, 0), axis=1)
            return jax.lax.bitcast_convert_type(picked, jnp.uint32)

        init = dict(
            phase=jnp.where(mlen > 0, INIT, DONE),  # dummy pad lanes stay idle
            widx=(start_bit >> 5).astype(jnp.int32),
            buf_lo=lanes_u32,
            buf_hi=lanes_u32,
            avail=jnp.zeros((L,), jnp.int32),
            mbl=mlen,
            lit_rem=jnp.zeros((L,), jnp.int32),
            ins_code=jnp.zeros((L,), jnp.int32),
            cp_code=jnp.zeros((L,), jnp.int32),
            implicit=jnp.zeros((L,), jnp.int32),  # bool carried as i32 (Mosaic i1 vectors unsupported)
            copy_len=jnp.zeros((L,), jnp.int32),
            dcode=jnp.zeros((L,), jnp.int32),
            r0=jnp.full((L,), 4, jnp.int32),
            r1=jnp.full((L,), 11, jnp.int32),
            r2=jnp.full((L,), 15, jnp.int32),
            r3=jnp.full((L,), 16, jnp.int32),
        )
        order = sorted(init.keys())

        def row_step(state):
            s = dict(state)
            running = (s["phase"] != DONE) & (s["phase"] != ERR)

            # ---- masked refill: one 32-bit word when avail <= 32 ----
            need = running & (s["avail"] <= 32)
            w = fetch_words(jnp.where(need, s["widx"], 0))
            av = s["avail"].astype(jnp.uint32)
            lo_add = jnp.where(av < 32, w << av, jnp.uint32(0))
            hi_shift = (32 - s["avail"]).astype(jnp.uint32) & 31
            hi_add = jnp.where(
                s["avail"] == 0, jnp.uint32(0),
                jnp.where(s["avail"] < 32, w >> hi_shift, w),
            )
            s["buf_lo"] = jnp.where(need, s["buf_lo"] | lo_add, s["buf_lo"])
            s["buf_hi"] = jnp.where(need, s["buf_hi"] | hi_add, s["buf_hi"])
            s["avail"] = jnp.where(need, s["avail"] + 32, s["avail"])
            s["widx"] = jnp.where(need, s["widx"] + 1, s["widx"])

            phase = s["phase"]
            peek15 = s["buf_lo"] & 0x7FFF

            def consume(nbits_i32, do_it):
                n = jnp.where(do_it, nbits_i32, 0).astype(jnp.uint32) & 63
                lo = jnp.where(
                    n == 0, s["buf_lo"],
                    (s["buf_lo"] >> n) | jnp.where(
                        n == 0, jnp.uint32(0), s["buf_hi"] << ((32 - n) & 31)
                    ),
                )
                hi = jnp.where(n == 0, s["buf_hi"], s["buf_hi"] >> n)
                s["buf_lo"] = lo
                s["buf_hi"] = hi
                s["avail"] = s["avail"] - n.astype(jnp.int32)

            token = jnp.full((L,), TOKEN_PAD, jnp.uint32)

            # ---- INIT: discard sub-word start offset ----
            m_init = phase == INIT
            consume(start_bit & 31, m_init)
            s["phase"] = jnp.where(m_init, CMD_SYM, s["phase"])
            phase = s["phase"]
            # INIT lanes stop here this row (avail may need catching up)
            ran_init = m_init

            # ---- CMD_SYM ----
            m = (phase == CMD_SYM) & running & ~ran_init
            any_cmd = m  # cheap enough unconditionally
            sym, nbits = read_symbol(cmd_ref[:], peek15, m)
            consume(nbits, m)
            cell = sym >> 6
            range_idx = jnp.where(cell < 2, cell, cell - 2)
            ins_high = (0x29850 >> (2 * range_idx)) & 3
            cp_high = (0x26244 >> (2 * range_idx)) & 3
            s["ins_code"] = jnp.where(m, ins_high * 8 + ((sym >> 3) & 7), s["ins_code"])
            s["cp_code"] = jnp.where(m, cp_high * 8 + (sym & 7), s["cp_code"])
            s["implicit"] = jnp.where(m, (cell < 2).astype(jnp.int32), s["implicit"])
            s["phase"] = jnp.where(m, CMD_INS, s["phase"])
            peek15 = s["buf_lo"] & 0x7FFF
            phase = s["phase"]

            # ---- CMD_INS: insert length extra bits ----
            m = (phase == CMD_INS) & running & ~ran_init & ~any_cmd
            nb = lut24(INS_NB, s["ins_code"])
            v = s["buf_lo"] & ((jnp.uint32(1) << (nb.astype(jnp.uint32) & 31)) - 1)
            consume(nb, m)
            insert_len = lut24(INS_OFF, s["ins_code"]) + v.astype(jnp.int32)
            s["lit_rem"] = jnp.where(m, insert_len, s["lit_rem"])
            s["phase"] = jnp.where(m, CMD_CP, s["phase"])
            m_was_ins = m
            peek15 = s["buf_lo"] & 0x7FFF
            phase = s["phase"]

            # ---- CMD_CP: copy length extra bits ----
            m = (phase == CMD_CP) & running & ~ran_init & ~any_cmd & ~m_was_ins
            nb = lut24(CP_NB, s["cp_code"])
            v = s["buf_lo"] & ((jnp.uint32(1) << (nb.astype(jnp.uint32) & 31)) - 1)
            consume(nb, m)
            copy_len = lut24(CP_OFF, s["cp_code"]) + v.astype(jnp.int32)
            s["copy_len"] = jnp.where(m, copy_len, s["copy_len"])
            next_p = jnp.where(s["lit_rem"] > 0, LIT, DIST_SYM)
            s["phase"] = jnp.where(m, next_p, s["phase"])
            m_was_cp = m
            peek15 = s["buf_lo"] & 0x7FFF
            phase = s["phase"]

            # ---- LIT: one literal per row ----
            m = (phase == LIT) & running & ~ran_init & ~any_cmd & ~m_was_ins & ~m_was_cp
            sym, nbits = read_symbol(lit_ref[:], peek15, m)
            consume(nbits, m)
            token = jnp.where(m, sym.astype(jnp.uint32), token)
            s["lit_rem"] = jnp.where(m, s["lit_rem"] - 1, s["lit_rem"])
            s["mbl"] = jnp.where(m, s["mbl"] - 1, s["mbl"])
            done_mb = m & (s["mbl"] <= 0)
            end_lit = m & (s["lit_rem"] <= 0)
            s["phase"] = jnp.where(
                done_mb, DONE, jnp.where(end_lit, DIST_SYM, s["phase"])
            )
            m_was_lit = m
            peek15 = s["buf_lo"] & 0x7FFF
            phase = s["phase"]

            # ---- DIST_SYM: distance symbol (skipped for implicit) ----
            m = (
                (phase == DIST_SYM) & running
                & ~ran_init & ~any_cmd & ~m_was_ins & ~m_was_cp & ~m_was_lit
            )
            m_read = m & (s["implicit"] == 0)
            sym, nbits = read_symbol(dist_ref[:], peek15, m_read)
            consume(nbits, m_read)
            s["dcode"] = jnp.where(m_read, sym, jnp.where(m, -1, s["dcode"]))
            token = jnp.where(
                m, jnp.uint32(TOKEN_COPY) | s["copy_len"].astype(jnp.uint32), token
            )
            s["phase"] = jnp.where(m, DIST_EXTRA, s["phase"])
            m_was_dsym = m
            peek15 = s["buf_lo"] & 0x7FFF
            phase = s["phase"]

            # ---- DIST_EXTRA: reconstruct distance, ring, emit ----
            m = (
                (phase == DIST_EXTRA) & running
                & ~ran_init & ~any_cmd & ~m_was_ins & ~m_was_cp
                & ~m_was_lit & ~m_was_dsym
            )
            dcode = s["dcode"]
            is_implicit = dcode < 0
            is_short = (dcode >= 0) & (dcode < 16)
            is_direct = (dcode >= 16) & (dcode < 16 + ndirect)
            is_long = dcode >= 16 + ndirect

            k = lut24(SHORT_IDX, jnp.clip(dcode, 0, 15))
            ring_val = jnp.where(
                k == 0, s["r0"],
                jnp.where(k == 1, s["r1"], jnp.where(k == 2, s["r2"], s["r3"])),
            )
            short_dist = ring_val + lut24(SHORT_DELTA, jnp.clip(dcode, 0, 15))

            rel = jnp.maximum(dcode - 16 - ndirect, 0)
            pf_mask = (1 << npostfix) - 1
            ndistbits = 1 + (rel >> (npostfix + 1))
            hcode = rel >> npostfix
            lcode = rel & pf_mask
            extra_n = jnp.where(m & is_long, ndistbits, 0)
            v = s["buf_lo"] & ((jnp.uint32(1) << (extra_n.astype(jnp.uint32) & 31)) - 1)
            consume(extra_n, m & is_long)
            offset = ((2 + (hcode & 1)) << (ndistbits & 31)) - 4
            long_dist = (
                ((offset + v.astype(jnp.int32)) << npostfix) + lcode + ndirect + 1
            )

            distance = jnp.where(
                is_implicit, s["r0"],
                jnp.where(
                    is_short, short_dist,
                    jnp.where(is_direct, dcode - 16 + 1, long_dist),
                ),
            )
            pos = mlen - s["mbl"]
            max_dist = jnp.minimum(pos, maxbw)
            bad = m & ((distance < 1) | (distance > max_dist) | (s["copy_len"] > s["mbl"]))
            push = m & ~bad & ~is_implicit & (dcode > 0)
            s["r3"] = jnp.where(push, s["r2"], s["r3"])
            s["r2"] = jnp.where(push, s["r1"], s["r2"])
            s["r1"] = jnp.where(push, s["r0"], s["r1"])
            s["r0"] = jnp.where(push, distance, s["r0"])
            token = jnp.where(
                m & ~bad, jnp.uint32(TOKEN_DIST) | distance.astype(jnp.uint32), token
            )
            s["mbl"] = jnp.where(m & ~bad, s["mbl"] - s["copy_len"], s["mbl"])
            s["phase"] = jnp.where(
                bad, ERR,
                jnp.where(m, jnp.where(s["mbl"] <= 0, DONE, CMD_SYM), s["phase"]),
            )
            return s, token

        def block_body(carry):
            blk, state = carry

            def row_body(j, st):
                st, token = row_step(st)
                staging[j, :] = token
                return st

            state = jax.lax.fori_loop(0, BLOCK_ROWS, row_body, state)
            dma = pltpu.make_async_copy(
                staging, out_ref.at[pl.ds(blk * BLOCK_ROWS, BLOCK_ROWS), :], sem
            )
            dma.start()
            dma.wait()
            return blk + 1, state

        def block_cond(carry):
            blk, state = carry
            alive = (state["phase"] != DONE) & (state["phase"] != ERR)
            return (blk < n_blocks) & jnp.any(alive)

        def dict_to_tuple(d):
            return tuple(d[k] for k in order)

        def tuple_to_dict(t):
            return dict(zip(order, t))

        def cond_t(c):
            return block_cond((c[0], tuple_to_dict(c[1])))

        def body_t(c):
            blk, st = block_body((c[0], tuple_to_dict(c[1])))
            return (blk, dict_to_tuple(st))

        blk, st_t = jax.lax.while_loop(
            cond_t, body_t, (jnp.int32(0), dict_to_tuple(init))
        )
        st = tuple_to_dict(st_t)
        # status row: phase per lane in the first row of the status output
        staging[0, :] = st["phase"].astype(jnp.uint32)
        dma = pltpu.make_async_copy(
            staging.at[0:8, :], out_ref.at[pl.ds(n_blocks * BLOCK_ROWS, 8), :], sem
        )
        dma.start()
        dma.wait()

    consts_np = np.zeros((8, 128), dtype=np.int32)
    consts_np[0, :24] = INSERT_LENGTH_N_BITS
    consts_np[1, :24] = INSERT_LENGTH_OFFSET
    consts_np[2, :24] = COPY_LENGTH_N_BITS
    consts_np[3, :24] = COPY_LENGTH_OFFSET
    consts_np[4, :16] = DISTANCE_SHORT_CODE_INDEX
    consts_np[5, :16] = DISTANCE_SHORT_CODE_DELTA

    def runner(words, lit_tab, cmd_tab, dist_tab, scalars):
        out_rows = n_blocks * BLOCK_ROWS + 8
        consts = jnp.asarray(consts_np)
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((out_rows, L), jnp.uint32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # words (L, W) u32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # lit (L, 640) i32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # cmd (L, 1152) i32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # dist (L, 1024) i32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # scalars (8, L) i32
                pl.BlockSpec(memory_space=pltpu.VMEM),  # consts (8, 128) i32
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((BLOCK_ROWS, L), jnp.uint32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(words, lit_tab, cmd_tab, dist_tab, scalars, consts)

    return runner


@functools.lru_cache(maxsize=None)
def get_kernel(L: int, W: int, n_blocks: int, interpret: bool = False):
    import jax

    return jax.jit(_build(L, W, n_blocks, interpret))


# ---------------------------------------------------------------------------
# host wrapper: preflight batch -> kernel tensors -> token resolution
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def run_pallas_batch(batch, interpret: bool = False):
    """Run the entropy kernel on a preflighted batch; returns
    (tokens (ROWS, L) uint32, phases (L,), mlen (L,))."""
    import jax.numpy as jnp

    from .device_decode import PreflightResult  # noqa: F401 (type)

    L = _round_up(len(batch), 128)  # lane tile width
    W = _round_up(max(p.words.shape[0] for p in batch), 128)
    max_out = max(p.mlen for p in batch)
    # row bound: every literal is 1 row; every command costs 5 rows and
    # covers >= 2 output bytes; +INIT row +slack
    n_rows = max_out + 5 * (max_out // 2 + 1) + 16
    n_blocks = -(-n_rows // BLOCK_ROWS)

    words = np.zeros((L, W), dtype=np.uint32)
    lit = np.zeros((L, LIT_TSIZE), dtype=np.int32)
    cmd = np.zeros((L, CMD_TSIZE), dtype=np.int32)
    dist = np.zeros((L, DIST_TSIZE), dtype=np.int32)
    scal = np.zeros((8, L), dtype=np.int32)
    for i, p in enumerate(batch):
        words[i, : p.words.shape[0]] = p.words
        lit[i, : p.lit_table.shape[0]] = p.lit_table
        cmd[i, : p.cmd_table.shape[0]] = p.cmd_table
        dist[i, : p.dist_table.shape[0]] = p.dist_table
        scal[0, i] = p.cmd_start_bit
        scal[1, i] = p.mlen
        scal[2, i] = p.max_backward
        scal[3, i] = p.npostfix
        scal[4, i] = p.ndirect
    kernel = get_kernel(L, W, n_blocks, interpret)
    out = kernel(
        jnp.asarray(words), jnp.asarray(lit), jnp.asarray(cmd),
        jnp.asarray(dist), jnp.asarray(scal),
    )
    out = np.asarray(out)
    tokens = out[: n_blocks * BLOCK_ROWS]
    phases = out[n_blocks * BLOCK_ROWS]
    return tokens, phases, scal[1]


def resolve_tokens_py(tokens: "np.ndarray", lane: int, out_len: int) -> bytes:
    """Reference token resolver (python; the native resolver mirrors this)."""
    out = bytearray(out_len)
    pos = 0
    copy_len = -1
    col = tokens[:, lane]
    for t in col:
        t = int(t)
        if t == TOKEN_PAD:
            continue
        tag = t >> 30
        if tag == 0:
            out[pos] = t & 0xFF
            pos += 1
        elif tag == 1:
            copy_len = t & 0x3FFFFFFF
        else:
            distance = t & 0x3FFFFFFF
            src = pos - distance
            for k in range(copy_len):
                out[pos] = out[src + k]
                pos += 1
        if pos >= out_len:
            break
    return bytes(out[:pos])


def decode_batch_pallas(streams: list[bytes], n_threads: int = 8,
                        interpret: bool = False) -> list[bytes]:
    """Full TPU decode pipeline: entropy kernel + native LZ resolution.

    Device-ineligible streams and error lanes fall back to the host decoder.
    """
    from ..decode import decode as host_decode
    from ..native import lz_resolve_batch
    from .device_decode import preflight

    pre = [preflight(s) for s in streams]
    results: list[bytes | None] = [None] * len(streams)
    device_idx = [i for i, p in enumerate(pre) if p is not None]
    for i, p in enumerate(pre):
        if p is None:
            results[i] = host_decode(streams[i])
    if device_idx:
        batch = [pre[i] for i in device_idx]
        tokens, phases, mlens = run_pallas_batch(batch, interpret=interpret)
        expected = np.zeros(tokens.shape[1], dtype=np.int64)
        for k in range(len(batch)):
            expected[k] = batch[k].mlen
        out, lens = lz_resolve_batch(tokens, expected, n_threads)
        for k, i in enumerate(device_idx):
            if phases[k] != DONE or lens[k] != batch[k].mlen:
                results[i] = host_decode(streams[i])  # dict ref / error lane
            else:
                results[i] = bytes(out[k, : lens[k]])
    return results  # type: ignore[return-value]
