"""Pallas lockstep decode kernel v2: 1024 shared-table streams per batch.

TPU-native architecture (SURVEY.md section 7 "sequential cores, parallel
everything else"), second generation.  What changed vs the retired round-1
v1 kernel (128 per-lane-table streams, one-hot table sweeps — git history
`ops/pallas_decode.py`):

* **1024 streams per grid step** — state lives in (8, 128) vregs (sublane x
  lane), so every elementwise op serves 1024 streams instead of 128.
* **Shared Huffman tables** — all streams in a batch declare bit-identical
  tables (produced by encode.sharded); a per-element lookup is then a
  `tpu.dynamic_gather` along lanes over row-replicated table vregs plus a
  select over ceil(T/128) chunks (~3 ops per 128 entries of table), instead
  of an O(T) one-hot sweep.  Measured on v5e: a single-vreg gather costs
  about one elementwise op.
* **Fused phases** — one row decodes a full command header (symbol + insert
  + copy extra bits, when they fit in the row's 32-bit budget), two
  literals, or a distance (symbol + extra + ring update + token), cutting
  rows per command from ~5+insert to ~3+insert/2.
* **Sliding bitstream window** — compressed words live in HBM transposed as
  (W, 8, 128); a (D, 8, 128) VMEM window slides forward by async DMA, and
  the per-row refill is a one-hot select over D rows (one 32-bit word per
  stream per row, masked).  Streams that outrun the window stall (masked
  out) until the slowest stream lets the window advance — graceful, not
  fatal.

Row bit budget: every row consumes <= 32 bits per stream; a single masked
refill per row keeps the 96-bit (3-limb) buffer above 64 bits, which
guarantees any row's worst case.  Phases that could exceed the budget
(insert/copy/distance extra bits up to 24 each) spill into their own rows.

Token stream v2 (u32, PAD = 0), resolved sequentially per stream by the
native resolver (native/lz_resolve.cpp, v2 entry point):
  tag = t >> 30
  0: literals   count=(t>>24)&3 in 1..3; bytes at bits 0-7, 8-15, 16-23
  1: copy_len   t & 0xFFFFFF; its distance follows as the next tag-2 token
  2: distance   t & 0x3FFFFFFF (completes a tag-1 copy)
  3: fused copy copy_len=(t>>22)&0xFF (2..255), distance = t & 0x3FFFFF
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..constants import (
    COPY_LENGTH_N_BITS,
    COPY_LENGTH_OFFSET,
    DISTANCE_SHORT_CODE_DELTA,
    DISTANCE_SHORT_CODE_INDEX,
    INSERT_LENGTH_N_BITS,
    INSERT_LENGTH_OFFSET,
)

SUB = 8          # sublanes: stream rows
LANES = 128      # lanes: stream columns
NSTREAM = SUB * LANES

# phases
INIT, CMD, INS_EX, CP_EX, LIT, DIST, DIST_EX, DIST2, DONE, ERR = range(10)

# token tags
TAG_LIT = 0
TAG_COPY = 1 << 30
TAG_DIST = 2 << 30
TAG_FUSED = 3 << 30

LIT_K = 5    # 630-entry literal table -> 5 chunks of 128
CMD_K = 9    # 1080-entry command table
DIST_K = 8   # 920-entry distance table
DX_K = 5     # 544-entry packed distance (extra<<26)|offset lut


def _replicate(table: np.ndarray, k: int) -> np.ndarray:
    """(<=k*128,) int32 -> (k*8, 128) with each 128-entry chunk replicated
    across its 8 sublanes (lane-gather table layout)."""
    flat = np.zeros(k * 128, dtype=np.int32)
    flat[: table.shape[0]] = table
    chunks = flat.reshape(k, 1, 128)
    return np.broadcast_to(chunks, (k, SUB, 128)).reshape(k * SUB, 128).copy()


def _build_consts() -> np.ndarray:
    """(8,128) packed lut: [0..23] ins (nbits<<20|offset),
    [64..87] copy (nbits<<20|offset), [96..111] short ((ring_idx<<4)|(delta+3))."""
    c = np.zeros(128, dtype=np.int32)
    c[0:24] = (np.asarray(INSERT_LENGTH_N_BITS, np.int32) << 20) | np.asarray(
        INSERT_LENGTH_OFFSET, np.int32
    )
    c[64:88] = (np.asarray(COPY_LENGTH_N_BITS, np.int32) << 20) | np.asarray(
        COPY_LENGTH_OFFSET, np.int32
    )
    c[96:112] = (np.asarray(DISTANCE_SHORT_CODE_INDEX, np.int32) << 4) | (
        np.asarray(DISTANCE_SHORT_CODE_DELTA, np.int32) + 3
    )
    return np.broadcast_to(c[None, :], (SUB, 128)).copy()


def _build(Wpad: int, D: int, block_rows: int, n_blocks: int,
           npostfix: int, ndirect: int, maxbw: int, interpret: bool,
           debug_stub: int = 0,
           lit_k: int = LIT_K, cmd_k: int = CMD_K, dist_k: int = DIST_K,
           dx_k: int = DX_K, groups: int = 1):
    """debug_stub (perf bisection; wrong results when nonzero): bit 0 =
    skip the window refill one-hot, bit 1 = skip table lookups, bit 3 =
    run a fixed n_blocks (no early exit) for stable timing.

    groups > 1 interleaves that many independent 1024-stream groups in one
    kernel: the per-stream dependency chain is latency-bound, so a second
    group's chain fills the pipeline bubbles."""
    if not interpret:
        from ..utils.interpret_gate import assert_validated
        assert_validated(__file__)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = (SUB, LANES)
    HALF = D // 2

    skip_fetch = bool(debug_stub & 1)
    skip_lookup = bool(debug_stub & 2)
    skip_cmd = bool(debug_stub & 4)
    skip_lit = bool(debug_stub & 16)
    skip_dist = bool(debug_stub & 32)
    skip_ex = bool(debug_stub & 64)

    def lookup(tab_ref, k, idx, g=0):
        """Shared-table per-element lookup: idx (8,128) in [0, k*128).

        Tables are stacked per interleave group (group g's k chunks start at
        chunk g*k), so every group can carry its OWN Huffman tables — the
        binning path feeds batches of merely per-group-identical streams."""
        if skip_lookup:
            return idx * 3 + 1
        lo = idx & 127
        hi = idx >> 7
        acc = jnp.zeros(S, jnp.int32)
        base = g * k
        for c in range(k):
            got = jnp.take_along_axis(
                tab_ref[(base + c) * SUB:(base + c + 1) * SUB, :], lo, axis=1
            )
            acc = jnp.where(hi == c, got, acc)
        return acc

    def gather1(tab_ref, idx):
        """Single-chunk (<=128 entries) lookup."""
        if skip_lookup:
            return idx * 5 + 2
        return jnp.take_along_axis(tab_ref[0:SUB, :], idx & 127, axis=1)

    G = groups

    def kernel(wt_ref, lit_ref, cmd_ref, dist_ref, dx_ref, consts_ref,
               scal_ref, out_ref, win, staging, sem_in, sem_out):
        zeros_u = jnp.zeros(S, jnp.uint32)
        zeros_i = jnp.zeros(S, jnp.int32)

        start_bits = [scal_ref[2 * g * SUB:(2 * g + 1) * SUB, :] for g in range(G)]
        mlens_g = [scal_ref[(2 * g + 1) * SUB:(2 * g + 2) * SUB, :] for g in range(G)]

        # ---- initial window fill ----
        dma0 = pltpu.make_async_copy(wt_ref.at[pl.ds(0, D)], win, sem_in)
        dma0.start()
        dma0.wait()

        def peek(b0, b1, b2, q, width_mask):
            """width<=24 bits at per-stream bit offset q (q <= 56)."""
            lsel = q >> 5
            w0 = jnp.where(lsel == 0, b0, b1)
            w1 = jnp.where(lsel == 0, b1, b2)
            m = (q & 31).astype(jnp.uint32)
            r = (w0 >> m) | jnp.where(
                m == 0, jnp.uint32(0), w1 << ((32 - m) & 31)
            )
            return r & width_mask

        def read_symbol(tab_ref, k, v15, g=0):
            root_idx = (v15 & 0xFF).astype(jnp.int32)
            # the root chunks are the group's first 2 chunks, so the root
            # lookup must use the group's FULL chunk stride k for its base
            lo = root_idx & 127
            hi = root_idx >> 7
            e0 = jnp.zeros(S, jnp.int32)
            if not skip_lookup:
                for c in range(2):
                    got = jnp.take_along_axis(
                        tab_ref[(g * k + c) * SUB:(g * k + c + 1) * SUB, :],
                        lo, axis=1,
                    )
                    e0 = jnp.where(hi == c, got, e0)
            else:
                e0 = root_idx * 3 + 1
            bits0 = e0 >> 16
            need_sub = bits0 > 8
            sub_mask = (
                (jnp.uint32(1) << jnp.clip(bits0, 0, 15).astype(jnp.uint32)) - 1
            )
            idx2 = root_idx + (e0 & 0xFFFF) + ((v15 & sub_mask) >> 8).astype(jnp.int32)
            e1 = lookup(tab_ref, k, jnp.where(need_sub, idx2, 0), g)
            sym = jnp.where(need_sub, e1 & 0xFFFF, e0 & 0xFFFF)
            nb = jnp.where(need_sub, (e1 >> 16) + 8, bits0)
            return sym, nb

        def make_init(mlen):
          return dict(
            phase=jnp.where(mlen > 0, INIT, DONE),
            widx=zeros_i,
            b0=zeros_u, b1=zeros_u, b2=zeros_u,
            avail=zeros_i,
            mbl=mlen,
            lit_rem=zeros_i,
            copy_len=zeros_i,
            ins_code=zeros_i,
            cp_code=zeros_i,
            implicit=zeros_i,
            dcode=zeros_i,
            dist_save=zeros_i,
            r0=jnp.full(S, 4, jnp.int32),
            r1=jnp.full(S, 11, jnp.int32),
            r2=jnp.full(S, 15, jnp.int32),
            r3=jnp.full(S, 16, jnp.int32),
          )

        inits = [make_init(mlens_g[g]) for g in range(G)]
        order = sorted(inits[0].keys())

        def row_step(s, g, start_bit, mlen):
            s = dict(s)
            live = s["phase"] < DONE

            # ---- masked refill: one 32-bit word when avail <= 64 ----
            need = live & (s["avail"] <= 64) & (s["widx"] < s["_filled"])
            p_rel = s["widx"] & (D - 1)
            if skip_fetch:
                acc = p_rel.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
            else:
                acc = zeros_u
                for d in range(D):
                    acc = jnp.where(
                        p_rel == d, win[d, g * SUB:(g + 1) * SUB, :], acc
                    )
            sh = (s["avail"] & 31).astype(jnp.uint32)
            limb = s["avail"] >> 5
            lo_part = jnp.where(need, acc << sh, jnp.uint32(0))
            hi_part = jnp.where(
                need & (sh > 0), acc >> ((32 - sh) & 31), jnp.uint32(0)
            )
            s["b0"] = s["b0"] | jnp.where(limb == 0, lo_part, jnp.uint32(0))
            s["b1"] = s["b1"] | jnp.where(
                limb == 0, hi_part, jnp.where(limb == 1, lo_part, jnp.uint32(0))
            )
            s["b2"] = s["b2"] | jnp.where(
                limb == 1, hi_part, jnp.where(limb == 2, lo_part, jnp.uint32(0))
            )
            s["avail"] = s["avail"] + jnp.where(need, 32, 0)
            s["widx"] = s["widx"] + jnp.where(need, 1, 0)

            # ---- runnable mask (phase row consumes <= 32 bits) ----
            phase0 = s["phase"]
            run = live & (
                (s["avail"] >= 65) | ((phase0 == INIT) & (s["avail"] >= 32))
            )
            b0, b1, b2 = s["b0"], s["b1"], s["b2"]
            q = zeros_i
            token = zeros_u  # PAD = 0

            def pk(width):
                mask = jnp.uint32((1 << width) - 1)
                return peek(b0, b1, b2, q, mask)

            # ---- INIT: discard sub-word start offset ----
            m = run & (phase0 == INIT)
            q = q + jnp.where(m, start_bit, 0)
            s["phase"] = jnp.where(m, CMD, s["phase"])

            # ---- CMD: command symbol + extras that fit ----
            if not skip_cmd:
              m = run & (phase0 == CMD)
              v15 = pk(15)
              sym, nb = read_symbol(cmd_ref, cmd_k, v15, g)
              cell = sym >> 6
              range_idx = jnp.where(cell < 2, cell, cell - 2)
              ins_high = (0x29850 >> (2 * range_idx)) & 3
              cp_high = (0x26244 >> (2 * range_idx)) & 3
              ins_code = ins_high * 8 + ((sym >> 3) & 7)
              cp_code = cp_high * 8 + (sym & 7)
              s["ins_code"] = jnp.where(m, ins_code, s["ins_code"])
              s["cp_code"] = jnp.where(m, cp_code, s["cp_code"])
              s["implicit"] = jnp.where(m, (cell < 2).astype(jnp.int32), s["implicit"])
              ins_pack = gather1(consts_ref, ins_code)
              cp_pack = gather1(consts_ref, cp_code + 64)
              nb_i = ins_pack >> 20
              off_i = ins_pack & 0xFFFFF
              nb_c = cp_pack >> 20
              off_c = cp_pack & 0xFFFFF
              q = q + jnp.where(m, nb, 0)
              can_i = m & (q + nb_i <= 32)
              iv = pk(24) & ((jnp.uint32(1) << (nb_i.astype(jnp.uint32) & 31)) - 1)
              s["lit_rem"] = jnp.where(can_i, off_i + iv.astype(jnp.int32), s["lit_rem"])
              q = q + jnp.where(can_i, nb_i, 0)
              can_c = can_i & (q + nb_c <= 32)
              cv = pk(24) & ((jnp.uint32(1) << (nb_c.astype(jnp.uint32) & 31)) - 1)
              s["copy_len"] = jnp.where(can_c, off_c + cv.astype(jnp.int32), s["copy_len"])
              q = q + jnp.where(can_c, nb_c, 0)
              nxt = jnp.where(
                ~can_i, INS_EX,
                jnp.where(
                    ~can_c, CP_EX,
                    jnp.where(s["lit_rem"] > 0, LIT, DIST),
                ),
              )
              s["phase"] = jnp.where(m, nxt, s["phase"])

            # ---- INS_EX: spilled insert extra bits (+ copy if it fits) ----
            if not skip_ex:
              m = run & (phase0 == INS_EX)
              ins_pack = gather1(consts_ref, s["ins_code"])
              nb_i = ins_pack >> 20
              off_i = ins_pack & 0xFFFFF
              iv = pk(24) & ((jnp.uint32(1) << (nb_i.astype(jnp.uint32) & 31)) - 1)
              s["lit_rem"] = jnp.where(m, off_i + iv.astype(jnp.int32), s["lit_rem"])
              q = q + jnp.where(m, nb_i, 0)
              cp_pack = gather1(consts_ref, s["cp_code"] + 64)
              nb_c = cp_pack >> 20
              off_c = cp_pack & 0xFFFFF
              can_c = m & (q + nb_c <= 32)
              cv = pk(24) & ((jnp.uint32(1) << (nb_c.astype(jnp.uint32) & 31)) - 1)
              s["copy_len"] = jnp.where(can_c, off_c + cv.astype(jnp.int32), s["copy_len"])
              q = q + jnp.where(can_c, nb_c, 0)
              nxt = jnp.where(
                ~can_c, CP_EX, jnp.where(s["lit_rem"] > 0, LIT, DIST)
              )
              s["phase"] = jnp.where(m, nxt, s["phase"])

              # ---- CP_EX: spilled copy extra bits ----
              m = run & (phase0 == CP_EX)
              cp_pack = gather1(consts_ref, s["cp_code"] + 64)
              nb_c = cp_pack >> 20
              off_c = cp_pack & 0xFFFFF
              cv = pk(24) & ((jnp.uint32(1) << (nb_c.astype(jnp.uint32) & 31)) - 1)
              s["copy_len"] = jnp.where(m, off_c + cv.astype(jnp.int32), s["copy_len"])
              q = q + jnp.where(m, nb_c, 0)
              s["phase"] = jnp.where(
                  m, jnp.where(s["lit_rem"] > 0, LIT, DIST), s["phase"]
              )

            # ---- LIT: up to two literals per row ----
            if not skip_lit:
              m = run & (phase0 == LIT)
              v15 = pk(15)
              sym0, nb0 = read_symbol(lit_ref, lit_k, v15, g)
              q = q + jnp.where(m, nb0, 0)
              have2 = m & (s["lit_rem"] >= 2) & (s["mbl"] >= 2)
              v15 = pk(15)
              sym1, nb1 = read_symbol(lit_ref, lit_k, v15, g)
              q = q + jnp.where(have2, nb1, 0)
              # (a 3rd literal per row was tried: the extra lookup plus the
              # stall rows it induces cost more than the row savings)
              took = jnp.where(m, 1 + have2.astype(jnp.int32), 0)
              tok_lit = (
                sym0.astype(jnp.uint32)
                | jnp.where(have2, sym1.astype(jnp.uint32) << 8, jnp.uint32(0))
                | (took.astype(jnp.uint32) << 24)
              )
              token = jnp.where(m, tok_lit, token)
              s["lit_rem"] = s["lit_rem"] - took
              s["mbl"] = s["mbl"] - took
              done_mb = m & (s["mbl"] <= 0)
              s["phase"] = jnp.where(
                  done_mb, DONE,
                  jnp.where(m & (s["lit_rem"] <= 0), DIST, s["phase"]),
              )

            # ---- DIST: distance symbol + extra bits when they fit ----
            if not skip_dist:
              m = run & (phase0 == DIST)
              is_imp = s["implicit"] == 1
              m_read = m & ~is_imp
              v15 = pk(15)
              sym, nb = read_symbol(dist_ref, dist_k, v15, g)
              q = q + jnp.where(m_read, nb, 0)
              dcode = jnp.where(m_read, sym, jnp.where(m, -1, s["dcode"]))
              s["dcode"] = dcode
              is_short = (dcode >= 0) & (dcode < 16)
              if ndirect > 0:
                is_direct = (dcode >= 16) & (dcode < 16 + ndirect)
              else:
                is_direct = jnp.zeros(S, jnp.bool_)
              is_long = dcode >= 16 + ndirect
              # short codes via packed lut
              sp = gather1(consts_ref, jnp.clip(dcode, 0, 15) + 96)
              k_idx = sp >> 4
              delta = (sp & 15) - 3
              ring_val = jnp.where(
                k_idx == 0, s["r0"],
                jnp.where(k_idx == 1, s["r1"], jnp.where(k_idx == 2, s["r2"], s["r3"])),
              )
              short_dist = ring_val + delta
              # long codes via packed (extra<<26)|offset lut (indexed by the
              # full distance code, same layout as the host's calculated LUT)
              # ONE lookup shared with the DIST_EX path (spilled extras) —
              # DIST and DIST_EX are mutually exclusive phases per stream.
              m2 = run & (phase0 == DIST_EX)
              dx_idx = jnp.where(m2, s["dcode"], dcode)
              dxp = lookup(dx_ref, dx_k, jnp.clip(dx_idx, 0, dx_k * 128 - 1))
              nbx = dxp >> 26
              offx = dxp & 0x3FFFFFF
              can_x = m & is_long & (q + nbx <= 32)
              xv = pk(24) & ((jnp.uint32(1) << (nbx.astype(jnp.uint32) & 31)) - 1)
              q = q + jnp.where(can_x, nbx, 0)
              long_dist = offx + (xv.astype(jnp.int32) << npostfix)
              distance = jnp.where(
                is_imp, s["r0"],
                jnp.where(
                    is_short, short_dist,
                    jnp.where(is_direct, dcode - 16 + 1, long_dist),
                ),
              )
              spill = m & is_long & ~can_x
              m_fin = m & ~spill
              s["phase"] = jnp.where(spill, DIST_EX, s["phase"])

              # ---- DIST_EX: spilled distance extra bits (shares dxp/xv) ----
              q = q + jnp.where(m2, nbx, 0)
              dist2 = offx + (xv.astype(jnp.int32) << npostfix)
              distance = jnp.where(m2, dist2, distance)
              m_fin = m_fin | m2

              # ---- finalize a completed distance (from DIST or DIST_EX) ----
              pos = mlen - s["mbl"]
              max_dist = jnp.minimum(pos, maxbw)
              bad = m_fin & (
                (distance < 1) | (distance > max_dist) | (s["copy_len"] > s["mbl"])
              )
              ok = m_fin & ~bad
              push = ok & ~is_imp & (s["dcode"] > 0)
              s["r3"] = jnp.where(push, s["r2"], s["r3"])
              s["r2"] = jnp.where(push, s["r1"], s["r2"])
              s["r1"] = jnp.where(push, s["r0"], s["r1"])
              s["r0"] = jnp.where(push, distance, s["r0"])
              fusable = ok & (s["copy_len"] <= 255) & (distance <= 0x3FFFFF)
              tok_fused = (
                jnp.uint32(TAG_FUSED)
                | (s["copy_len"].astype(jnp.uint32) << 22)
                | distance.astype(jnp.uint32)
              )
              tok_copy = jnp.uint32(TAG_COPY) | s["copy_len"].astype(jnp.uint32)
              token = jnp.where(
                fusable, tok_fused, jnp.where(ok, tok_copy, token)
              )
              s["dist_save"] = jnp.where(ok & ~fusable, distance, s["dist_save"])
              s["mbl"] = jnp.where(fusable, s["mbl"] - s["copy_len"], s["mbl"])
              s["phase"] = jnp.where(
                bad, ERR,
                jnp.where(
                    fusable,
                    jnp.where(s["mbl"] <= 0, DONE, CMD),
                    jnp.where(ok, DIST2, s["phase"]),
                ),
              )

              # ---- DIST2: long-form distance token row ----
              m = run & (phase0 == DIST2)
              token = jnp.where(
                m, jnp.uint32(TAG_DIST) | s["dist_save"].astype(jnp.uint32), token
              )
              s["mbl"] = jnp.where(m, s["mbl"] - s["copy_len"], s["mbl"])
              s["phase"] = jnp.where(
                  m, jnp.where(s["mbl"] <= 0, DONE, CMD), s["phase"]
              )

            # ---- consume q bits ----
            lsel = q >> 5
            c0 = jnp.where(lsel >= 1, b1, b0)
            c1 = jnp.where(lsel >= 1, b2, b1)
            c2 = jnp.where(lsel >= 1, jnp.uint32(0), b2)
            mq = (q & 31).astype(jnp.uint32)
            s["b0"] = (c0 >> mq) | jnp.where(
                mq == 0, jnp.uint32(0), c1 << ((32 - mq) & 31)
            )
            s["b1"] = (c1 >> mq) | jnp.where(
                mq == 0, jnp.uint32(0), c2 << ((32 - mq) & 31)
            )
            s["b2"] = c2 >> mq
            s["avail"] = s["avail"] - q
            return s, token

        def dict_to_tuple(d):
            return tuple(d[k] for k in order)

        def tuple_to_dict(t):
            return dict(zip(order, t))

        def flatten_states(sts):
            return tuple(x for st in sts for x in dict_to_tuple(st))

        def unflatten_states(t):
            n = len(order)
            return [tuple_to_dict(t[g * n:(g + 1) * n]) for g in range(G)]

        def block_body(carry):
            blk, filled, st_t = carry
            sts = unflatten_states(st_t)

            # ---- window advance (refill HALF words when safe) ----
            minp = jnp.int32(1 << 30)
            for st in sts:
                active = st["phase"] < DONE
                minp = jnp.minimum(
                    minp,
                    jnp.min(jnp.where(active, st["widx"], jnp.int32(1 << 30))),
                )
            do_refill = (minp >= filled - HALF) & (filled + HALF <= Wpad)

            @pl.when(do_refill)
            def _():
                slot = jax.lax.rem(filled, D)
                dma = pltpu.make_async_copy(
                    wt_ref.at[pl.ds(filled, HALF)],
                    win.at[pl.ds(slot, HALF)],
                    sem_in,
                )
                dma.start()
                dma.wait()

            filled = jnp.where(do_refill, filled + HALF, filled)

            def row_body(r, st_t2):
                sts2 = unflatten_states(st_t2[0])
                tokens = []
                for g in range(G):
                    st2 = sts2[g]
                    st2["_filled"] = filled
                    st2, token = row_step(st2, g, start_bits[g], mlens_g[g])
                    del st2["_filled"]
                    sts2[g] = st2
                    tokens.append(token)
                staging[r] = (
                    tokens[0] if G == 1 else jnp.concatenate(tokens, axis=0)
                )
                return (flatten_states(sts2),)

            (st_t3,) = jax.lax.fori_loop(
                0, block_rows, row_body, (flatten_states(sts),)
            )
            dma_out = pltpu.make_async_copy(
                staging, out_ref.at[pl.ds(blk * block_rows, block_rows)], sem_out
            )
            dma_out.start()
            dma_out.wait()
            return blk + 1, filled, st_t3

        def block_cond(carry):
            blk, filled, st_t = carry
            if debug_stub >= 8:  # fixed block count for perf bisection
                return blk < n_blocks
            sts = unflatten_states(st_t)
            alive = jnp.zeros((), jnp.bool_)
            for st in sts:
                alive = alive | jnp.any(st["phase"] < DONE)
            return (blk < n_blocks) & alive

        blk, filled, st_t = jax.lax.while_loop(
            block_cond, block_body,
            (jnp.int32(0), jnp.int32(D), flatten_states(inits)),
        )
        sts = unflatten_states(st_t)
        # status tail: row 0 phase, row 1 widx (per group, stacked
        # sublanes), row 2 the exit block (token rows actually produced —
        # rows past blk*block_rows are un-DMA'd HBM garbage, so consumers
        # must bound their token reads by this, not by a content scan)
        staging[0] = (
            sts[0]["phase"].astype(jnp.uint32) if G == 1
            else jnp.concatenate([st["phase"].astype(jnp.uint32) for st in sts], axis=0)
        )
        staging[1] = (
            sts[0]["widx"].astype(jnp.uint32) if G == 1
            else jnp.concatenate([st["widx"].astype(jnp.uint32) for st in sts], axis=0)
        )
        staging[2] = (
            jnp.zeros((G * SUB, LANES), jnp.uint32) + blk.astype(jnp.uint32)
        )
        dma_tail = pltpu.make_async_copy(
            staging.at[pl.ds(0, 8)],
            out_ref.at[pl.ds(n_blocks * block_rows, 8)],
            sem_out,
        )
        dma_tail.start()
        dma_tail.wait()

    def runner(wt, lit_t, cmd_t, dist_t, dx_t, consts, scal):
        out_rows = n_blocks * block_rows + 8
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (out_rows, G * SUB, LANES), jnp.uint32
            ),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),    # wt (Wpad,G*8,128) HBM
                pl.BlockSpec(memory_space=pltpu.VMEM),   # lit (k*8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # cmd (k*8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # dist (k*8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # dx (5*8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # consts (8,128)
                pl.BlockSpec(memory_space=pltpu.VMEM),   # scal (G*16,128)
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
            scratch_shapes=[
                pltpu.VMEM((D, G * SUB, LANES), jnp.uint32),          # window
                pltpu.VMEM((block_rows, G * SUB, LANES), jnp.uint32),  # staging
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(wt, lit_t, cmd_t, dist_t, dx_t, consts, scal)

    return runner


@functools.lru_cache(maxsize=8)
def get_kernel(Wpad: int, D: int, block_rows: int, n_blocks: int,
               npostfix: int, ndirect: int, maxbw: int, interpret: bool = False,
               debug_stub: int = 0,
               lit_k: int = LIT_K, cmd_k: int = CMD_K, dist_k: int = DIST_K,
               dx_k: int = DX_K, groups: int = 1):
    import jax

    return jax.jit(
        _build(Wpad, D, block_rows, n_blocks, npostfix, ndirect, maxbw,
               interpret, debug_stub, lit_k, cmd_k, dist_k, dx_k, groups)
    )


# ---------------------------------------------------------------------------
# host side: preflight (shared-table batch), run, resolve
# ---------------------------------------------------------------------------

def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclass
class SharedBatch:
    wt: np.ndarray            # (Wpad, 8, 128) u32
    lit_t: np.ndarray         # (5*8, 128) i32
    cmd_t: np.ndarray
    dist_t: np.ndarray
    dx_t: np.ndarray
    consts: np.ndarray        # (8, 128) i32
    scal: np.ndarray          # (16, 128) i32: start_bit rows, mlen rows
    mlens: np.ndarray         # (NSTREAM,) int64
    n_streams: int
    npostfix: int
    ndirect: int
    maxbw: int
    Wpad: int
    groups: int = 1
    lit_k: int = LIT_K
    cmd_k: int = CMD_K
    dist_k: int = DIST_K
    dx_k: int = DX_K
    # perm[slot] = original stream index of lane slot (-1 = pad); identity
    # when no reordering happened
    perm: np.ndarray | None = None
    # per-slot count of real (non-padding) words in wt; lanes that consume
    # past this ran off the end of their own stream (see lane_overran)
    n_words: np.ndarray | None = None


def _parse_dedup(streams: list[bytes], max_sigs: int = 8):
    """Parse stream prologues with header dedup.

    encode_sharded batches share BYTE-IDENTICAL headers across equal-size
    chunks (same tables, same MLEN, same start bit), so one real parse plus
    a prefix memcmp covers the other 1023 lanes — this was the preflight
    wall (native parse 27 ms + table compares 16 ms per 1024-stream group,
    VERDICT r3 #2).  A signature is the header's full bytes plus the
    masked bits of its final partial byte; identical prefix bits imply an
    identical parse (the parse is a deterministic function of the prefix).
    Streams matching no signature after `max_sigs` distinct headers fall
    back to the native batch parser.

    Returns a list of PreflightResult where clones SHARE the parse's table
    arrays (identity, no copies) but carry no words — staging reads the
    stream bytes directly; or None if any stream is device-ineligible.
    """
    from .device_decode import preflight, preflight_many

    sigs = []  # (n_full_bytes, last_mask, prefix, masked_last, result)
    pres: list = [None] * len(streams)
    hard: list[int] = []
    for i, s in enumerate(streams):
        matched = False
        for nf, mask, pref, lastb, res in sigs:
            if len(s) > nf and s[:nf] == pref and (
                not mask or (s[nf] & mask) == lastb
            ):
                pres[i] = res
                matched = True
                break
        if matched:
            continue
        if len(sigs) < max_sigs:
            r = preflight(s)
            if r is None:
                return None
            nbits = r.cmd_start_bit
            nf, rem = nbits >> 3, nbits & 7
            mask = (1 << rem) - 1
            lastb = (s[nf] & mask) if rem and len(s) > nf else 0
            sigs.append((nf, mask, bytes(s[:nf]), lastb, r))
            pres[i] = r
        else:
            hard.append(i)
    if hard:
        sub = preflight_many([streams[i] for i in hard])
        if any(p is None for p in sub):
            return None
        for i, p in zip(hard, sub):
            pres[i] = p
    return pres


def preflight_shared(streams: list[bytes], D: int = 64,
                     groups: int = 1,
                     rate_sort: bool = False) -> SharedBatch | None:
    """Preflight a batch of <=1024*groups same-table streams.

    rate_sort assigns streams to lane slots ordered by compression rate
    (decoded bytes per compressed bit) — the dominant predictor of how many
    kernel rows a lane needs per output byte.  The LZ-resolve kernel bounds
    inter-lane output skew by its ring headroom (pallas_resolve.py), and
    measured batches of mixed text+font 8-32 KB chunks exceed it unsorted;
    sorting packs similar-rate lanes into the same interleave group, which
    keeps per-group skew well inside the bound.  Results map back through
    batch.perm.
    """
    if not streams or len(streams) > NSTREAM * groups:
        return None
    pres = _parse_dedup(streams)
    if pres is None:
        return None
    p0 = pres[0]
    for p in pres[1:]:
        if p is p0:  # dedup clone: identical by construction
            continue
        if (
            p.npostfix != p0.npostfix
            or p.ndirect != p0.ndirect
            or p.max_backward != p0.max_backward
            or not np.array_equal(p.lit_table, p0.lit_table)
            or not np.array_equal(p.cmd_table, p0.cmd_table)
            or not np.array_equal(p.dist_table, p0.dist_table)
        ):
            return None

    # rebase each stream's words to its command start word
    G = groups
    NT = NSTREAM * G
    order = list(range(len(pres)))
    if rate_sort:
        rate = [
            p.mlen / max(1, len(s)) for p, s in zip(pres, streams)
        ]
        order.sort(key=lambda i: rate[i])
    perm = np.full(NT, -1, dtype=np.int64)
    perm[: len(pres)] = order
    start_bits = np.zeros(NT, dtype=np.int32)
    mlens = np.zeros(NT, dtype=np.int64)
    n_words = np.zeros(NT, dtype=np.int32)
    for slot, i in enumerate(order):
        p = pres[i]
        w0 = p.cmd_start_bit >> 5
        start_bits[slot] = p.cmd_start_bit & 31
        mlens[slot] = p.mlen
        # matches the padded-frombuffer word count: ceil(len/4) + 3 tail
        n_words[slot] = -(-len(streams[i]) // 4) + 3 - w0
    max_words = int(n_words.max())
    Wpad = _round_up(max_words, D) + D
    # stage bodies slot-major (contiguous memcpy per lane), then one bulk
    # transpose into the kernel's word-major (Wpad, G*8, 128) layout —
    # measured 3-4x cheaper than 1024 strided scatters on the 1-core host
    buf = np.zeros((NT, Wpad * 4), dtype=np.uint8)
    for slot, i in enumerate(order):
        s = streams[i]
        w0 = pres[i].cmd_start_bit >> 5
        body = np.frombuffer(s, np.uint8)[4 * w0:]
        buf[slot, : body.shape[0]] = body
    wt = np.ascontiguousarray(
        buf.view("<u4").reshape(G, SUB, LANES, Wpad).transpose(3, 0, 1, 2)
    ).reshape(Wpad, G * SUB, LANES)

    dx = (np.asarray(p0.dist_extra, np.int32) << 26) | np.asarray(
        p0.dist_offset, np.int32
    )
    scal = np.zeros((2 * G * SUB, LANES), dtype=np.int32)
    for g in range(G):
        sb = start_bits[g * NSTREAM:(g + 1) * NSTREAM].reshape(SUB, LANES)
        ml = mlens[g * NSTREAM:(g + 1) * NSTREAM].reshape(SUB, LANES)
        scal[2 * g * SUB:(2 * g + 1) * SUB, :] = sb
        scal[(2 * g + 1) * SUB:(2 * g + 2) * SUB, :] = ml.astype(np.int32)
    def used_k(table, cap):
        # chunks actually occupied by this batch's (shared) tables
        n = len(table)
        while n > 1 and table[n - 1] == 0:
            n -= 1
        return max(2, min(cap, -(-n // 128)))  # >=2: root always addressable

    lit_k = used_k(p0.lit_table, LIT_K)
    cmd_k = used_k(p0.cmd_table, CMD_K)
    dist_k = used_k(p0.dist_table, DIST_K)
    # the kernel expects per-interleave-group table stacks; a fully shared
    # batch just tiles the one set G times (240 KB of VMEM at G=12)
    return SharedBatch(
        wt=wt,
        lit_t=np.tile(_replicate(p0.lit_table[: lit_k * 128], lit_k), (G, 1)),
        cmd_t=np.tile(_replicate(p0.cmd_table[: cmd_k * 128], cmd_k), (G, 1)),
        dist_t=np.tile(
            _replicate(p0.dist_table[: dist_k * 128], dist_k), (G, 1)
        ),
        dx_t=_replicate(dx, DX_K),
        groups=G,
        lit_k=lit_k, cmd_k=cmd_k, dist_k=dist_k, dx_k=DX_K,
        consts=_build_consts(),
        scal=scal,
        mlens=mlens,
        n_streams=len(streams),
        npostfix=p0.npostfix,
        ndirect=p0.ndirect,
        maxbw=p0.max_backward,
        Wpad=Wpad,
        perm=perm if rate_sort else None,
        n_words=n_words,
    )


def preflight_binned(streams: list[bytes],
                     max_groups: int | None = None, D: int = 64):
    """Bin arbitrary device-eligible streams by Huffman-table signature.

    Each interleave group of the v2 kernel carries its own table set, so a
    batch only needs PER-GROUP-identical tables: streams are bucketed by
    the exact (lit, cmd, dist) table bytes (npostfix/ndirect/max_backward
    must match batch-wide — they parameterize shared kernel constants).
    Returns (batch, perm) where perm[slot] is the original stream index of
    lane slot (slots g*1024+j in group-major order, -1 = pad lane), or
    None when the streams don't fit the constraints.

    Covers VERDICT round-1 item 4: mixed batches (several encode_sharded
    outputs, differently-tuned shards) decode on the fast path instead of
    degrading to the per-lane v1 kernel.
    """
    from .device_decode import preflight_many

    if max_groups is None:
        max_groups = MAX_GROUPS
    if not streams:
        return None
    pres = _parse_dedup(streams, max_sigs=16)
    if pres is None:
        return None
    p0 = pres[0]
    bins: dict[bytes, list[int]] = {}
    sig_cache: dict[int, bytes] = {}  # id(parse) -> table signature
    for i, p in enumerate(pres):
        if (p.npostfix != p0.npostfix or p.ndirect != p0.ndirect
                or p.max_backward != p0.max_backward):
            return None
        sig = sig_cache.get(id(p))
        if sig is None:
            sig = (p.lit_table.tobytes() + p.cmd_table.tobytes()
                   + p.dist_table.tobytes())
            sig_cache[id(p)] = sig
        bins.setdefault(sig, []).append(i)
    # each bin becomes ceil(len/1024) groups
    n_groups = sum(-(-len(v) // NSTREAM) for v in bins.values())
    if n_groups > max_groups:
        return None

    G = n_groups
    rebased, start_bits, mlens = [], np.zeros(G * NSTREAM, np.int32), \
        np.zeros(G * NSTREAM, np.int64)
    n_words = np.zeros(G * NSTREAM, np.int32)
    perm = np.full(G * NSTREAM, -1, np.int64)
    group_tabs = []
    slot_base = 0
    for sig, idxs in bins.items():
        # rate-sort within the bin: groups get similar-rate lanes (output
        # skew stays inside the resolve kernel's ring headroom)
        idxs.sort(key=lambda i: pres[i].mlen / max(1, len(streams[i])))
        rep = pres[idxs[0]]
        for off in range(0, len(idxs), NSTREAM):
            part = idxs[off : off + NSTREAM]
            group_tabs.append(rep)
            for j, i in enumerate(part):
                p = pres[i]
                slot = slot_base + j
                w0 = p.cmd_start_bit >> 5
                rebased.append((slot, i, w0))
                start_bits[slot] = p.cmd_start_bit & 31
                mlens[slot] = p.mlen
                n_words[slot] = -(-len(streams[i]) // 4) + 3 - w0
                perm[slot] = i
            slot_base += NSTREAM

    max_words = int(n_words.max())
    Wpad = _round_up(max_words, D) + D
    # slot-major byte staging + one bulk transpose (see preflight_shared);
    # clones from _parse_dedup share table arrays but each lane's body is
    # read straight from its own stream bytes
    buf = np.zeros((G * NSTREAM, Wpad * 4), dtype=np.uint8)
    for slot, i, w0 in rebased:
        body = np.frombuffer(streams[i], np.uint8)[4 * w0:]
        buf[slot, : body.shape[0]] = body
    wt = np.ascontiguousarray(
        buf.view("<u4").reshape(G, SUB, LANES, Wpad).transpose(3, 0, 1, 2)
    ).reshape(Wpad, G * SUB, LANES)

    def used_k(table, cap):
        n = len(table)
        while n > 1 and table[n - 1] == 0:
            n -= 1
        return max(2, min(cap, -(-n // 128)))

    lit_k = max(used_k(t.lit_table, LIT_K) for t in group_tabs)
    cmd_k = max(used_k(t.cmd_table, CMD_K) for t in group_tabs)
    dist_k = max(used_k(t.dist_table, DIST_K) for t in group_tabs)
    lit_t = np.concatenate(
        [_replicate(t.lit_table[: lit_k * 128], lit_k) for t in group_tabs]
    )
    cmd_t = np.concatenate(
        [_replicate(t.cmd_table[: cmd_k * 128], cmd_k) for t in group_tabs]
    )
    dist_t = np.concatenate(
        [_replicate(t.dist_table[: dist_k * 128], dist_k) for t in group_tabs]
    )
    dx = (np.asarray(p0.dist_extra, np.int32) << 26) | np.asarray(
        p0.dist_offset, np.int32
    )
    scal = np.zeros((2 * G * SUB, LANES), dtype=np.int32)
    for g in range(G):
        sb = start_bits[g * NSTREAM:(g + 1) * NSTREAM].reshape(SUB, LANES)
        ml = mlens[g * NSTREAM:(g + 1) * NSTREAM].reshape(SUB, LANES)
        scal[2 * g * SUB:(2 * g + 1) * SUB, :] = sb
        scal[(2 * g + 1) * SUB:(2 * g + 2) * SUB, :] = ml.astype(np.int32)
    batch = SharedBatch(
        wt=wt, lit_t=lit_t, cmd_t=cmd_t, dist_t=dist_t,
        dx_t=_replicate(dx, DX_K),
        groups=G, lit_k=lit_k, cmd_k=cmd_k, dist_k=dist_k, dx_k=DX_K,
        consts=_build_consts(), scal=scal, mlens=mlens,
        n_streams=len(streams),
        npostfix=p0.npostfix, ndirect=p0.ndirect, maxbw=p0.max_backward,
        Wpad=Wpad, perm=perm, n_words=n_words,
    )
    return batch, perm


DEFAULT_D = 64
DEFAULT_BLOCK_ROWS = 32

# Host-fallback observability: lanes that exit the kernel with phase != DONE
# (row budget exceeded, stall starvation, or stream error) silently degrade
# to per-stream host decode — a large perf cliff that must be visible.
_FALLBACK_STATS = {"batches": 0, "lanes_total": 0, "lanes_fallback": 0}


def fallback_stats() -> dict:
    """Counters of v2-kernel lanes that degraded to host decode."""
    return dict(_FALLBACK_STATS)


def _note_fallbacks(n_lanes: int, n_fallback: int) -> None:
    _FALLBACK_STATS["batches"] += 1
    _FALLBACK_STATS["lanes_total"] += n_lanes
    _FALLBACK_STATS["lanes_fallback"] += n_fallback
    if n_fallback:
        import logging

        logging.getLogger("brotli_tpu").warning(
            "v2 decode: %d/%d lanes fell back to host decode "
            "(row budget or stream error)", n_fallback, n_lanes,
        )


def plan_blocks(batch: SharedBatch, block_rows: int = DEFAULT_BLOCK_ROWS,
                row_budget_factor: float = 1.15) -> int:
    """Kernel row budget.

    The worst case per stream is bounded by rows-per-output-byte < 1 for
    literals (>=1 byte/row) plus up to ~5 rows per copy command (CMD,
    INS_EX, CP_EX, DIST, DIST2) with copy_len >= 2, plus refill stalls.
    1.15*mlen + 1024 covers the measured corpus with >2x margin; lanes that
    exceed it exit with phase != DONE and are counted by fallback_stats().
    """
    max_mlen = int(batch.mlens.max())
    rows = int(row_budget_factor * max_mlen) + 1024
    return -(-rows // block_rows)


def run_batch(batch: SharedBatch, D: int = DEFAULT_D,
              block_rows: int = DEFAULT_BLOCK_ROWS,
              n_blocks: int | None = None, interpret: bool = False,
              with_widx: bool = False):
    """Run the v2 kernel; returns (tokens (R,8,128) u32, phases (8,128))
    and, with `with_widx`, the per-lane consumed-word status row too."""
    import jax.numpy as jnp

    if n_blocks is None:
        n_blocks = plan_blocks(batch, block_rows)
    kernel = get_kernel(
        batch.Wpad, D, block_rows, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, interpret,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    out = kernel(
        jnp.asarray(batch.wt), jnp.asarray(batch.lit_t),
        jnp.asarray(batch.cmd_t), jnp.asarray(batch.dist_t),
        jnp.asarray(batch.dx_t), jnp.asarray(batch.consts),
        jnp.asarray(batch.scal),
    )
    out = np.asarray(out)
    tokens = out[: n_blocks * block_rows]
    phases = out[n_blocks * block_rows]
    if with_widx:
        return tokens, phases, out[n_blocks * block_rows + 1]
    return tokens, phases


# a live lane's 64-bit lookahead may pull a few padding words past its
# final content bits before the last command completes
WIDX_SLACK = 4


def lane_overran(batch: SharedBatch, widx) -> np.ndarray:
    """Per-slot bool: lane pulled words beyond its own stream (+slack).

    The batch word table is zero-padded to Wpad, so a TRUNCATED stream does
    not stop the kernel: zero bits keep decoding as valid-looking symbols
    and the lane can reach DONE with garbage bytes.  The reference errors
    with unexpected-EOF when the bitreader runs dry (engine.ts:2136-2144);
    the device analog is this host-side check of the status widx row
    against the lane's real word count — overrun lanes go to host decode,
    which raises the proper BrotliError.
    """
    if batch.n_words is None:
        return np.zeros(NSTREAM * batch.groups, dtype=bool)
    widx = np.asarray(widx).reshape(-1).astype(np.int64)
    return widx > batch.n_words.astype(np.int64) + WIDX_SLACK


def resolve_tokens_py(tokens: np.ndarray, sub: int, lane: int, out_len: int) -> bytes:
    """Reference resolver for v2 tokens (python; mirrors native v2)."""
    out = bytearray(out_len)
    pos = 0
    copy_len = -1
    col = tokens[:, sub, lane]
    for t in col:
        t = int(t)
        if t == 0:
            continue
        tag = t >> 30
        if tag == 0:
            cnt = (t >> 24) & 3
            for k in range(cnt):
                if pos >= out_len:
                    return bytes(out[:pos])
                out[pos] = (t >> (8 * k)) & 0xFF
                pos += 1
        elif tag == 1:
            copy_len = t & 0xFFFFFF
        else:
            if tag == 3:
                copy_len = (t >> 22) & 0xFF
                distance = t & 0x3FFFFF
            else:
                distance = t & 0x3FFFFFFF
            src = pos - distance
            for k in range(copy_len):
                out[pos] = out[src + k]
                pos += 1
            copy_len = -1
        if pos >= out_len:
            break
    return bytes(out[:pos])


MAX_GROUPS = 12  # measured sweet spot on v5e; 16 regresses (register spills)


def decode_batch_pallas2(streams: list[bytes], n_threads: int = 8,
                         interpret: bool = False,
                         D: int = DEFAULT_D,
                         groups: int | None = None) -> list[bytes]:
    """Full v2 pipeline: shared-table entropy kernel + native LZ resolution.

    Batches of same-table streams (encode_sharded output) take the lockstep
    kernel — up to MAX_GROUPS independent 1024-stream groups interleaved in
    one kernel launch (the per-stream dependency chain is latency-bound;
    extra groups fill the pipeline, measured 1.26 -> 6.1 GB/s at G=12).
    Anything else falls back to the v1 per-lane-table pipeline or the host
    decoder.
    """
    from ..decode import decode as host_decode
    from ..native import lz_resolve_batch_v2

    if groups is None:
        groups = min(MAX_GROUPS, -(-len(streams) // NSTREAM))
    perm = None
    batch = preflight_shared(streams, D=D, groups=groups)
    if batch is None:
        # not batch-identical tables: bin by table signature, one kernel
        # interleave group per bin (per-group table vregs)
        binned = preflight_binned(streams, D=D)
        if binned is not None:
            batch, perm = binned
    if batch is None:
        # too many distinct table signatures for per-group binning: the
        # per-lane-table device variant (ops/device_decode.py) or the host
        # decoder (native C++ first) cover the long tail
        return [host_decode(s) for s in streams]
    tokens, phases, widx = run_batch(batch, D=D, interpret=interpret,
                                     with_widx=True)
    flat_phases = phases.reshape(-1)
    overran = lane_overran(batch, widx)
    expected = np.zeros(NSTREAM * batch.groups, dtype=np.int64)
    if perm is None:
        expected[: batch.n_streams] = batch.mlens[: batch.n_streams]
    else:
        expected[:] = batch.mlens
    out, lens = lz_resolve_batch_v2(tokens.reshape(tokens.shape[0], -1),
                                    expected, n_threads)
    results: list[bytes | None] = [None] * batch.n_streams
    n_fallback = 0
    for slot in range(NSTREAM * batch.groups):
        i = slot if perm is None else int(perm[slot])
        if i < 0 or i >= batch.n_streams:
            continue
        if (flat_phases[slot] != DONE or overran[slot]
                or lens[slot] != batch.mlens[slot]):
            n_fallback += 1
            results[i] = host_decode(streams[i])
        else:
            results[i] = bytes(out[slot, : lens[slot]])
    _note_fallbacks(batch.n_streams, n_fallback)
    return results  # type: ignore[return-value]


def used_token_rows(out, n_blocks: int, block_rows: int = DEFAULT_BLOCK_ROWS,
                    block: int = 512) -> int:
    """Token rows the entropy kernel actually produced, from its status
    tail (exit block), rounded up to `block`.

    The kernel's row budget (plan_blocks) is a worst case ~1.3x the typical
    stream and the kernel exits early once every lane is DONE — rows past
    the exit block are un-DMA'd HBM garbage, and the resolve kernel's
    shared token cursor must traverse every row it is given.  Rounding
    keeps the resolve kernel's compile cache small."""
    rows = n_blocks * block_rows
    blk = int(out[rows + 2, 0, 0])
    return min(rows, _round_up(max(blk * block_rows, 1), block))


def run_batch_e2e(batch: SharedBatch, *, H: int | None = None,
                  D: int = DEFAULT_D, block_rows: int = DEFAULT_BLOCK_ROWS,
                  interpret: bool = False, row_budget: int | None = None,
                  token_row_cap: int | None = None):
    """Entropy kernel + device LZ resolve, tokens never leaving the device.

    Returns (resolved (G, R_out+8, 8, 128) u32 DEVICE array, n_out_rows,
    phases (host), n_blocks).  The decoded bytes live in HBM — this is the
    end-to-end decode path whose output the bench times (VERDICT item 1).

    token_row_cap bounds the VMEM-resident token slice handed to the
    resolve kernel (see resolve_tokens_device's residency constraint);
    streams whose tokens exceed the cap degrade to flagged lanes, so the
    caller's fallback keeps correctness.  Suited to chunk sizes <= ~2-4 KB;
    the fused decode3 kernel covers larger chunks.
    """
    import jax.numpy as jnp

    from .pallas_resolve import DEFAULT_H, resolve_tokens_device

    n_blocks = plan_blocks(batch, block_rows)
    kernel = get_kernel(
        batch.Wpad, D, block_rows, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, interpret,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    out = kernel(
        jnp.asarray(batch.wt), jnp.asarray(batch.lit_t),
        jnp.asarray(batch.cmd_t), jnp.asarray(batch.dist_t),
        jnp.asarray(batch.dx_t), jnp.asarray(batch.consts),
        jnp.asarray(batch.scal),
    )
    rows = n_blocks * block_rows
    r_cap = min(rows, token_row_cap) if token_row_cap else \
        used_token_rows(out, n_blocks, block_rows)
    tokens = out[:r_cap]                     # device slice
    phases = np.asarray(out[rows]).reshape(-1)   # tiny host fetch
    # truncated-stream guard: overrun lanes decoded zero padding — force
    # them off the fast path regardless of the phase they reached
    phases = np.where(lane_overran(batch, out[rows + 1]),
                      np.uint32(0xFFFF), phases)
    resolved, n_out_rows = resolve_tokens_device(
        tokens, batch.mlens, H=H or DEFAULT_H, interpret=interpret,
        row_budget=row_budget,
    )
    return resolved, n_out_rows, phases, n_blocks


def decode_batch_device_e2e(streams: list[bytes], *, H: int | None = None,
                            interpret: bool = False,
                            groups: int | None = None,
                            n_threads: int = 8,
                            token_row_cap: int | None = None) -> list[bytes]:
    """Full decode with BOTH phases on device (entropy + LZ resolve).

    Streams must be shared-table (encode_sharded / device-encoder output)
    with distances within the resolve window (max_distance); anything else
    falls back per lane to the host pipeline, counted by fallback_stats().
    """
    from ..decode import decode as host_decode
    from .pallas_resolve import unpack_resolved

    if groups is None:
        groups = min(MAX_GROUPS, -(-len(streams) // NSTREAM))
    # rate-sorted slot assignment keeps per-group output skew inside the
    # resolve kernel's ring headroom (see preflight_shared docstring)
    batch = preflight_shared(streams, groups=groups, rate_sort=True)
    if batch is None:
        binned = preflight_binned(streams)
        if binned is not None:
            batch = binned[0]
    if batch is None:
        return decode_batch_pallas2(streams, n_threads=n_threads,
                                    interpret=interpret)
    resolved, n_out_rows, phases, _ = run_batch_e2e(
        batch, H=H, interpret=interpret, token_row_cap=token_row_cap
    )
    outs, errs = unpack_resolved(np.asarray(resolved), n_out_rows, batch.mlens)
    results: list[bytes | None] = [None] * batch.n_streams
    n_fallback = 0
    for slot in range(NSTREAM * batch.groups):
        i = slot if batch.perm is None else int(batch.perm[slot])
        if i < 0 or i >= batch.n_streams:
            continue
        if phases[slot] != DONE or errs[slot] != 0:
            n_fallback += 1
            results[i] = host_decode(streams[i])
        else:
            results[i] = outs[slot]
    _note_fallbacks(batch.n_streams, n_fallback)
    return results  # type: ignore[return-value]
