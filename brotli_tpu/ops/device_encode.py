"""TPU device encoder: sort-based match finding + XLA parse + device bit-pack.

A from-scratch, gather-free encode pipeline (measured on v5e: XLA per-element
gather runs at ~0.07 G elem/s — unusable — while row-wise `lax.sort` with
co-sorted payloads runs at 35-75 ms for (1024, 32768) records).  Every stage
is therefore built from sorts, shifts (static slices), cumulative ops, and
elementwise math; the only sequential pieces are a cell-blocked `lax.scan`
for the greedy parse and the Pallas bit-pack kernel (one record per row,
uniform consumption, grid-streamed).

Pipeline per batch of B=1024 chunks x N=32768 bytes:
  1. hash every position (4-byte window * Knuth multiplier)
  2. sort (hash<<15|pos) co-sorting 4 carried window words -> nearest
     previous occurrences (chain depth 2) are adjacent in sorted order;
     match length = common prefix of carried 16-byte windows
  3. sort back to position order (pos key, packed len|dist payload)
  4. run-extension: doubling-stride merge of capped matches with equal
     distance, plus explicit byte-run (dist small, period<=4) detection
  5. lazy-ish greedy parse: lax.scan over 64-byte cells carrying next_free
  6. symbol records already in STREAM order without sorting: DIST_k at
     copy-start_k+1, the NEXT command's CMD at copy-start_k+2 (both always
     covered by copy k, len >= 4), literals in place, first command in a
     prepended column; next-command metadata arrives by reverse-cummin
  7. host: Huffman tables from a strided device sample (+1 smoothing so
     every emittable symbol has a code), metablock header bits
  8. Pallas pack kernel: records -> LSB-first bitstream words
  9. per-lane word compaction sort + host stream assembly

The output is standard RFC 7932: one single-metablock stream per chunk with
identical Huffman tables across the batch — exactly the layout the v2
lockstep decoder consumes (ops/pallas_decode2.py).  Reference-parity notes:
this replaces the reference's hash-chain search + greedy loop
(hash-chains.ts, backward-references.ts) with a TPU-native equivalent; the
bitstream-level contracts (command codes, prefix codes, extra bits) are the
same ones implemented in encode/command.py and encode/entropy.py.
"""

from __future__ import annotations

import functools as _functools
from dataclasses import dataclass

import numpy as np

from ..constants import (
    COPY_LENGTH_N_BITS,
    COPY_LENGTH_OFFSET,
    INSERT_LENGTH_N_BITS,
    INSERT_LENGTH_OFFSET,
    NUM_COMMAND_SYMBOLS,
    NUM_LITERAL_SYMBOLS,
)

B_LANES = 1024        # streams per batch (8 sublanes x 128 lanes downstream)
CHUNK_N = 32768       # bytes per chunk
MATCH_CAP = 8         # carried-window match cap before extension
MAX_LEN = 512         # copy-length cap (longer runs split; trims doubling passes)
CELL = 64             # greedy-parse cell size
HASH_MUL = 0x1E35A7BD

# record kinds
K_PAD, K_CMD, K_LIT, K_DIST = 0, 1, 2, 3


# ---------------------------------------------------------------------------
# elementwise code helpers (jnp)
# ---------------------------------------------------------------------------

def _code_from_offsets(x, offsets):
    """code = max k with x >= offsets[k] (24-entry table, compare chain)."""
    import jax.numpy as jnp

    code = jnp.zeros(x.shape, jnp.int32)
    for k in range(1, len(offsets)):
        code = code + (x >= int(offsets[k])).astype(jnp.int32)
    return code


def _combine_length_codes(ins_code, cp_code, use_last):
    """Elementwise mirror of constants.combine_length_codes."""
    import jax.numpy as jnp

    bits64 = ((ins_code & 7) << 3) | (cp_code & 7)
    cell_lut = {  # (ins>>3, cp>>3) -> cell
        (0, 0): 2, (0, 1): 3, (1, 0): 4, (1, 1): 5,
        (0, 2): 6, (2, 0): 7, (1, 2): 8, (2, 1): 9, (2, 2): 10,
    }
    ih, ch = ins_code >> 3, cp_code >> 3
    cell = jnp.zeros(ins_code.shape, jnp.int32)
    for (i, c), v in cell_lut.items():
        cell = jnp.where((ih == i) & (ch == c), v, cell)
    normal = (cell << 6) | bits64
    implicit_ok = use_last & (ins_code < 8) & (cp_code < 16)
    implicit = jnp.where(cp_code < 8, bits64, bits64 | 64)
    return jnp.where(implicit_ok, implicit, normal)


def _ilog2(x):
    """floor(log2(x)) for 1 <= x < 2^22, exact via float32 exponent."""
    import jax
    import jax.numpy as jnp

    f = x.astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(f, jnp.int32)
    return (bits >> 23) - 127


@_functools.lru_cache(maxsize=4)
def _ctx_runs(mode: int):
    """Context LUT for `mode` as constant runs, for gather-free on-device
    evaluation: two lists of (lo, hi, value) byte ranges for the p1 and p2
    halves (UTF8: 181 + 10 runs, signed: 8 + 8; XLA gather at ~0.07 G
    elem/s makes a plain table lookup unusable at batch scale)."""
    from ..decode.engine import _CONTEXT_LUT

    def runs(seg):
        out = []
        lo = 0
        for i in range(1, 257):
            if i == 256 or seg[i] != seg[lo]:
                if seg[lo]:
                    out.append((lo, i - 1, seg[lo]))
                lo = i
        return tuple(out)

    base = mode * 512
    return (
        runs(_CONTEXT_LUT[base : base + 256]),
        runs(_CONTEXT_LUT[base + 256 : base + 512]),
    )


def _literal_context(d32, N, mode: int):
    """(B, N) literal context ids (0..63) for `mode`:
    lut[p1] | lut[256+p2], as compare-select chains over constant runs."""
    import jax.numpy as jnp

    B = d32.shape[0]
    z1 = jnp.zeros((B, 1), jnp.int32)
    p1 = jnp.concatenate([z1, d32[:, : N - 1]], axis=1)
    p2 = jnp.concatenate([z1, z1, d32[:, : N - 2]], axis=1)
    runs1, runs2 = _ctx_runs(mode)
    ctx = jnp.zeros((B, N), jnp.int32)
    for lo, hi, val in runs1:
        m = (p1 >= lo) & (p1 <= hi) if lo != hi else (p1 == lo)
        ctx = ctx | jnp.where(m, val, 0)
    for lo, hi, val in runs2:
        m = (p2 >= lo) & (p2 <= hi) if lo != hi else (p2 == lo)
        ctx = ctx | jnp.where(m, val, 0)
    return ctx


# ---------------------------------------------------------------------------
# stage 1-4: match finding (XLA)
# ---------------------------------------------------------------------------

def find_matches(data_u8, n_valid, hash_stride: int = 1,
                 max_distance: int | None = None, chain_depth: int = 2,
                 hash2: bool = False):
    """data_u8 (B, N+MATCH_CAP+4) u8 device array; n_valid (B,) int32.

    hash_stride: 1 = hash every position (best ratio); 2 = hash every other
    position (halves the dominant sort, ~10% worse ratio).

    max_distance caps match distances so the streams stay resolvable by the
    on-device LZ kernel's history window (pallas_resolve.MAX_DEVICE_DISTANCE);
    sorted-order candidates are the NEAREST previous occurrences, so the
    ratio cost of the cap is small on typical data.

    Returns (mlen, mdist) int32 (B, N): best match (len >= 4) per position,
    len 0 where none."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, Npad = data_u8.shape
    N = Npad - (MATCH_CAP + 4)
    d32 = data_u8.astype(jnp.int32)

    def load32(off):
        return (
            d32[:, off : off + N]
            | (d32[:, off + 1 : off + 1 + N] << 8)
            | (d32[:, off + 2 : off + 2 + N] << 16)
            | (d32[:, off + 3 : off + 3 + N] << 24)
        )

    w = [load32(k * 4) for k in range(MATCH_CAP // 4)]
    st = hash_stride
    N2 = N // st
    pbits = (N2 - 1).bit_length()
    w2 = [x[:, ::st] for x in w] if st > 1 else w
    pos2 = jax.lax.broadcasted_iota(jnp.int32, (B, N2), 1)

    def hash_pass(h, depth):
        """One sorted-adjacency candidate pass for hash values `h`:
        returns (len, dist) per (strided) position, in position order."""
        key = (h << pbits) | pos2
        srt = lax.sort((key,) + tuple(w2), dimension=1, num_keys=1)
        skey = srt[0]
        sw = srt[1:]
        spos = (skey & ((1 << pbits) - 1)) * st
        shash = skey >> pbits

        def neighbor(j):
            """Candidate = j-th previous entry in sorted order (same
            hash)."""
            cpos = jnp.concatenate(
                [jnp.full((B, j), -1, jnp.int32), spos[:, :-j]], axis=1
            )
            same = jnp.concatenate(
                [jnp.zeros((B, j), jnp.bool_), shash[:, j:] == shash[:, :-j]],
                axis=1,
            )
            # common prefix of the carried 16-byte windows
            mlen = jnp.full((B, N2), MATCH_CAP, jnp.int32)
            done = jnp.zeros((B, N2), jnp.bool_)
            for k in range(MATCH_CAP // 4):
                cw = jnp.concatenate(
                    [jnp.zeros((B, j), jnp.int32), sw[k][:, :-j]], axis=1
                )
                x = jnp.bitwise_xor(sw[k], cw)
                has_diff = x != 0
                # count trailing zero BYTES of x (little-endian byte order)
                tz = jnp.where(
                    (x & 0xFF) != 0, 0,
                    jnp.where(
                        (x & 0xFFFF) != 0, 1,
                        jnp.where((x & 0xFFFFFF) != 0, 2, 3),
                    ),
                )
                word_len = k * 4 + tz
                mlen = jnp.where(~done & has_diff, word_len, mlen)
                done = done | has_diff
            dist = spos - cpos
            ok = same & (cpos >= 0) & (mlen >= 4)
            if max_distance is not None:
                ok = ok & (dist <= max_distance)
            return jnp.where(ok, mlen, 0), jnp.where(ok, dist, 0)

        slen, sdist = neighbor(1)
        for j in range(2, depth + 1):
            lj, dj = neighbor(j)
            # longer wins; nearer wins ties (sorted adjacency makes j-th
            # neighbor the j-th nearest, so ties keep the earlier one)
            better = (lj > slen) | ((lj == slen) & (dj < sdist) & (lj > 0))
            slen = jnp.where(better, lj, slen)
            sdist = jnp.where(better, dj, sdist)

        # back to position order: key = spos (unique/lane), packed payload
        packed = (slen << 16) | sdist  # len<=16 (5b), dist<2^15
        back = lax.sort((spos, packed), dimension=1, num_keys=1)
        p2 = back[1]
        return p2 >> 16, p2 & 0xFFFF

    h4 = ((w2[0] * HASH_MUL) >> 15) & ((1 << (31 - pbits)) - 1)
    mlen_e, mdist_e = hash_pass(h4, chain_depth)
    if hash2:
        # second pass keyed on 7 bytes: rarer collisions, so the nearest
        # sorted neighbor is usually the best LONG match even when the
        # 4-byte bucket is polluted by short repeats (the device analog
        # of the reference's deeper chain walks, hash-chains.ts:69-126)
        mul2 = jnp.int32(0x9E3779B1 - (1 << 32))   # golden-ratio odd mult
        h7 = ((w2[0] * HASH_MUL) ^ ((w2[1] & 0xFFFFFF) * mul2)) >> 15
        h7 = h7 & ((1 << (31 - pbits)) - 1)
        l7, d7 = hash_pass(h7, 2)
        better = (l7 > mlen_e) | ((l7 == mlen_e) & (d7 < mdist_e) & (l7 > 0))
        mlen_e = jnp.where(better, l7, mlen_e)
        mdist_e = jnp.where(better, d7, mdist_e)
    if st > 1:
        # interleave strided results with zeros at unhashed positions
        z = jnp.zeros((B, N2), jnp.int32)
        mlen = jnp.stack([mlen_e] + [z] * (st - 1), axis=2).reshape(B, N)
        mdist = jnp.stack([mdist_e] + [z] * (st - 1), axis=2).reshape(B, N)
    else:
        mlen, mdist = mlen_e, mdist_e

    # --- byte-run candidates: dist-4 matches of unbounded length ---
    # c[p] = (data[p] == data[p-4]); run length L[p] of consecutive c via
    # exact doubling: L += (L == s) * L[p+s], s = 1,2,4,...
    dshift = jnp.concatenate(
        [jnp.full((B, 4), -1, jnp.int32), d32[:, : N - 4]], axis=1
    )
    c = (d32[:, :N] == dshift).astype(jnp.int32)
    L = c
    stride = 1
    while stride < min(MAX_LEN, N):
        shifted = jnp.concatenate(
            [L[:, stride:], jnp.zeros((B, stride), jnp.int32)], axis=1
        )
        L = L + jnp.where(L == stride, shifted, 0)
        stride *= 2
    L = jnp.minimum(L, MAX_LEN)
    run_better = (L >= 4) & (L > mlen)
    mlen = jnp.where(run_better, L, mlen)
    mdist = jnp.where(run_better, 4, mdist)

    # --- doubling-stride extension of capped matches with equal distance ---
    stride = MATCH_CAP
    while stride < min(MAX_LEN, N):
        nlen = jnp.concatenate(
            [mlen[:, stride:], jnp.zeros((B, stride), jnp.int32)], axis=1
        )
        ndist = jnp.concatenate(
            [mdist[:, stride:], jnp.zeros((B, stride), jnp.int32)], axis=1
        )
        can = (mlen == stride) & (ndist == mdist) & (nlen > 0)
        mlen = jnp.where(can, jnp.minimum(mlen + nlen, MAX_LEN), mlen)
        stride *= 2

    # clamp to valid region
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    nv = n_valid[:, None]
    mlen = jnp.minimum(mlen, jnp.maximum(nv - pos, 0))
    valid = (pos < nv) & (mlen >= 4) & (mdist >= 1) & (mdist <= pos)
    mlen = jnp.where(valid, mlen, 0)
    mdist = jnp.where(valid, mdist, 0)
    return mlen, mdist


# ---------------------------------------------------------------------------
# stage 5: greedy parse (lax.scan over cells)
# ---------------------------------------------------------------------------

def greedy_parse(mlen, mdist, n_valid, lazy=(105, 175), min_gate=9):
    """Returns (is_cs, is_lit, dcode_short) (B, N).

    Match selection is score-based like the reference's hasher scoring
    (match.ts:26-30, score ~ 135*len - 30*log2(dist)): a weak far match
    (short length, large distance) loses to its literal cost, and a match
    is deferred when a clearly better one starts 1-2 bytes ahead (lazy
    matching, the device analog of hash-chains.ts best-score probing).

    The scan also simulates the decoder's 4-entry distance ring exactly
    (RFC 4): dcode_short[p] is the short distance code (0-15) a copy at p
    can use, or -1 — code 0 means "repeat last distance" (no ring push),
    matching the decoder's update rule (push on any code != 0)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from ..constants import (
        DISTANCE_SHORT_CODE_DELTA,
        DISTANCE_SHORT_CODE_INDEX,
    )

    B, N = mlen.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    score = 135 * mlen - 30 * _ilog2(jnp.maximum(mdist, 1))
    # weak-match gate: a len-4 copy at distance >= 2^min_gate is not
    # clearly cheaper than 4 context-coded literals; require len to grow
    # with log2(dist)
    strong = (mlen >= 4) & (score >= 135 * 4 - 30 * min_gate)

    def sh1(a, j):
        return jnp.concatenate(
            [a[:, j:], jnp.zeros((B, j), a.dtype)], axis=1
        )

    s1 = sh1(score, 1)
    s2 = sh1(score, 2)
    take = strong & ~(s1 >= score + lazy[0]) & ~(s2 >= score + lazy[1])
    take = take & (pos < n_valid[:, None])

    take_c = take.reshape(B, N // CELL, CELL).transpose(1, 0, 2)
    len_c = mlen.reshape(B, N // CELL, CELL).transpose(1, 0, 2)
    dist_c = mdist.reshape(B, N // CELL, CELL).transpose(1, 0, 2)

    sidx = [int(x) for x in DISTANCE_SHORT_CODE_INDEX]
    sdel = [int(x) for x in DISTANCE_SHORT_CODE_DELTA]

    def cell_body(carry, xs):
        next_free, base, r0, r1, r2, r3 = carry
        take_i, len_i, dist_i = xs
        cs_rows = []
        lit_rows = []
        dc_rows = []
        for i in range(CELL):
            p = base + i
            free = p >= next_free
            csi = free & take_i[:, i]
            liti = free & ~take_i[:, i] & (p < n_valid)
            next_free = jnp.where(csi, p + len_i[:, i], next_free)
            d = dist_i[:, i]
            # exact ring hits only (codes 0-3); the +/-1..3 delta codes
            # (4-15) are rare and tripled the scan cost when probed
            dc = jnp.full(B, -1, jnp.int32)
            ring = (r0, r1, r2, r3)
            for k in range(3, -1, -1):
                cand = ring[sidx[k]] + sdel[k]
                dc = jnp.where((d == cand) & (cand > 0), k, dc)
            dc = jnp.where(csi, dc, -1)
            # ring push on any used code != 0 (long codes and short 1-15)
            push = csi & (dc != 0)
            r3 = jnp.where(push, r2, r3)
            r2 = jnp.where(push, r1, r2)
            r1 = jnp.where(push, r0, r1)
            r0 = jnp.where(push, d, r0)
            cs_rows.append(csi)
            lit_rows.append(liti)
            dc_rows.append(dc)
        return (next_free, base + CELL, r0, r1, r2, r3), (
            jnp.stack(cs_rows, axis=1),
            jnp.stack(lit_rows, axis=1),
            jnp.stack(dc_rows, axis=1),
        )

    init_ring = [jnp.full(B, v, jnp.int32) for v in (4, 11, 15, 16)]
    (_, _, _, _, _, _), (cs_c, lit_c, dc_c) = lax.scan(
        cell_body,
        (jnp.zeros(B, jnp.int32), jnp.int32(0), *init_ring),
        (take_c, len_c, dist_c),
    )
    is_cs = cs_c.transpose(1, 0, 2).reshape(B, N)
    is_lit = lit_c.transpose(1, 0, 2).reshape(B, N)
    dcode_short = dc_c.transpose(1, 0, 2).reshape(B, N)
    return is_cs, is_lit, dcode_short


# ---------------------------------------------------------------------------
# stage 6: symbol records
# ---------------------------------------------------------------------------

def build_records(data_u8, mlen, mdist, is_cs, is_lit, dcode_short, n_valid,
                  lit_ctx: bool = False):
    """Returns record arrays (rec0, rec1) (B, N+1) already in STREAM order.

    rec0 = kind<<28 | code   (code: cmd_prefix / literal byte / dist code);
           with lit_ctx, literal records also carry their UTF8-mode context
           id at bits 14-19 (context-mapped literal trees downstream)
    rec1 = extra-bits payload:
      CMD : ins_val | cp_val<<16
      DIST: extra value

    No sort is needed: column 0 holds the first command's CMD record, and
    command k+1's CMD record sits at (copy-start_k + 2) + 1 — a position
    always covered by copy k (len >= 4), which in position order lands
    after DIST_k and before command k+1's literals, i.e. exactly RFC
    symbol order.  Next-command metadata is propagated backward with
    reverse-cummin packed scans (gather-free).
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    B, N = mlen.shape
    pos = jax.lax.broadcasted_iota(jnp.int32, (B, N), 1)
    d32 = data_u8[:, :N].astype(jnp.int32)

    # insert length of each command: copy start q minus end of previous copy
    cend = jnp.where(is_cs, pos + mlen, -1)
    cend_cum = lax.cummax(cend, axis=1)
    cend_excl = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), cend_cum[:, :-1]], axis=1
    )
    prev_end = jnp.maximum(cend_excl, 0)
    ins_len = jnp.where(is_cs, pos - prev_end, 0)

    # short distance codes come from the parse's exact ring simulation
    has_short = is_cs & (dcode_short >= 0)
    code0 = is_cs & (dcode_short == 0)

    ins_code = _code_from_offsets(ins_len, INSERT_LENGTH_OFFSET)
    cp_code = _code_from_offsets(mlen, COPY_LENGTH_OFFSET)
    # offsets via compare-chain select (gather-free)
    ins_base = jnp.zeros_like(ins_code)
    cp_base = jnp.zeros_like(cp_code)
    for k in range(len(INSERT_LENGTH_OFFSET)):
        ins_base = jnp.where(ins_code == k, int(INSERT_LENGTH_OFFSET[k]), ins_base)
        cp_base = jnp.where(cp_code == k, int(COPY_LENGTH_OFFSET[k]), cp_base)
    ins_val = ins_len - ins_base
    cp_val = mlen - cp_base

    implicit = code0 & (ins_code < 8) & (cp_code < 16)
    cmd_prefix = _combine_length_codes(ins_code, cp_code, code0)

    # distance code: short ring code when available, else long form
    dd = mdist + 3  # npostfix=0, ndirect=0: dist -> dist+3, bucket form
    bucket = _ilog2(jnp.maximum(dd, 4)) - 1
    prefix = (dd >> bucket) & 1
    offset = (2 + prefix) << bucket
    dcode_long = 16 + 2 * (bucket - 1) + prefix
    dval_long = dd - offset
    dcode = jnp.where(has_short, dcode_short, dcode_long)
    dval = jnp.where(has_short, 0, dval_long)

    # --- record placement (stream order == position order) ---
    # DIST_k at cs_k+1; CMD_{k+1} (or the trailing insert-only command) at
    # cs_k+2; LIT at literal positions; column 0 = first command's CMD.
    def sh(a, j=1):
        return jnp.concatenate([jnp.zeros((B, j), a.dtype), a[:, :-j]], axis=1)

    is_dist_slot = sh(is_cs & ~implicit)
    is_cmd_slot = sh(is_cs, 2)

    # backward propagation of the NEXT copy's command metadata: pack
    # (pos<<16 | payload) and reverse-cummin; min picks the nearest copy.
    BIG = jnp.int32(0x7FFFFFFF)

    def rev_next(payload):
        packed = jnp.where(is_cs, (pos << 16) | payload, BIG)
        rc = lax.cummin(packed[:, ::-1], axis=1)[:, ::-1]
        return rc  # BIG where no copy at >= p

    nxt_prefix = rev_next(cmd_prefix)
    nxt_insval = rev_next(ins_val)
    nxt_cpval = rev_next(cp_val)

    # trailing insert-only command (literals after the last copy)
    n_lit_tail = (n_valid - jnp.maximum(cend_cum[:, -1], 0))[:, None]
    has_tail = n_lit_tail > 0
    t_ins_code = _code_from_offsets(n_lit_tail, INSERT_LENGTH_OFFSET)
    t_ins_base = jnp.zeros_like(t_ins_code)
    for k in range(len(INSERT_LENGTH_OFFSET)):
        t_ins_base = jnp.where(t_ins_code == k, int(INSERT_LENGTH_OFFSET[k]), t_ins_base)
    t_prefix = _combine_length_codes(
        t_ins_code, jnp.zeros_like(t_ins_code), t_ins_code < 8
    )
    t_rec1 = n_lit_tail - t_ins_base

    # CMD record content at slot q: next copy's metadata at q-1, else tail
    nxtp_here = sh(nxt_prefix)
    nxti_here = sh(nxt_insval)
    nxtc_here = sh(nxt_cpval)
    next_exists = nxtp_here != BIG
    cmd_code = jnp.where(next_exists, nxtp_here & 0xFFFF, t_prefix)
    cmd_rec1 = jnp.where(
        next_exists,
        (nxti_here & 0xFFFF) | ((nxtc_here & 0xFFFF) << 16),
        t_rec1,
    )
    emit_cmd = is_cmd_slot & (next_exists | has_tail)

    kind = jnp.where(
        emit_cmd, K_CMD,
        jnp.where(is_dist_slot, K_DIST, jnp.where(is_lit, K_LIT, K_PAD)),
    )
    lit_code = d32
    if lit_ctx:
        # both candidate context modes ride in the record; the table-group
        # clustering later picks UTF8 (text) or SIGNED (binary) per group
        lit_code = (
            d32
            | (_literal_context(d32, N, 2) << 14)
            | (_literal_context(d32, N, 3) << 20)
        )
    code = jnp.where(
        emit_cmd, cmd_code,
        jnp.where(is_dist_slot, sh(dcode), jnp.where(is_lit, lit_code, 0)),
    )
    rec1 = jnp.where(
        emit_cmd, cmd_rec1, jnp.where(is_dist_slot, sh(dval), 0)
    )
    rec0 = jnp.where(kind == K_PAD, 0, (kind << 28) | code)

    # column 0: the first command overall (first copy's CMD, or the
    # whole-chunk insert-only command when there are no copies)
    first_exists = nxt_prefix[:, 0:1] != BIG
    c0_rec0 = jnp.where(
        first_exists | (n_valid[:, None] > 0),
        (K_CMD << 28) | jnp.where(
            first_exists, nxt_prefix[:, 0:1] & 0xFFFF, t_prefix
        ),
        0,
    )
    c0_rec1 = jnp.where(
        first_exists,
        (nxt_insval[:, 0:1] & 0xFFFF) | ((nxt_cpval[:, 0:1] & 0xFFFF) << 16),
        t_rec1,
    )

    rec0_full = jnp.concatenate([c0_rec0, rec0], axis=1)
    rec1_full = jnp.concatenate([c0_rec1, rec1], axis=1)
    n_records = jnp.sum(((rec0_full >> 28) != K_PAD).astype(jnp.int32), axis=1)
    return rec0_full, rec1_full, n_records


# ---------------------------------------------------------------------------
# stage 8: Pallas bit-pack kernel (grid-streamed, 1 record per row)
# ---------------------------------------------------------------------------

PACK_BR = 256        # records per grid step
KEY_PAD = 0x7FFFFFFF


def _tab_chunks(nt: int) -> int:
    """Combined per-group symbol table chunks: nt*256 literal entries
    (context trees) + 704 cmd + 64 dist = 256*(nt+3) -> 2*nt+6 chunks."""
    return 2 * nt + 6


@_functools.lru_cache(maxsize=16)
def _jitted_stages(hash_stride: int, max_distance: int | None = None,
                   chain_depth: int = 2, lit_ctx: bool = False,
                   hash2: bool = False, lazy=(105, 175), min_gate: int = 9,
                   nbt: int = 1, pseg: int = 2048):
    import jax

    return jax.jit(
        _functools.partial(_device_stages, hash_stride=hash_stride,
                           max_distance=max_distance,
                           chain_depth=chain_depth, lit_ctx=lit_ctx,
                           nbt=nbt, pseg=pseg, hash2=hash2, lazy=lazy,
                           min_gate=min_gate)
    )


@_functools.lru_cache(maxsize=16)
def _jitted_pack(n_blocks: int, interpret: bool, n_groups: int = 1,
                 nt: int = 1, nbt: int = 1, pseg: int = 2048,
                 nseg: int = 1):
    import jax

    return jax.jit(
        _build_pack(n_blocks, interpret, n_groups, nt, nbt, pseg, nseg)
    )


@_functools.lru_cache(maxsize=16)
def _jitted_assemble(maxH: int, n_distinct: int):
    """Device stream assembly: one axis-0 co-sort splices header words,
    pack-kernel body words, and the final partial words into each lane's
    complete compressed stream (LE words) resident in HBM."""
    import jax

    import jax.numpy as jnp
    from jax import lax

    def asm(keys, words, status, h, hidx, hdr_stack_i32):
        # header columns from the distinct-header stack: (maxH, 8, 128)
        hdr = jax.lax.bitcast_convert_type(hdr_stack_i32, jnp.uint32)
        head_w = jnp.zeros((maxH, 8, 128), jnp.uint32)
        for j in range(n_distinct):
            head_w = jnp.where(
                (hidx == j)[None, :, :], hdr[j][:, None, None], head_w
            )
        rows = lax.broadcasted_iota(jnp.int32, (maxH, 8, 128), 0)
        head_k = jnp.where(rows < h[None], rows, jnp.int32(KEY_PAD))

        body_k = jnp.where(keys != KEY_PAD, keys + h[None], KEY_PAD)

        widx = status[0].astype(jnp.int32)
        avail = status[1].astype(jnp.int32)
        tail_k = jnp.stack(
            [
                jnp.where(avail > 32 * limb, h + widx + limb, KEY_PAD)
                for limb in range(2)
            ]
        )
        tail_w = status[2:4]

        allk = jnp.concatenate([head_k, body_k, tail_k], axis=0)
        allw = jnp.concatenate([head_w, words, tail_w], axis=0)
        _, sw = lax.sort(
            (allk, jax.lax.bitcast_convert_type(allw, jnp.int32)),
            dimension=0, num_keys=1,
        )
        return sw

    return jax.jit(asm)


def _build_pack(n_blocks: int, interpret: bool, n_groups: int = 1,
                nt: int = 1, nbt: int = 1, pseg: int = 2048, nseg: int = 1):
    if not interpret:
        from ..utils.interpret_gate import assert_validated
        assert_validated(__file__)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = (8, 128)
    BR = PACK_BR
    TABK = _tab_chunks(nt)
    CMD_TAB_OFF = nt * 256
    DIST_TAB_OFF = nt * 256 + 704
    NBC = -(-(nbt * 64) // 128) if nbt > 1 else 1  # cmap chunks per group

    def lookup(tab_ref, k, idx):
        lo = idx & 127
        hi = idx >> 7
        acc = jnp.zeros(S, jnp.int32)
        for c in range(k):
            g = jnp.take_along_axis(tab_ref[c * 8:(c + 1) * 8, :], lo, axis=1)
            acc = jnp.where(hi == c, g, acc)
        return acc

    def kernel(rec0_ref, rec1_ref, tab_ref, cmap_ref, consts_ref, grp_ref,
               init0_ref, initav_ref, *rest):
        if nbt > 1:
            sw_ref, stype_ref = rest[0], rest[1]
            rest = rest[2:]
        keys_ref, words_ref, status_ref, state = rest
        i = pl.program_id(0)
        # per-lane table-group base: group g's combined symbol table starts
        # at flat index g*TABK*128 (table clustering, mixed batches); with
        # block splitting the group's SIGNED-context flag rides at bit 8
        grpv = grp_ref[:]
        grp = grpv & 0xFF if nbt > 1 else grpv
        gbase = grp * (TABK * 128)

        @pl.when(i == 0)
        def _():
            state[0] = jax.lax.bitcast_convert_type(init0_ref[:], jnp.uint32)
            state[1] = jnp.zeros(S, jnp.uint32)
            state[2] = jnp.zeros(S, jnp.uint32)
            state[3] = jnp.zeros(S, jnp.uint32)
            state[4] = initav_ref[:].astype(jnp.uint32)
            state[5] = jnp.zeros(S, jnp.uint32)
            state[6] = jnp.zeros(S, jnp.uint32)

        def row_body(r, carry):
            b0, b1, b2, b3, avail, widx, ovf = carry
            rec0 = rec0_ref[r]
            rec1 = rec1_ref[r]
            kind = (rec0 >> 28) & 0xF
            code = rec0 & 0x3FFF
            is_cmd = kind == K_CMD
            is_lit = kind == K_LIT
            is_dist = kind == K_DIST
            live = kind != K_PAD

            if nbt > 1:
                # block-split literal tree: current block type comes from
                # the static row->segment map (dynamic scalar VMEM reads
                # are hardware-safe; scatter RMW is not — CLAUDE.md);
                # cmap maps (btype*64 + ctx) -> tree over NBC chunks
                seg = jnp.minimum(
                    jnp.maximum(i * BR + r - 1, 0) // pseg, nseg - 1
                )
                btype = stype_ref[seg]
                ctx_u = (rec0 >> 14) & 0x3F
                ctx_s = (rec0 >> 20) & 0x3F
                mode = (grpv >> 8) & 1
                ctx_g = jnp.where(mode > 0, ctx_s, ctx_u)
                cidx = btype * 64 + ctx_g
                lo = cidx & 127
                hi = cidx >> 7
                tree = jnp.zeros(S, jnp.int32)
                for g in range(n_groups):
                    for c in range(NBC):
                        chunk = cmap_ref[
                            (g * NBC + c) * 8:(g * NBC + c + 1) * 8, :
                        ]
                        got = jnp.take_along_axis(chunk, lo, axis=1)
                        tree = jnp.where((grp == g) & (hi == c), got, tree)
                lit_idx = tree * 256 + (code & 0xFF)
            elif nt > 1:
                # context-mapped literal tree: the record carries both
                # candidate context ids (UTF8 at bits 14-19, SIGNED at
                # 20-25); each group's cmap chunk selects its mode (flag at
                # entry 127) and maps ctx -> tree
                ctx_u = (rec0 >> 14) & 0x3F
                ctx_s = (rec0 >> 20) & 0x3F
                tree = jnp.zeros(S, jnp.int32)
                for g in range(n_groups):
                    chunk = cmap_ref[g * 8:(g + 1) * 8, :]
                    flag = jax.lax.broadcast_in_dim(
                        chunk[:, 127:128], S, (0, 1)
                    )
                    ctx_g = jnp.where(flag > 0, ctx_s, ctx_u)
                    got = jnp.take_along_axis(chunk, ctx_g & 127, axis=1)
                    tree = jnp.where(grp == g, got, tree)
                lit_idx = tree * 256 + (code & 0xFF)
            else:
                lit_idx = code & 0xFF
            tab_idx = gbase + jnp.where(
                is_cmd, CMD_TAB_OFF + code,
                jnp.where(is_dist, DIST_TAB_OFF + code, lit_idx),
            )
            ent = lookup(tab_ref, TABK * n_groups, jnp.where(live, tab_idx, 0))
            sym_nb = jnp.where(live, ent >> 16, 0)
            sym_bits = (ent & 0xFFFF).astype(jnp.uint32)

            # cmd extras: (ins_code, cp_code) from the command prefix
            cell = code >> 6
            ri = jnp.where(cell < 2, cell, cell - 2)
            ins_code = ((0x29850 >> (2 * ri)) & 3) * 8 + ((code >> 3) & 7)
            cp_code = ((0x26244 >> (2 * ri)) & 3) * 8 + (code & 7)
            ins_nb = jnp.take_along_axis(consts_ref[0:8, :], ins_code & 127, axis=1)
            cp_nb = jnp.take_along_axis(consts_ref[0:8, :], (cp_code + 64) & 127, axis=1)
            ex1_nb = jnp.where(
                is_cmd, ins_nb,
                jnp.where(is_dist & (code >= 16), ((code - 16) >> 1) + 1, 0),
            )
            ex1_v = jnp.where(
                is_cmd, (rec1 & 0xFFFF), jnp.where(is_dist, rec1, 0)
            ).astype(jnp.uint32)
            ex2_nb = jnp.where(is_cmd, cp_nb, 0)
            ex2_v = jnp.where(is_cmd, (rec1 >> 16) & 0xFFFF, 0).astype(jnp.uint32)

            def append(b0, b1, b2, b3, avail, v, nb):
                nbu = nb.astype(jnp.uint32) & 63
                v = v & ((jnp.uint32(1) << nbu) - 1)
                sh = avail & 31
                limb = avail >> 5
                lo = v << sh
                hi = jnp.where(sh > 0, v >> ((32 - sh) & 31), jnp.uint32(0))
                b0 = b0 | jnp.where(limb == 0, lo, jnp.uint32(0))
                b1 = b1 | jnp.where(
                    limb == 0, hi, jnp.where(limb == 1, lo, jnp.uint32(0))
                )
                b2 = b2 | jnp.where(
                    limb == 1, hi, jnp.where(limb == 2, lo, jnp.uint32(0))
                )
                b3 = b3 | jnp.where(
                    limb == 2, hi, jnp.where(limb == 3, lo, jnp.uint32(0))
                )
                return b0, b1, b2, b3, avail + nbu

            if nbt > 1:
                # flagged literal (bit 26): the block switch that ends the
                # previous block precedes this literal's code — append the
                # host-precomputed type+length+extra pattern (<=27 bits,
                # nbits in the word's top 5 bits; 0 on suppressed flags)
                sww = sw_ref[seg]
                sw_nb = jnp.where(
                    ((rec0 >> 26) & 1) > 0, (sww >> 27).astype(jnp.int32), 0
                )
                b0, b1, b2, b3, avail = append(
                    b0, b1, b2, b3, avail,
                    sww & jnp.uint32(0x07FFFFFF), sw_nb,
                )
            b0, b1, b2, b3, avail = append(b0, b1, b2, b3, avail, sym_bits, sym_nb)
            b0, b1, b2, b3, avail = append(b0, b1, b2, b3, avail, ex1_v, ex1_nb)
            b0, b1, b2, b3, avail = append(b0, b1, b2, b3, avail, ex2_v, ex2_nb)

            # one emission slot per row: in stream-ordered records a CMD row
            # (the only >32-bit append, <=48 bits) is always >= 4 rows from
            # the next one with draining pad rows between, so the buffer
            # level stays bounded (~51 bits); ovf flags any violation.
            emit = avail >= 32
            keys_ref[r] = jnp.where(
                emit, widx.astype(jnp.int32), jnp.int32(KEY_PAD)
            )
            words_ref[r] = b0
            b0 = jnp.where(emit, b1, b0)
            b1 = jnp.where(emit, b2, b1)
            b2 = jnp.where(emit, b3, b2)
            b3 = jnp.where(emit, jnp.uint32(0), b3)
            avail = avail - jnp.where(emit, 32, 0)
            widx = widx + jnp.where(emit, jnp.uint32(1), jnp.uint32(0))
            ovf = ovf | (avail > 80).astype(jnp.uint32)
            return (b0, b1, b2, b3, avail, widx, ovf)

        carry = (
            state[0], state[1], state[2], state[3],
            state[4], state[5], state[6],
        )
        carry = jax.lax.fori_loop(0, BR, row_body, carry)
        for k in range(7):
            state[k] = carry[k]
        status_ref[0] = carry[5]                      # widx
        status_ref[1] = carry[4]                      # avail
        status_ref[2] = carry[0]                      # b0 (final partial bits)
        status_ref[3] = carry[1]                      # b1
        status_ref[4] = carry[2]                      # b2
        status_ref[5] = carry[6]                      # overflow flag
        for k in range(6, 8):
            status_ref[k] = jnp.zeros(S, jnp.uint32)

    def runner(rec0, rec1, tab, cmap, consts, grp, init0, initav,
               sw=None, stype=None):
        grid = (n_blocks,)
        in_specs = [
            pl.BlockSpec((BR, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 8, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups * TABK * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_groups * NBC * 8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args = [rec0, rec1, tab, cmap, consts, grp, init0, initav]
        if nbt > 1:
            in_specs += [
                pl.BlockSpec((nseg, 8, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((nseg, 8, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ]
            args += [sw, stype]
        return pl.pallas_call(
            kernel,
            grid=grid,
            out_shape=(
                jax.ShapeDtypeStruct((n_blocks * BR, 8, 128), jnp.int32),
                jax.ShapeDtypeStruct((n_blocks * BR, 8, 128), jnp.uint32),
                jax.ShapeDtypeStruct((8, 8, 128), jnp.uint32),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((BR, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, 8, 128), lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[pltpu.VMEM((7, 8, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(*args)

    return runner


def _pack_consts() -> np.ndarray:
    c = np.zeros(128, dtype=np.int32)
    c[0:24] = np.asarray(INSERT_LENGTH_N_BITS, np.int32)
    c[64:88] = np.asarray(COPY_LENGTH_N_BITS, np.int32)
    return np.broadcast_to(c[None, :], (8, 128)).copy()


# ---------------------------------------------------------------------------
# stage 7 + 9: host-side tables, headers, orchestration, assembly
# ---------------------------------------------------------------------------

DIST_ALPHABET = 16 + 0 + (48 << 0)  # npostfix=0, ndirect=0


# flat per-group histogram layout for the device bincount:
# [64*256 lit(ctx,byte) | 704 cmd | 64 dist] = 17152 bins per group + 1 dump
_HIST_STRIDE_DEFAULT = 8


def _hg(nbt: int) -> int:
    """Flat per-group bins: nbt*64 (type,ctx) x 256 lit + 704 cmd + 64 dist."""
    return nbt * 64 * 256 + NUM_COMMAND_SYMBOLS + 64


@_functools.lru_cache(maxsize=8)
def _jitted_group_hist(n_groups: int, stride: int, nbt: int = 1):
    """Device histogrammer: strided records + per-lane group ids -> flat
    (G*hg+1,) counts via one bincount (scatter-add).  Replaces bulk
    sample fetches: the host only downloads the compact counts, so dense
    histograms cost ~30 ms of device scatter instead of an 8 MB transfer.
    `signed_mode` selects per lane which of the record's two context-id
    fields (UTF8 at bits 14-19, SIGNED at 20-25) keys the literal bins.
    With block splitting, `btype` (per strided column, precomputed from
    the static column->segment map) extends the literal key to
    (type, ctx, byte)."""
    import jax
    import jax.numpy as jnp

    hg = _hg(nbt)
    lit_bins = nbt * 64 * 256

    def hist(rec0, grp, signed_mode, btype=None):
        sub = rec0[:, ::stride]
        kind = (sub >> 28) & 0xF
        code = sub & 0x3FFF
        ctx = jnp.where(
            signed_mode[:, None] > 0, (sub >> 20) & 0x3F, (sub >> 14) & 0x3F
        )
        if nbt > 1:
            ctx = btype * 64 + ctx
        base = grp[:, None] * hg
        key = jnp.where(
            kind == K_LIT, base + ctx * 256 + (code & 0xFF),
            jnp.where(
                kind == K_CMD, base + lit_bins + jnp.clip(code, 0, 703),
                jnp.where(
                    kind == K_DIST,
                    base + lit_bins + 704 + jnp.clip(code, 0, 63),
                    n_groups * hg,
                ),
            ),
        )
        return jnp.bincount(key.reshape(-1), length=n_groups * hg + 1)

    return jax.jit(hist)


def _split_group_hist(flat: np.ndarray, g: int, nbt: int = 1):
    """(lit_hists (nbt*64,256), cmd_hist, dist_hist) for group g."""
    hg = _hg(nbt)
    lit_bins = nbt * 64 * 256
    seg = flat[g * hg : (g + 1) * hg].astype(np.int64)
    lit_hists = seg[:lit_bins].reshape(nbt * 64, 256)
    cmd_hist = seg[lit_bins : lit_bins + 704] * 8 + 1
    dist_hist = seg[lit_bins + 704 : lit_bins + 704 + 64] * 8 + 1
    return lit_hists, cmd_hist, dist_hist


def _cluster_rows(hists: np.ndarray, k: int, iters: int = 8):
    """Weighted k-means over normalized histogram rows; returns map (rows,)
    into [0, k') with k' <= k, renumbered densely."""
    n = hists.shape[0]
    w = hists.sum(axis=1)
    feats = hists / np.maximum(w, 1)[:, None]
    order = np.argsort(-w)
    centers = feats[order[:: max(1, n // k)]][:k].copy()
    g = np.zeros(n, np.int64)
    for _ in range(iters):
        d = ((feats[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        g = d.argmin(axis=1)
        for j in range(centers.shape[0]):
            sel = g == j
            if sel.any() and w[sel].sum() > 0:
                centers[j] = (
                    (feats[sel] * w[sel][:, None]).sum(axis=0)
                    / max(w[sel].sum(), 1)
                )
    used = sorted(set(g.tolist()))
    remap = {j: i for i, j in enumerate(used)}
    return np.asarray([remap[int(x)] for x in g], np.int64)


def _group_tables_from_hists(lit_hists, cmd_hist, dist_hist, nt: int):
    """One table group's entropy codes: (lit_tables [<=nt], cmap (64,),
    cmd, dist).  Literal contexts (UTF8 mode) cluster into <= nt trees
    via the reference's exact bit-cost agglomerative clustering
    (cluster.ts:317-378, reused from the host encoder) — measured ~2pt
    better ratio than L2 k-means on font content."""
    # native (C++) table build when available: bit-identical to the python
    # implementations (tests/test_native_tables.py), ~150x faster - the
    # per-batch host table step otherwise caps encode throughput
    try:
        from ..native import (
            build_huffman_code_native as build_huffman_code,
            cluster_context_map_native,
        )

        def _cluster_ctx(hists_list, rows, syms):
            return cluster_context_map_native(hists_list, rows, syms)
    except Exception:  # pragma: no cover - toolchain-less hosts
        from ..encode.entropy import build_huffman_code
        from ..encode.metablock_full import (
            _cluster_and_build_context_map as _cluster_ctx,
        )

    n_rows = lit_hists.shape[0]   # 64 contexts, x NBT block types if split
    if nt == 1:
        cmap = np.zeros(n_rows, np.int64)
        tree_hists = lit_hists.sum(axis=0, keepdims=True)
    else:
        n_used, cm = _cluster_ctx(
            lit_hists.tolist(), n_rows, NUM_LITERAL_SYMBOLS
        )
        cmap = np.asarray(cm, np.int64)
        if n_used > nt:
            # cap at the kernel's tree budget: fold the smallest-weight
            # clusters into their nearest (bit-cost) survivor
            w = np.zeros(n_used, np.int64)
            for c in range(n_rows):
                w[cmap[c]] += int(lit_hists[c].sum())
            keep = np.argsort(-w)[:nt]
            keep_set = set(keep.tolist())
            remap = {}
            for j in range(n_used):
                if j in keep_set:
                    remap[j] = j
            hs = {j: lit_hists[cmap == j].sum(axis=0) for j in range(n_used)}

            def cost(h):
                t = h.sum()
                nz = h[h > 0]
                return float(t * np.log2(max(t, 1)) - (nz * np.log2(nz)).sum()) \
                    if t > 0 else 0.0

            for j in range(n_used):
                if j in keep_set:
                    continue
                best, bestd = None, None
                for k in keep:
                    d = cost(hs[j] + hs[int(k)]) - cost(hs[int(k)])
                    if bestd is None or d < bestd:
                        best, bestd = int(k), d
                remap[j] = best
            cmap = np.asarray([remap[int(x)] for x in cmap], np.int64)
            used = sorted(set(cmap.tolist()))
            dense = {j: i for i, j in enumerate(used)}
            cmap = np.asarray([dense[int(x)] for x in cmap], np.int64)
        n_used = int(cmap.max()) + 1
        tree_hists = np.zeros((n_used, 256), np.int64)
        for c in range(n_rows):
            tree_hists[cmap[c]] += lit_hists[c]
    lits = [
        build_huffman_code(h * 8 + 1, NUM_LITERAL_SYMBOLS) for h in tree_hists
    ]
    return dict(
        lits=lits, cmap=cmap,
        cmd=build_huffman_code(cmd_hist, NUM_COMMAND_SYMBOLS),
        dist=build_huffman_code(dist_hist, DIST_ALPHABET),
    )


def _cluster_lanes(rec0_sample: np.ndarray, n_groups: int,
                   n_chunks: int) -> np.ndarray:
    """Cluster lanes by literal-histogram shape into <= n_groups table
    groups (group id per lane).

    The analog of the reference's per-metablock histogram clustering
    (cluster.ts:317-378) at batch granularity: mixed batches (text + font)
    stop paying for one compromise table set.  Plain numpy k-means on
    32-bin projected literal histograms from the coarse record sample —
    the host cost is microscopic next to the device stages.
    """
    B = rec0_sample.shape[0]
    group = np.zeros(B, np.int64)
    kinds = (rec0_sample >> 28) & 0xF
    feats = np.zeros((B, 32), np.int64)
    for lane in range(min(B, n_chunks)):
        lc = rec0_sample[lane][kinds[lane] == K_LIT] & 0xFF
        np.add.at(feats[lane], lc >> 3, 1)
    if n_groups > 1:
        group[:n_chunks] = _cluster_rows(feats[:n_chunks], n_groups)
    # per-group literal context mode: binary-looking groups (frequent
    # high bytes) use the SIGNED context, text the UTF8 context — the
    # device analog of the reference's chooseContextMode (context.ts:179)
    n_used = int(group[:n_chunks].max()) + 1
    modes = []
    for j in range(n_used):
        sel = group[:n_chunks] == j
        f = feats[:n_chunks][sel].sum(axis=0)
        total = max(int(f.sum()), 1)
        modes.append(3 if int(f[16:].sum()) / total > 0.25 else 2)
    return group, modes


def _plan_block_switches(seg_type: np.ndarray, seg_litcnt: np.ndarray,
                         n_chunks: int, group_of: np.ndarray,
                         n_groups: int, nbt: int):
    """Turn per-segment types into concrete block-switch plans (host).

    Vectorized over lanes, looping only over the <=32 segments: merge
    same-type neighbour segments, cap block length at 16624 literals (the
    largest 13-extra-bit block count — keeps every in-stream switch within
    the 27-bit record budget), compute forward block lengths, and build
    per-GROUP type/length prefix trees.  Block type ids are permuted per
    lane (swap 0 <-> lane's first type) because RFC 7932 fixes the first
    block's type at 0 (block-splitter.ts analog: splits there always start
    at type 0); the header's context map is permuted the same way so the
    kernel keeps using global ids.

    Returns (sw_words (B, NSEG) u32 = bit pattern | nbits<<27,
    first_blen (B,), t0 (B,), group_splits[g] dict).
    """
    from ..constants import BLOCK_LENGTH_N_BITS, BLOCK_LENGTH_OFFSET
    from ..encode.bitwriter import BitWriter
    from ..encode.entropy import build_and_store_huffman_tree

    B, NSEG = seg_type.shape
    MAX_BLEN = int(BLOCK_LENGTH_OFFSET[25]) - 1   # 16624
    cnts = seg_litcnt.astype(np.int64)
    mark = np.zeros((B, NSEG), bool)
    mark[:, 0] = True
    cur = seg_type[:, 0].copy()
    run = cnts[:, 0].copy()
    for s in range(1, NSEG):
        c = cnts[:, s]
        sw = (c > 0) & ((seg_type[:, s] != cur) | (run + c > MAX_BLEN))
        mark[:, s] = sw
        cur = np.where(sw, seg_type[:, s], cur)
        run = np.where(sw, 0, run) + c
    blen = np.zeros((B, NSEG), np.int64)
    acc = np.zeros(B, np.int64)
    for s in range(NSEG - 1, -1, -1):
        acc = acc + cnts[:, s]
        blen[:, s] = np.where(mark[:, s], acc, 0)
        acc = np.where(mark[:, s], 0, acc)

    t0 = seg_type[:, 0].copy()
    ptype = np.where(seg_type == t0[:, None], 0,
                     np.where(seg_type == 0, t0[:, None], seg_type))
    tsym = ptype + 2     # always-explicit type codes (valid, simple)
    lcode = np.clip(
        np.searchsorted(BLOCK_LENGTH_OFFSET, blen, side="right") - 1, 0, 25
    )
    extra = blen - BLOCK_LENGTH_OFFSET[lcode]
    nb_extra = BLOCK_LENGTH_N_BITS[lcode]

    in_batch = np.zeros(B, bool)
    in_batch[:n_chunks] = True
    body_mark = mark.copy()
    body_mark[:, 0] = False   # block 0 is declared in the header
    sw_words = np.zeros((B, NSEG), np.uint32)
    group_splits = []
    for g in range(n_groups):
        lanes = in_batch & (group_of[:B] == g)
        bm = body_mark & lanes[:, None]
        am = mark & lanes[:, None]
        thist = np.bincount(tsym[bm], minlength=nbt + 2).tolist()
        lhist = np.bincount(lcode[am], minlength=26).tolist()
        if sum(thist) == 0:
            thist[2] = 1  # no switches in group: still store a valid tree
        if sum(lhist) == 0:
            lhist[0] = 1

        def trees(th, lh):
            wtmp = BitWriter()
            td, tb = build_and_store_huffman_tree(wtmp, th, nbt + 2)
            ld, lb = build_and_store_huffman_tree(wtmp, lh, 26)
            return td, tb, ld, lb

        td, tb, ld, lb = trees(thist, lhist)
        tdn, tbn = np.asarray(td), np.asarray(tb)
        ldn, lbn = np.asarray(ld), np.asarray(lb)
        nbits = tdn[np.clip(tsym, 0, nbt + 1)] + ldn[lcode] + nb_extra
        if bm.any() and int(nbits[bm].max()) > 27:
            # pathological tree depths: rebuild from flat histograms so
            # every used symbol gets a ~log2(n) code (<= 27 total bits)
            thist = [1 if c else 0 for c in thist]
            lhist = [1 if c else 0 for c in lhist]
            td, tb, ld, lb = trees(thist, lhist)
            tdn, tbn = np.asarray(td), np.asarray(tb)
            ldn, lbn = np.asarray(ld), np.asarray(lb)
            nbits = tdn[np.clip(tsym, 0, nbt + 1)] + ldn[lcode] + nb_extra
            assert int(nbits[bm].max()) <= 27
        tsymc = np.clip(tsym, 0, nbt + 1)
        pat = (
            tbn[tsymc].astype(np.int64)
            | (lbn[lcode].astype(np.int64) << tdn[tsymc].astype(np.int64))
            | (extra << (tdn[tsymc] + ldn[lcode]).astype(np.int64))
        )
        w_g = (pat & 0x7FFFFFF) | (nbits.astype(np.int64) << 27)
        sw_words = np.where(bm, w_g.astype(np.uint32), sw_words)
        group_splits.append(dict(thist=thist, lhist=lhist))
    first_blen = blen[:, 0]
    return sw_words, first_blen, t0, group_splits


def _header_bits(mlen: int, lgwin: int, grp_tables: dict,
                 split: dict | None = None) -> "object":
    """Stream + metablock header + tree declarations for one chunk.

    Single block type per category (or NBT literal block types when
    `split` is given: type + length trees and the first block length per
    metablock_full._build_and_store_block_split_code's layout); NT
    context-mapped literal trees when the group has them.  Returns the
    BitWriter."""
    from ..constants import BLOCK_LENGTH_N_BITS, BLOCK_LENGTH_OFFSET
    from ..encode.bitwriter import BitWriter, encode_window_bits, store_var_len_uint8
    from ..encode.context_map import encode_context_map
    from ..encode.entropy import build_and_store_huffman_tree, store_huffman_tree
    from ..encode.metablock import store_compressed_metablock_header

    lits = grp_tables["lits"]
    nt = len(lits)
    nbt = split["nbt"] if split else 1
    w = BitWriter()
    nb, val = encode_window_bits(lgwin, False)
    w.write(nb, val)
    store_compressed_metablock_header(w, True, mlen)
    if nbt > 1:
        store_var_len_uint8(w, nbt - 1)      # NBLTYPESL - 1
        _, _ = build_and_store_huffman_tree(w, split["thist"], nbt + 2)
        ld, lb = build_and_store_huffman_tree(w, split["lhist"], 26)
        # first block switch: length only (type is implicitly 0)
        fb = int(split["first_blen"])
        code = int(np.searchsorted(BLOCK_LENGTH_OFFSET, fb, side="right")) - 1
        w.write(ld[code], lb[code])
        w.write(int(BLOCK_LENGTH_N_BITS[code]),
                fb - int(BLOCK_LENGTH_OFFSET[code]))
    else:
        store_var_len_uint8(w, 0)  # NBLTYPESL - 1
    store_var_len_uint8(w, 0)  # NBLTYPESI - 1
    store_var_len_uint8(w, 0)  # NBLTYPESD - 1
    w.write(2, 0)              # NPOSTFIX
    w.write(4, 0)              # NDIRECT >> NPOSTFIX
    # context mode: per-group choice (UTF8/SIGNED) when context-mapped
    mode = grp_tables.get("mode", 0) if nt > 1 else 0
    for _ in range(nbt):
        w.write(2, mode)
    cmap = list(grp_tables["cmap"])
    if nbt > 1:
        # permute type rows 0 <-> t0 (first block must be type 0; the
        # in-stream switch symbols use the same permutation)
        t0 = int(split["t0"])
        rows = list(range(nbt))
        rows[0], rows[t0] = rows[t0], rows[0]
        cmap = [cmap[r * 64 + c] for r in rows for c in range(64)]
    encode_context_map(w, cmap, nt)
    encode_context_map(w, [0, 0, 0, 0], 1)   # trivial distance cmap
    for lit in lits:
        store_huffman_tree(w, lit[0], NUM_LITERAL_SYMBOLS, lit[2], lit[3])
    cmd = grp_tables["cmd"]
    dist = grp_tables["dist"]
    store_huffman_tree(w, cmd[0], NUM_COMMAND_SYMBOLS, cmd[2], cmd[3])
    store_huffman_tree(w, dist[0], DIST_ALPHABET, dist[2], dist[3])
    return w


def _pack_symbol_table(grp_tables: dict, nt: int) -> np.ndarray:
    """Combined (nbits<<16|bits) table, row-replicated (TABK*8, 128):
    [nt x 256 literal trees | 704 cmd | 64 dist]."""
    tabk = _tab_chunks(nt)
    flat = np.zeros(tabk * 128, dtype=np.int32)

    def put(off, depths, bits):
        d = np.asarray(depths, np.int32)
        b = np.asarray(bits, np.int32)
        flat[off : off + d.shape[0]] = (d << 16) | b

    for t, lit in enumerate(grp_tables["lits"]):
        put(t * 256, lit[0], lit[1])
    put(nt * 256, grp_tables["cmd"][0], grp_tables["cmd"][1])
    put(nt * 256 + 704, grp_tables["dist"][0], grp_tables["dist"][1])
    chunks = flat.reshape(tabk, 1, 128)
    return np.broadcast_to(chunks, (tabk, 8, 128)).reshape(tabk * 8, 128).copy()


def _to_sub_lanes(arr_bn: "object"):
    """(B, R) device array -> (R, 8, 128), stream s = i*128+j."""
    import jax.numpy as jnp

    B, R = arr_bn.shape
    return jnp.transpose(arr_bn, (1, 0)).reshape(R, 8, 128)


@dataclass
class DeviceEncodeResult:
    streams: list[bytes]
    device_seconds: float | None = None


def _segment_stats(data_arr, is_lit, nbt: int, pseg: int, feat_stride: int = 8):
    """Per-position-segment literal stats + device k-means block typing.

    TPU-native analog of the reference's block-split DP + clustering
    (block-splitter.ts:117-211, cluster.ts): instead of a sequential DP
    over symbol positions, chunks are cut at FIXED position segments whose
    first literal is the (potential) block boundary — every flag/count is
    then a reshape-reduce (no gathers), and typing is a small k-means over
    coarse per-segment literal histograms whose distance/update steps are
    matmuls (MXU).  Returns (seg_type (B,NSEG) i32, seg_litcnt (B,NSEG)
    i32, first-lit flag (B,N) i32).
    """
    import jax
    import jax.numpy as jnp

    B, Npad = data_arr.shape
    N = Npad - (MATCH_CAP + 4)
    NSEG = N // pseg
    lit3 = is_lit.reshape(B, NSEG, pseg)
    seg_litcnt = lit3.sum(axis=2).astype(jnp.int32)
    cum = jnp.cumsum(lit3, axis=2)
    first = ((lit3 > 0) & (cum == 1)).reshape(B, N).astype(jnp.int32)

    # coarse literal histograms (32 bins, strided) per segment
    FS = feat_stride
    bins = (data_arr[:, :N:FS].astype(jnp.int32) >> 3).reshape(
        B, NSEG, pseg // FS
    )
    mask = (is_lit[:, ::FS] > 0).reshape(B, NSEG, pseg // FS)
    feats = jnp.stack(
        [jnp.sum(mask & (bins == v), axis=2) for v in range(32)], axis=2
    ).astype(jnp.float32)                                   # (B, NSEG, 32)

    # weighted k-means init, deterministic: centers seeded from a
    # weight-sorted stride so heavy AND diverse segments are represented
    M = B * NSEG
    X = feats.reshape(M, 32)
    wgt = X.sum(axis=1)
    Xn = X / jnp.maximum(wgt, 1.0)[:, None]
    order = jnp.argsort(-wgt)
    seed_idx = order[:: max(1, M // nbt)][:nbt]
    C = Xn[seed_idx]                                        # (nbt, 32)
    assign = jnp.zeros((M,), jnp.int32)
    for _ in range(4):
        d = ((Xn[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = jnp.argmin(d, axis=1).astype(jnp.int32)
        onehot = (assign[:, None] == jnp.arange(nbt)[None, :]).astype(
            jnp.float32
        )
        sums = onehot.T @ (Xn * wgt[:, None])
        wsum = onehot.T @ wgt[:, None]
        C = sums / jnp.maximum(wsum, 1e-6)

    # entropy-cost Viterbi refinement — the device analog of the
    # reference's FindBlocks DP (block-splitter.ts:117-211): each segment
    # pays its literals' bits under its type's model, a type change pays
    # the switch bits.  Types are BATCH-global (shared trees per table
    # group) but the path is per lane; 3 refinement rounds re-fit the
    # models from the assignment like the reference's refinement loop.
    # feats are FS-strided samples, so the switch penalty is scaled by FS.
    SW_BITS = 36.0 / feat_stride   # switch + amortized per-type tree cost
    cost_lane = None
    for _ in range(3):
        onehot = (assign[:, None] == jnp.arange(nbt)[None, :]).astype(
            jnp.float32
        )
        H = onehot.T @ X + 1.0 / 256.0                     # (nbt, 32)
        logp = jnp.log2(H / H.sum(axis=1, keepdims=True))
        cost = -(feats.reshape(M, 32) @ logp.T)            # (M, nbt) bits
        cost_lane = cost.reshape(B, NSEG, nbt)

        # forward pass (unrolled: NSEG <= 64 tiny (B,nbt) steps)
        dps = [cost_lane[:, 0, :]]
        d_ = dps[0]
        for s in range(1, NSEG):
            best_any = jnp.min(d_, axis=1, keepdims=True)
            d_ = cost_lane[:, s, :] + jnp.minimum(d_, best_any + SW_BITS)
            dps.append(d_)
        dpst = jnp.stack(dps, axis=1)                      # (B, NSEG, nbt)
        last = jnp.argmin(dps[-1], axis=1).astype(jnp.int32)
        types = [last]
        cur = last
        for s in range(NSEG - 1, 0, -1):
            prev_dp = dpst[:, s - 1, :]                    # (B, nbt)
            stay_cost = jnp.take_along_axis(
                prev_dp, cur[:, None], axis=1
            )[:, 0]
            best_prev = jnp.argmin(prev_dp, axis=1).astype(jnp.int32)
            best_cost = jnp.take_along_axis(
                prev_dp, best_prev[:, None], axis=1
            )[:, 0]
            cur = jnp.where(
                best_cost + SW_BITS < stay_cost, best_prev, cur
            )
            types.append(cur)
        seg_type = jnp.stack(types[::-1], axis=1)          # (B, NSEG)
        assign = seg_type.reshape(M)
    return seg_type, seg_litcnt, first


def _device_stages(data_arr, n_valid, hash_stride: int = 1,
                   max_distance: int | None = None, chain_depth: int = 2,
                   lit_ctx: bool = False, nbt: int = 1, pseg: int = 2048,
                   hash2: bool = False, lazy=(105, 175), min_gate: int = 9):
    """All XLA stages fused under one jit: records ready for packing."""
    import jax.numpy as jnp

    mlen, mdist = find_matches(data_arr, n_valid, hash_stride, max_distance,
                               chain_depth, hash2)
    is_cs, is_lit, dcode_short = greedy_parse(mlen, mdist, n_valid,
                                              lazy, min_gate)
    rec0, rec1, n_rec = build_records(
        data_arr, mlen, mdist, is_cs, is_lit, dcode_short, n_valid,
        lit_ctx=lit_ctx,
    )
    if nbt <= 1:
        return rec0, rec1, n_rec
    seg_type, seg_litcnt, first = _segment_stats(data_arr, is_lit, nbt, pseg)
    # flag the first literal record of each segment (bit 26); record row
    # p+1 holds position p (column 0 is the prepended first command)
    B = rec0.shape[0]
    flag_rec = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), first], axis=1
    )
    rec0 = rec0 | (flag_rec << 26)
    return rec0, rec1, n_rec, seg_type, seg_litcnt


def _encode_start(data: bytes, chunk_size: int, hash_stride: int,
                  sample_stride: int, max_distance: int | None = None,
                  chain_depth: int = 2, device_input=None,
                  lit_ctx: bool = False,
                  hist_stride: int = _HIST_STRIDE_DEFAULT,
                  block_types: int = 1, block_seg: int = 2048,
                  hash2: bool = False, lazy=(105, 175),
                  min_gate: int = 9):
    """Host prep + dispatch of the XLA match/parse/record stages.

    Returns a state dict; the device work is in flight when this returns
    (nothing has been fetched), so several devices can run concurrently.
    device_input optionally passes pre-staged (data_arr, n_valid) device
    arrays (callers that re-encode resident data skip the upload).
    """
    import jax.numpy as jnp

    assert chunk_size <= CHUNK_N and chunk_size % CELL == 0
    n_chunks = -(-len(data) // chunk_size)
    assert n_chunks <= B_LANES, "batch too large; split input"

    n_valid_np = np.zeros(B_LANES, dtype=np.int32)
    full = len(data) // chunk_size
    n_valid_np[:full] = chunk_size
    if full < n_chunks:
        n_valid_np[full] = len(data) - full * chunk_size

    if device_input is None:
        pad = chunk_size * B_LANES - len(data)
        arr = np.frombuffer(data + b"\x00" * pad, dtype=np.uint8).reshape(
            B_LANES, chunk_size
        )
        # zero tail: windows never read across chunk ends (chunks are
        # independent streams; match lengths are clamped to n_valid anyway)
        data_np = np.concatenate(
            [arr, np.zeros((B_LANES, MATCH_CAP + 4), dtype=np.uint8)], axis=1
        )
        data_arr = jnp.asarray(data_np)
        n_valid = jnp.asarray(n_valid_np)
    else:
        data_arr, n_valid = device_input

    nbt = block_types
    if nbt > 1:
        assert lit_ctx, "block_types > 1 requires lit_ctx records"
        assert chunk_size % block_seg == 0 and nbt <= 7
    stages = _jitted_stages(hash_stride, max_distance, chain_depth, lit_ctx,
                            hash2, tuple(lazy), min_gate, nbt, block_seg)
    outs = stages(data_arr, n_valid)
    rec0, rec1, n_rec = outs[:3]
    seg_type, seg_litcnt = (outs[3], outs[4]) if nbt > 1 else (None, None)
    rec0_sample_dev = rec0[:, ::sample_stride]  # stays async
    return dict(
        data=data, chunk_size=chunk_size, n_chunks=n_chunks,
        n_valid_np=n_valid_np, rec0=rec0, rec1=rec1,
        rec0_sample_dev=rec0_sample_dev, hist_stride=hist_stride,
        block_types=nbt, block_seg=block_seg,
        seg_type=seg_type, seg_litcnt=seg_litcnt,
    )


def encode_device_batch(
    data: bytes,
    *,
    chunk_size: int = CHUNK_N,
    lgwin: int = 22,
    interpret: bool = False,
    sample_stride: int = 256,
    hash_stride: int = 1,
    max_distance: int | None = None,
    chain_depth: int = 2,
    table_groups: int = 1,
    lit_ctx_trees: int = 1,
    hist_stride: int = _HIST_STRIDE_DEFAULT,
    block_types: int = 1,
    block_seg: int = 2048,
    hash2: bool = False,
    lazy=(105, 175),
    min_gate: int = 9,
) -> list[bytes]:
    """Encode `data` on the TPU as B<=1024 chunk streams.

    table_groups=1 gives batch-identical Huffman tables (fastest decode
    path); >1 clusters lanes into that many table groups for better ratio
    on mixed content (decoded via per-group tables, preflight_binned).
    lit_ctx_trees>1 turns on context modeling: literals are coded with up
    to that many context-mapped trees (UTF8 context mode, contexts
    clustered per table group); the streams decode on device via the v3
    fused kernel (ops/pallas_decode3.py) or on host.
    block_types>1 adds intra-chunk literal block splitting (the device
    analog of block-splitter.ts:117-211 — see _segment_stats /
    _plan_block_switches): chunks are segmented every `block_seg` bytes,
    segments are typed by device k-means, and block-switch commands are
    emitted in-stream.  Requires lit_ctx_trees > 1."""
    data = bytes(data)
    if len(data) == 0:
        from ..encode.api import _encode_empty

        return [_encode_empty()]
    state = _encode_start(data, chunk_size, hash_stride, sample_stride,
                          max_distance, chain_depth,
                          lit_ctx=lit_ctx_trees > 1,
                          hist_stride=hist_stride,
                          block_types=block_types, block_seg=block_seg,
                          hash2=hash2, lazy=lazy, min_gate=min_gate)
    _encode_mid(state, lgwin, interpret, table_groups, lit_ctx_trees)
    return _encode_finish(state)


def _encode_mid(state: dict, lgwin: int, interpret: bool,
                table_groups: int = 1, lit_ctx_trees: int = 1) -> None:
    """Fetch record samples, build shared tables + headers on the host,
    then dispatch the Pallas pack kernel and the compaction sort.

    table_groups > 1 clusters the batch's lanes into that many Huffman
    table groups (per-lane group base in the pack kernel); the decode side
    bins the resulting streams by table signature (preflight_binned)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    data = state["data"]
    chunk_size = state["chunk_size"]
    n_chunks = state["n_chunks"]
    n_valid_np = state["n_valid_np"]
    rec0, rec1 = state["rec0"], state["rec1"]
    nt = lit_ctx_trees
    nbt = state.get("block_types", 1)
    pseg = state.get("block_seg", 2048)
    nseg = chunk_size // pseg if nbt > 1 else 1
    tabk = _tab_chunks(nt)

    # ---- lane clustering (coarse host sample) + dense device hists ----
    rec0_sample = np.asarray(state["rec0_sample_dev"])
    group_of, group_modes = _cluster_lanes(rec0_sample, table_groups, n_chunks)
    n_used_groups = len(group_modes)
    signed_mode = np.asarray(
        [group_modes[g] == 3 for g in group_of], np.int32
    )
    split_args = ()
    if nbt > 1:
        seg_type_np = np.asarray(state["seg_type"])
        seg_litcnt_np = np.asarray(state["seg_litcnt"])
        sw_words, first_blen, t0_np, group_splits = _plan_block_switches(
            seg_type_np, seg_litcnt_np, n_chunks, group_of,
            n_used_groups, nbt,
        )
        # static column -> segment map for the strided histogram sample
        # (record row j holds position j-1; column 0 is the first command)
        cols = np.arange(0, rec0.shape[1], state["hist_stride"])
        seg_cols = np.clip((cols - 1) // pseg, 0, nseg - 1)
        split_args = (jnp.asarray(seg_type_np[:, seg_cols]),)
    hist_fn = _jitted_group_hist(n_used_groups, state["hist_stride"], nbt)
    flat_hist = np.asarray(
        hist_fn(rec0, jnp.asarray(group_of.astype(np.int32)),
                jnp.asarray(signed_mode), *split_args)
    )
    tables = [
        _group_tables_from_hists(*_split_group_hist(flat_hist, j, nbt), nt)
        for j in range(n_used_groups)
    ]
    for j, t in enumerate(tables):
        t["mode"] = group_modes[j] if nt > 1 else 0
    tab_np = np.concatenate([_pack_symbol_table(t, nt) for t in tables])
    NBC = -(-(nbt * 64) // 128) if nbt > 1 else 1
    cmap_np = np.zeros((table_groups * NBC * 8, 128), np.int32)
    for j, t in enumerate(tables):
        if nbt > 1:
            cm = np.zeros(NBC * 128, np.int32)
            cm[: nbt * 64] = t["cmap"]
            for c in range(NBC):
                cmap_np[(j * NBC + c) * 8:(j * NBC + c + 1) * 8, :] = (
                    cm[c * 128:(c + 1) * 128][None, :]
                )
        else:
            cmap_np[j * 8:(j + 1) * 8, :64] = t["cmap"][None, :]
            cmap_np[j * 8:(j + 1) * 8, 127] = 1 if t.get("mode") == 3 else 0
    # pad the table stack to the requested group count (static kernel shape)
    if len(tables) < table_groups:
        tab_np = np.concatenate(
            [tab_np] + [tab_np[: tabk * 8]] * (table_groups - len(tables))
        )

    header_cache: dict[tuple, bytes] = {}

    def header_for(mlen_val: int, grp: int, s: int):
        if nbt > 1:
            key = (mlen_val, grp, int(first_blen[s]), int(t0_np[s]))
        else:
            key = (mlen_val, grp)
        if key not in header_cache:
            split = None
            if nbt > 1:
                split = dict(nbt=nbt, first_blen=int(first_blen[s]),
                             t0=int(t0_np[s]), **group_splits[grp])
            w = _header_bits(mlen_val, lgwin, tables[grp], split)
            total_bits = len(w.take_bytes()) * 8 + w.nbits
            # re-build to recover the bit-level tail (take_bytes drained it)
            w2 = _header_bits(mlen_val, lgwin, tables[grp], split)
            header_cache[key] = (w2, total_bits)
        return header_cache[key], (key if nbt > 1 else None)

    init0_np = np.zeros((8, 128), dtype=np.int32)
    initav_np = np.zeros((8, 128), dtype=np.int32)
    head_words: list[np.ndarray] = []
    head_bits_np = np.zeros(B_LANES, dtype=np.int64)
    lane_hkey: list = [None] * B_LANES
    for s in range(n_chunks):
        (w, total_bits), hkey = header_for(
            int(n_valid_np[s]), int(group_of[s]), s
        )
        lane_hkey[s] = hkey
        raw = w.finish()  # byte-aligned; valid bits = total_bits
        full_words = total_bits // 32
        wordbuf = np.frombuffer(raw + b"\x00" * ((-len(raw)) % 4), dtype="<u4")
        head_words.append(wordbuf[:full_words])
        rem = total_bits - full_words * 32
        if rem > 0:
            partial = int(wordbuf[full_words]) & ((1 << rem) - 1)
        else:
            partial = 0
        init0_np[s // 128, s % 128] = np.int32(np.uint32(partial).view(np.int32))
        initav_np[s // 128, s % 128] = rem
        head_bits_np[s] = total_bits

    # ---- pack kernel (records are in stream order at fixed positions) ----
    R = rec0.shape[1]
    Rpad = -(-R // PACK_BR) * PACK_BR
    n_blocks = Rpad // PACK_BR

    def pad_r(a):
        a = a[:, :R]
        return jnp.pad(a, ((0, 0), (0, Rpad - R)))

    rec0_t = _to_sub_lanes(pad_r(rec0))
    rec1_t = _to_sub_lanes(pad_r(rec1))
    grp_enc = group_of.astype(np.int32)
    if nbt > 1:
        grp_enc = grp_enc | (signed_mode.astype(np.int32) << 8)
    grp_np = grp_enc.reshape(8, 128)
    pack = _jitted_pack(n_blocks, interpret, table_groups, nt, nbt, pseg,
                        nseg)
    pack_extra = ()
    if nbt > 1:
        sw_t = jnp.asarray(
            np.ascontiguousarray(sw_words.T).reshape(nseg, 8, 128)
        )
        stype_t = jnp.asarray(
            np.ascontiguousarray(
                seg_type_np.T.astype(np.int32)
            ).reshape(nseg, 8, 128)
        )
        pack_extra = (sw_t, stype_t)
    keys, words, status = pack(
        rec0_t, rec1_t, jnp.asarray(tab_np), jnp.asarray(cmap_np),
        jnp.asarray(_pack_consts()), jnp.asarray(grp_np),
        jnp.asarray(init0_np), jnp.asarray(initav_np), *pack_extra,
    )

    # ---- device-side stream assembly (bytes end up whole in HBM) ----
    # One axis-0 co-sort assembles header + body + bit-tail per lane: head
    # words get keys 0..h-1, pack-kernel words h..h+widx-1 (their widx keys
    # shifted by h), the <=2 final partial words follow.  The distinct
    # headers are tiny (one per (mlen, table-group)), so the header columns
    # are built on device from an uploaded (n_distinct, maxH) stack — the
    # upload is O(KB), not O(batch).
    hdr_keys = sorted(header_cache.keys())
    hdr_index = {k: j for j, k in enumerate(hdr_keys)}
    n_distinct = max(1, len(hdr_keys))
    h_np = np.zeros(B_LANES, np.int32)            # full head words per lane
    hidx_np = np.zeros(B_LANES, np.int32)         # distinct-header index
    maxH = max((len(wd) for wd in head_words), default=0)
    maxH = max(maxH, 1)
    hdr_stack = np.zeros((n_distinct, maxH), np.uint32)
    for s in range(n_chunks):
        key = lane_hkey[s] if nbt > 1 else \
            (int(n_valid_np[s]), int(group_of[s]))
        hidx_np[s] = hdr_index[key]
        h_np[s] = len(head_words[s])
        hdr_stack[hidx_np[s], : h_np[s]] = head_words[s]

    asm = _jitted_assemble(maxH, n_distinct)
    swords = asm(
        keys, words, status,
        jnp.asarray(h_np.reshape(8, 128)),
        jnp.asarray(hidx_np.reshape(8, 128)),
        jnp.asarray(hdr_stack.view(np.int32)),
    )
    state.update(
        swords=swords, status=status, h_np=h_np,
        head_bits_np=head_bits_np, init0_np=init0_np, initav_np=initav_np,
        lgwin=lgwin,
    )


def stream_sizes(state: dict) -> np.ndarray:
    """Compressed size in bytes per chunk, from the (8,8,128) status fetch
    alone — no bulk word download (the bench's ratio comes from here while
    the assembled streams stay in HBM)."""
    n_chunks = state["n_chunks"]
    status_np = np.asarray(state["status"])
    widx_np = status_np[0].reshape(-1).astype(np.int64)
    avail_np = status_np[1].astype(np.int64).reshape(-1)
    h_bits = state["h_np"].astype(np.int64) * 32
    total_bits = h_bits + widx_np * 32 + avail_np
    return ((total_bits[:n_chunks] + 7) // 8).astype(np.int64)


def _encode_finish(state: dict) -> list[bytes]:
    """Fetch the device-assembled word streams and slice out the bytes."""
    data = state["data"]
    chunk_size = state["chunk_size"]
    n_chunks = state["n_chunks"]
    h_np = state["h_np"]
    swords = state["swords"]
    lgwin = state["lgwin"]

    status_np = np.asarray(state["status"])
    widx_np = status_np[0].reshape(-1).astype(np.int64)
    avail_np = status_np[1].astype(np.int32).reshape(-1)
    ovf_np = status_np[5].reshape(-1)

    # total words per lane; fetch (maxw, 8, 128) then slice per stream
    nw_np = h_np.astype(np.int64) + widx_np + (avail_np.astype(np.int64) + 31) // 32
    maxw = int(nw_np[:n_chunks].max()) if n_chunks else 0
    words_np = (
        np.asarray(swords[:maxw]).astype(np.uint32)
        .reshape(maxw, B_LANES).T.copy()
        if maxw
        else np.zeros((B_LANES, 0), np.uint32)
    )

    out: list[bytes] = []
    for s in range(n_chunks):
        if ovf_np[s]:
            # bit-buffer overflow (pathological record pattern): host encode
            from ..encode import encode as host_encode

            chunk = data[s * chunk_size : (s + 1) * chunk_size]
            out.append(host_encode(chunk, quality=2, lgwin=lgwin))
            continue
        total_bits = int(h_np[s]) * 32 + int(widx_np[s]) * 32 + int(avail_np[s])
        nbytes = (total_bits + 7) // 8
        out.append(words_np[s, : int(nw_np[s])].tobytes()[:nbytes])
    return out
