"""Batched lockstep Brotli decode on TPU (JAX).

Design (SURVEY.md section 7 "sequential cores, parallel everything else"):
Brotli decode is sequential per stream, so device throughput comes from
decoding MANY streams in lockstep — each SIMD lane holds one stream's state
(bit position, output position, distance ring), and every step gathers from
per-lane Huffman tables resident on-device.  Divergence is handled by
masking; a lane that finishes idles until the batch drains.

Round-1 device eligibility (host `preflight` decides; ineligible streams use
the host decoder):
  * single compressed metablock (+ optional empty last block),
  * trivial entropy layout: one block type per category, one literal tree,
    one distance tree (what q0/q1/streaming encodes produce),
  * no static-dictionary references (detected on-device -> lane error flag,
    host re-decodes those lanes).

The two-level Huffman tables are the SAME flat int32 layout the host builds
(decode/huffman.py), uploaded per lane — host and device share one format.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np

from ..constants import (
    CMD_LUT,
    COPY_LENGTH_N_BITS,
    COPY_LENGTH_OFFSET,
    DISTANCE_SHORT_CODE_DELTA,
    DISTANCE_SHORT_CODE_INDEX,
    INSERT_LENGTH_N_BITS,
    INSERT_LENGTH_OFFSET,
)
from ..decode.bitreader import BitReader, BrotliError
from ..decode.engine import (
    _MetablockState,
    _decode_window_bits,
    _read_metablock_length,
)

# padded table sizes (MAX_HUFFMAN_TABLE_SIZE for each alphabet class)
LIT_TABLE_SIZE = 630    # alphabet 256
CMD_TABLE_SIZE = 1080   # alphabet 704
DIST_TABLE_SIZE = 920   # alphabet <= 544
MAX_DIST_ALPHABET = 544


@dataclass
class PreflightResult:
    """Host-parsed stream prologue for device execution."""

    words: np.ndarray        # uint32 bit stream
    cmd_start_bit: int       # bit offset where the command loop starts
    mlen: int                # decoded size (single metablock)
    max_backward: int        # (1 << wbits) - 16
    lit_table: np.ndarray    # (LIT_TABLE_SIZE,) int32
    cmd_table: np.ndarray
    dist_table: np.ndarray
    dist_extra: np.ndarray   # (MAX_DIST_ALPHABET,) int8-ish
    dist_offset: np.ndarray  # (MAX_DIST_ALPHABET,) int32
    npostfix: int
    ndirect: int


def preflight(data: bytes) -> PreflightResult | None:
    """Parse stream header + first metablock tables; None if device-ineligible."""
    try:
        br = BitReader(bytes(data))
        wbits, is_large = _decode_window_bits(br, large_window_enabled=False)
        input_end = bool(br.read(1))
        if input_end and br.read(1):
            return None  # empty stream: trivial on host
        mlen, is_uncompressed, is_metadata = _read_metablock_length(br, input_end)
        if is_metadata or is_uncompressed or mlen == 0:
            return None
        if not input_end:
            # device path requires the single compressed metablock to be last
            # (a trailing empty last-block is handled after the device run by
            # the host validator; keep it simple: require ISLAST here)
            return None
        st = _MetablockState(br, large_window=False)
        if (
            st.num_types != [1, 1, 1]
            or len(st.lit_group) != 1
            or len(st.dist_group) != 1
            or not st.trivial_literal
        ):
            return None
    except BrotliError:
        return None

    def _pad(table: list[int], size: int) -> np.ndarray:
        out = np.zeros(size, dtype=np.int32)
        n = min(len(table), size)
        out[:n] = table[:n]
        return out

    dist_extra = np.zeros(MAX_DIST_ALPHABET, dtype=np.int32)
    dist_offset = np.zeros(MAX_DIST_ALPHABET, dtype=np.int32)
    n = min(len(st.dist_extra), MAX_DIST_ALPHABET)
    dist_extra[:n] = st.dist_extra[:n]
    dist_offset[:n] = st.dist_offset[:n]

    pad = (-len(data)) % 4 + 12
    words = np.frombuffer(bytes(data) + b"\x00" * pad, dtype="<u4")
    return PreflightResult(
        words=words,
        cmd_start_bit=br.bitpos,
        mlen=mlen,
        max_backward=(1 << wbits) - 16,
        lit_table=_pad(st.lit_group[0], LIT_TABLE_SIZE),
        cmd_table=_pad(st.cmd_group[0], CMD_TABLE_SIZE),
        dist_table=_pad(st.dist_group[0], DIST_TABLE_SIZE),
        dist_extra=dist_extra,
        dist_offset=dist_offset,
        npostfix=st.npostfix,
        ndirect=st.ndirect,
    )


def preflight_many(streams: list[bytes]) -> list[PreflightResult | None]:
    """Batch preflight via the native C++ header parser (decoder.cpp),
    one call for the whole batch — the per-stream Python parse cost
    ~1 ms/stream on the 1-core host (bench preflight_ms_per_batch).
    Falls back to the Python parser when the native library is missing."""
    try:
        from ..native import preflight_batch_native

        scal, lit, cmd, dist, dxe, dxo = preflight_batch_native(streams)
    except Exception:
        return [preflight(s) for s in streams]
    out: list[PreflightResult | None] = []
    for i, s in enumerate(streams):
        if scal[i, 0] != 1:
            out.append(None)
            continue
        pad = (-len(s)) % 4 + 12
        words = np.frombuffer(bytes(s) + b"\x00" * pad, dtype="<u4")
        out.append(PreflightResult(
            words=words, cmd_start_bit=int(scal[i, 2]), mlen=int(scal[i, 1]),
            max_backward=(1 << int(scal[i, 5])) - 16,
            lit_table=lit[i], cmd_table=cmd[i], dist_table=dist[i],
            dist_extra=dxe[i], dist_offset=dxo[i],
            npostfix=int(scal[i, 3]), ndirect=int(scal[i, 4]),
        ))
    return out


# ---------------------------------------------------------------------------
# the jitted lockstep kernel
# ---------------------------------------------------------------------------

def _build_kernel():
    import jax
    import jax.numpy as jnp

    INS_NB = jnp.asarray(INSERT_LENGTH_N_BITS, dtype=jnp.uint32)
    INS_OFF = jnp.asarray(INSERT_LENGTH_OFFSET, dtype=jnp.int32)
    CP_NB = jnp.asarray(COPY_LENGTH_N_BITS, dtype=jnp.uint32)
    CP_OFF = jnp.asarray(COPY_LENGTH_OFFSET, dtype=jnp.int32)
    CMD_INS = jnp.asarray(CMD_LUT[:, 0], dtype=jnp.int32)
    CMD_CP = jnp.asarray(CMD_LUT[:, 1], dtype=jnp.int32)
    CMD_IMPLICIT = jnp.asarray(CMD_LUT[:, 2], dtype=jnp.int32)
    SHORT_IDX = jnp.asarray(DISTANCE_SHORT_CODE_INDEX, dtype=jnp.int32)
    SHORT_DELTA = jnp.asarray(DISTANCE_SHORT_CODE_DELTA, dtype=jnp.int32)

    def take(tab, idx):
        """Per-lane gather: tab (B, T), idx (B,) -> (B,)."""
        return jnp.take_along_axis(tab, idx[:, None], axis=1)[:, 0]

    def peek32(words, bitpos):
        """32 bits at per-lane bit offsets; words (B, W) uint32."""
        w = (bitpos >> 5).astype(jnp.int32)
        sh = bitpos & 31
        lo = take(words, w) >> sh
        hi = take(words, w + 1)
        hi_part = jnp.where(sh == 0, jnp.uint32(0), hi << ((32 - sh) & 31))
        return lo | hi_part

    def read_bits(words, bitpos, n):
        """n (B,) uint32 <= 24 bits; returns (value, new_bitpos)."""
        v = peek32(words, bitpos) & ((jnp.uint32(1) << n) - 1)
        return v, bitpos + n

    def read_symbol(words, bitpos, table):
        """Two-level table lookup, fully lockstep (both levels always run)."""
        v = peek32(words, bitpos)
        e0 = take(table, (v & 0xFF).astype(jnp.int32))
        bits0 = e0 >> 16
        is_leaf = bits0 <= 8
        # second level (masked to index 0 when leaf to stay in bounds)
        mask = (jnp.uint32(1) << jnp.clip(bits0, 0, 15).astype(jnp.uint32)) - 1
        sub = ((v & mask) >> 8).astype(jnp.int32)
        idx2 = (v & 0xFF).astype(jnp.int32) + (e0 & 0xFFFF) + sub
        e1 = take(table, jnp.where(is_leaf, 0, idx2))
        sym = jnp.where(is_leaf, e0 & 0xFFFF, e1 & 0xFFFF)
        nbits = jnp.where(is_leaf, bits0, (e1 >> 16) + 8)
        return sym, bitpos + nbits.astype(jnp.uint32)

    def kernel(words, bitpos0, mlen, max_backward, lit_tab, cmd_tab, dist_tab,
               dist_extra, dist_offset, npostfix, out_size: int):
        B = words.shape[0]
        lanes = jnp.arange(B)
        out = jnp.zeros((B, out_size), dtype=jnp.uint8)
        bitpos = bitpos0.astype(jnp.uint32)
        mbl = mlen.astype(jnp.int32)
        pos = jnp.zeros(B, dtype=jnp.int32)
        dist_rb = jnp.tile(jnp.array([16, 15, 11, 4], jnp.int32), (B, 1))
        rb_idx = jnp.full(B, 3, jnp.int32)
        err = jnp.zeros(B, dtype=jnp.bool_)

        def lane_set(buf, idx, val, active):
            cur = buf[lanes, idx]
            return buf.at[lanes, idx].set(jnp.where(active, val, cur))

        def cond(state):
            out, bitpos, mbl, pos, dist_rb, rb_idx, err = state
            return jnp.any((mbl > 0) & ~err)

        def body(state):
            out, bitpos, mbl, pos, dist_rb, rb_idx, err = state
            active = (mbl > 0) & ~err

            # --- command symbol ---
            cmd, bp1 = read_symbol(words, bitpos, cmd_tab)
            bitpos = jnp.where(active, bp1, bitpos)
            cmd = jnp.where(active, cmd, 0)
            ins_code = CMD_INS[cmd]
            cp_code = CMD_CP[cmd]
            v, bp2 = read_bits(words, bitpos, INS_NB[ins_code])
            insert_len = INS_OFF[ins_code] + v.astype(jnp.int32)
            bitpos = jnp.where(active, bp2, bitpos)
            v, bp3 = read_bits(words, bitpos, CP_NB[cp_code])
            copy_len = CP_OFF[cp_code] + v.astype(jnp.int32)
            bitpos = jnp.where(active, bp3, bitpos)
            insert_len = jnp.where(active, insert_len, 0)

            # --- literal loop (one byte per lane per iteration) ---
            def lit_cond(s):
                out, bitpos, pos, rem = s[0], s[1], s[2], s[3]
                return jnp.any(rem > 0)

            def lit_body(s):
                out, bitpos, pos, rem = s
                lit_active = rem > 0
                sym, bp = read_symbol(words, bitpos, lit_tab)
                bitpos = jnp.where(lit_active, bp, bitpos)
                out = lane_set(out, jnp.clip(pos, 0, out_size - 1),
                               sym.astype(jnp.uint8), lit_active)
                pos = jnp.where(lit_active, pos + 1, pos)
                rem = jnp.where(lit_active, rem - 1, rem)
                return (out, bitpos, pos, rem)

            out, bitpos, pos, _ = jax.lax.while_loop(
                lit_cond, lit_body, (out, bitpos, pos, insert_len)
            )
            mbl = mbl - insert_len
            active = active & (mbl > 0)

            # --- distance ---
            implicit = CMD_IMPLICIT[cmd] == 1
            need_read = active & ~implicit
            dcode_sym, bp4 = read_symbol(words, bitpos, dist_tab)
            bitpos = jnp.where(need_read, bp4, bitpos)
            dcode = jnp.where(need_read, dcode_sym, 0)
            # short codes
            short = dcode < 16
            ring_pos = (rb_idx - SHORT_IDX[jnp.clip(dcode, 0, 15)]) & 3
            short_dist = take(dist_rb, ring_pos) + SHORT_DELTA[jnp.clip(dcode, 0, 15)]
            # long codes
            long_code = jnp.clip(dcode, 0, MAX_DIST_ALPHABET - 1)
            ebits = take(dist_extra, long_code).astype(jnp.uint32)
            ev, bp5 = read_bits(words, bitpos, jnp.where(need_read & ~short, ebits, 0))
            bitpos = jnp.where(need_read & ~short, bp5, bitpos)
            long_dist = take(dist_offset, long_code) + (
                ev.astype(jnp.int32) << npostfix
            )
            last_dist = take(dist_rb, rb_idx & 3)
            distance = jnp.where(
                implicit, last_dist, jnp.where(short, short_dist, long_dist)
            )
            err = err | (active & (distance < 1))

            max_distance = jnp.minimum(pos, max_backward)
            # dictionary reference -> host fallback for this lane
            err = err | (active & (distance > max_distance))

            # push ring (explicit non-zero codes only)
            push = active & ~implicit & (dcode > 0) & (distance <= max_distance)
            new_idx = (rb_idx + 1) & 3
            rb_idx = jnp.where(push, new_idx, rb_idx)
            dist_rb = lane_set(dist_rb, rb_idx & 3, distance, push)

            copy_len = jnp.where(active & ~err, copy_len, 0)
            err = err | (copy_len > mbl)
            copy_len = jnp.where(err, 0, copy_len)

            # --- copy loop (one byte per lane per iteration; overlap-safe) ---
            def cp_cond(s):
                return jnp.any(s[2] > 0)

            def cp_body(s):
                out, pos, rem = s
                cp_active = rem > 0
                src = jnp.clip(pos - distance, 0, out_size - 1)
                b = out[lanes, src]
                out = lane_set(out, jnp.clip(pos, 0, out_size - 1), b, cp_active)
                pos = jnp.where(cp_active, pos + 1, pos)
                rem = jnp.where(cp_active, rem - 1, rem)
                return (out, pos, rem)

            out, pos, _ = jax.lax.while_loop(cp_cond, cp_body, (out, pos, copy_len))
            mbl = mbl - copy_len
            return (out, bitpos, mbl, pos, dist_rb, rb_idx, err)

        out, bitpos, mbl, pos, dist_rb, rb_idx, err = jax.lax.while_loop(
            cond, body, (out, bitpos, mbl, pos, dist_rb, rb_idx, err)
        )
        return out, pos, err

    return kernel


@functools.lru_cache(maxsize=None)
def _jitted_kernel(out_size: int):
    import jax

    kernel = _build_kernel()
    return jax.jit(functools.partial(kernel, out_size=out_size))


def decode_batch_device(streams: list[bytes]) -> list[bytes]:
    """Decode a batch of streams, device fast path + host fallback."""
    from ..decode import decode as host_decode

    pre = [preflight(s) for s in streams]
    results: list[bytes | None] = [None] * len(streams)
    device_idx = [i for i, p in enumerate(pre) if p is not None]
    for i, p in enumerate(pre):
        if p is None:
            results[i] = host_decode(streams[i])
    if device_idx:
        batch = [pre[i] for i in device_idx]
        outs, lens, errs = run_device_batch(batch)
        for k, i in enumerate(device_idx):
            if errs[k]:
                results[i] = host_decode(streams[i])  # dictionary ref etc.
            else:
                results[i] = bytes(outs[k, : lens[k]])
    return results  # type: ignore[return-value]


def run_device_batch(batch: list[PreflightResult], device_put=None):
    """Pad + upload a batch of preflighted streams and run the kernel.

    `device_put` optionally places each batch-major array (e.g. with a
    NamedSharding over a mesh axis for multi-chip execution).
    """
    import jax.numpy as jnp

    B = len(batch)
    max_words = max(p.words.shape[0] for p in batch)
    out_size = max(p.mlen for p in batch)
    words = np.zeros((B, max_words), dtype=np.uint32)
    for i, p in enumerate(batch):
        words[i, : p.words.shape[0]] = p.words
    put = device_put if device_put is not None else jnp.asarray
    args = dict(
        words=put(words),
        bitpos0=put(np.asarray([p.cmd_start_bit for p in batch], dtype=np.uint32)),
        mlen=put(np.asarray([p.mlen for p in batch], dtype=np.int32)),
        max_backward=put(np.asarray([p.max_backward for p in batch], dtype=np.int32)),
        lit_tab=put(np.stack([p.lit_table for p in batch])),
        cmd_tab=put(np.stack([p.cmd_table for p in batch])),
        dist_tab=put(np.stack([p.dist_table for p in batch])),
        dist_extra=put(np.stack([p.dist_extra for p in batch])),
        dist_offset=put(np.stack([p.dist_offset for p in batch])),
        npostfix=put(np.asarray([p.npostfix for p in batch], dtype=np.int32)),
    )
    kernel = _jitted_kernel(out_size)
    out, pos, err = kernel(**args)
    return np.asarray(out), np.asarray(pos), np.asarray(err)
