"""Pallas LZ-resolve kernel: v2 token streams -> decoded bytes, on device.

Round-1's decode fast path stopped at a token stream in HBM and resolved LZ
on a 1-core host (native/lz_resolve.cpp) — the 6 GB/s entropy phase fed a
host phase that cannot keep up, so an honest end-to-end number requires
bytes to be produced in HBM on device (VERDICT round 1, item 1).  This
kernel is that phase 2; together with ops/pallas_decode2.py it makes the
whole decode path (compressed bits -> decoded bytes) device-resident.

Architecture (TPU-native; the reference's byte loop engine.ts:1378-1433 is a
scalar-CPU design with no analog here):

* **Per-lane history at per-lane offsets is the whole problem.**  Every
  lane (stream) reads/writes its own ring positions; the only per-lane
  dynamic-address primitive that is safe on this hardware is a chained
  one-hot sweep over ring vregs (XLA gather: ~0.07 G elem/s;
  tpu.dynamic_gather: lane-shared tables only; per-lane scalar DMA and
  banded dynamic scratch RMW wedge the chip — CLAUDE.md Mosaic pitfalls).
  A sweep costs O(#slots) vector ops + VMEM accesses per visit, so the
  round-4 redesign minimizes SLOTS VISITED PER ROW, not just rows:

  - **One history ring (V slots = H/4)** absorbs emission; its headroom
    (V - FLUSH rows) is the skew budget.  (A W<V write mini-ring was
    built and measured first: the smaller headroom deadlocked real
    batches — slow lanes pinned the flush frontier, fast lanes hit the
    cap mid-copy with a full token buffer, freezing the shared cursor.
    A burst read-buffer was prototyped too and dropped: a chained K-word
    one-hot gather costs O(V*K), so bursts do not amortize the sweep.)
  - **Recent-emit mini-ring `rec` (REC_W slots, slot = word mod REC_W)**:
    emission scatters into it alongside the big ring (an O(REC_W) sweep,
    ~1/16 the cost), and ALL reads in the last REC_W*4 bytes are served
    from it.  Near distances — the bulk of LZ copies in text — therefore
    never touch the O(V) sweep.
  - **Gated, throttled far gather**: reads below `r_lane - REC_W` do one
    chained KD-word sweep of the big ring into the `fbuf` staging rows —
    but only on rows where some lane actually needs it, and at most every
    FAR_EVERY rows (far lanes stall the off rows).  Literal/near-copy
    rows pay emission only; round 3 paid an O(V) drain gather EVERY row.
* **Uniform token intake.**  The entropy kernel produced every lane's
  token for shared row r in lockstep, so resolve re-reads that shared row
  axis: POPS_PER_ROW consecutive rows per kernel row from a (DT, 8, 128)
  sliding VMEM window (scalar-indexed, O(1)).  Each lane parks its token
  in a K-deep register FIFO until its byte stream reaches it; the shared
  row cursor advances only when every still-buffering lane has space.
* **Per-lane progress, ordered byte FIFO.**  Each lane independently pulls
  buffered tokens (literals append to a 20-byte FIFO; copies drain into it
  at up to 16 B/row) and emits up to 4 output words per row at its own
  pace.  Output blocks flush to HBM as the minimum live lane row passes
  them; the flush frontier in turn caps how far ahead a lane may run
  (V - FLUSH rows; the preflight rate-sort keeps batch skew inside it,
  the stagnation detector flags any batch that escapes).
* **Copies**: per drained word the source select is FIFO words (regs,
  bytes not yet emitted; aw >= r_lane) / rec words (r_lane-REC_W <= aw <
  r_lane) / fbuf far words (older) — all three regions are word-aligned
  in absolute output byte space, so one funnel shift serves them;
  dist < DRAIN_B replicates from bytes appended in the same row.
  dist > H-16 flags the lane (host fallback).  The device encoder avoids
  far distances by construction (max_distance, device_encode.py).

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
PULLS_PER_ROW = 3         # buffer-head consumptions per lane per row
POPS_PER_ROW = 4          # shared token rows consumed per kernel row: must
                          # keep up with the pull rate or token-dense
                          # regions (and the all-pad tail) bound the whole
                          # kernel at one token row per kernel row — with
                          # 16 B emission the intake is the binding rate
FLUSH = 32                # emitted rows per output DMA (must divide V)
STAG_LIMIT = 192          # no-progress rows before declaring skew deadlock

# byte-width of the per-lane pipeline: ring-sweep slot visits dominate the
# row cost, so wider rows amortize them (4 B -> 8 B -> 16 B measured on
# chip; the FIFO must hold one drain burst plus emission slack)
FIFO_W = 5                # FIFO words per lane (20 B)
DRAIN_B = 16              # copy bytes drained per row
EMIT_W = 4                # output words emitted per row
ROWS_PER_ITER = 1         # rows per while-loop iteration (4x was tried:
                          # ~4x interpret/test cost for a marginal chip
                          # gain, same verdict as round-2's unroll note)
REC_W = 32                # recent-emit mini-ring slots (serves distances
                          # <= ~REC_W*4 B without touching the O(V) sweep)
FAR_EVERY = 2             # far-gather cadence (rows); lanes whose copy
                          # source sits below r_lane - REC_W drain only on
                          # these rows, halving worst-case sweep cost

# lane error flags (bitmask in the status row)
ERR_FAR_DIST = 1          # copy distance beyond the ring window
ERR_STARVED = 2           # supply exhausted before mlen bytes
ERR_MALFORMED = 4         # tag-2 distance without a pending tag-1 length


def _build(R_tok: int, n_out_rows: int, V: int, DT: int, groups: int,
           row_budget: int, interpret: bool):
    if not interpret:
        from ..utils.interpret_gate import assert_validated
        assert_validated(__file__)
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    S = (SUB, LANES)
    H = V * 4
    HALF_DT = DT // 2
    KD = DRAIN_B // 4 + 1     # consecutive source words per drain row
    assert V % FLUSH == 0 and n_out_rows % FLUSH == 0
    assert REC_W % 8 == 0 and REC_W >= EMIT_W + KD

    def kernel(tok_ref, scal_ref, out_ref, ring, rec, fbuf, twin,
               sem_in, sem_out):
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

        def ring_gather(ref, n_slots, q, K):
            """K consecutive words (q .. q+K-1) mod n_slots per lane via one
            chained one-hot sweep (manually 8x-unrolled fori; Mosaic
            supports only full/no unroll).  Carries as i32: Mosaic cannot
            round-trip i1 loop carries."""

            def body(i, carry):
                accs = list(carry[:K])
                flags = [f > 0 for f in carry[K:]]   # match flags, prev..
                for k in range(8):
                    v = 8 * i + k
                    rv = ref[v]
                    m = q == v
                    accs[0] = jnp.where(m, rv, accs[0])
                    for d in range(1, K):
                        accs[d] = jnp.where(flags[d - 1], rv, accs[d])
                    flags = [m] + flags[:-1]
                return tuple(accs) + tuple(
                    f.astype(jnp.int32) for f in flags
                )

            # carry init derived from q: a replicated-constant init wedges
            # Mosaic layout inference when the gather sits under pl.when
            # ("Invalid relayout ... replicated in destination"), because
            # the back-edge would need a non-replicated -> replicated cast.
            # q >= 0 so min(q, 0) is a zero Mosaic cannot constant-fold
            # (q * 0 WAS folded back to a replicated constant).
            zi = jnp.minimum(q, 0)
            zu = zi.astype(jnp.uint32)
            out = jax.lax.fori_loop(
                0, n_slots // 8, body,
                tuple([zu] * K) + tuple([zi] * (K - 1)),
            )
            accs = list(out[:K])
            # wrap-around tails: word q+d wraps to ref[(q+d) - n_slots]
            for d in range(1, K):
                for w in range(d):
                    accs[d] = jnp.where(
                        q == n_slots - (d - w), ref[w], accs[d]
                    )
            return accs

        # One ordered byte FIFO per lane (FIFO_W words, oldest byte in
        # f0's LSB): literal pulls append to it, the active copy DRAINS
        # into it at DRAIN_B B/row (decoupled from global emission — this
        # is what makes short copy tails deadlock-free), emission retires
        # up to EMIT_W words per row.
        # `qp` = bytes ever queued; emitted boundary = qp - cnt = 4*r_lane.
        FKEYS = [f"f{i}" for i in range(FIFO_W)]
        state0 = dict(
            cnt=zeros_i,
            qp=zeros_i, r_lane=zeros_i,
            cp_dist=zeros_i, cp_rem=zeros_i,
            pend_len=jnp.full(S, -1, jnp.int32),
            err=zeros_i,
            tcnt=zeros_i,
            **{k: zeros_u for k in FKEYS},
            **{f"tbuf{k}": zeros_u for k in range(KBUF)},
        )
        order = sorted(state0.keys())

        def fifo_append(st, adds, n):
            """Append n (<= 4*len(adds)) bytes (LSB-first across `adds`)
            at byte offset cnt."""
            w = st["cnt"] >> 2           # word index of the append point
            bit = ((st["cnt"] & 3) * 8).astype(jnp.uint32)
            hi_sh = (32 - bit) & 31
            nzb = bit > 0
            los = [a << bit for a in adds]
            his = [jnp.where(nzb, a >> hi_sh, jnp.uint32(0)) for a in adds]
            for t in range(FIFO_W):
                contrib = zeros_u
                for a in range(len(adds)):
                    contrib = contrib | jnp.where(
                        w == t - a, los[a], jnp.uint32(0)
                    )
                    contrib = contrib | jnp.where(
                        w == t - a - 1, his[a], jnp.uint32(0)
                    )
                st[FKEYS[t]] = st[FKEYS[t]] | contrib
            st["cnt"] = st["cnt"] + n
            st["qp"] = st["qp"] + n

        def drain(st, row):
            """Move up to DRAIN_B bytes of the active copy into the FIFO.

            Source regions by absolute word index aw (all word-aligned in
            output byte space, so one funnel shift serves them):
              aw >= r_lane              FIFO registers (not yet emitted)
              r_lane-REC_W <= aw < r_lane   rec mini-ring (O(REC_W) sweep)
              aw < r_lane-REC_W         big ring via the gated far gather
            """
            st = dict(st)
            can = (
                (st["cp_rem"] > 0) & (st["cnt"] <= FIFO_W * 4 - DRAIN_B)
                & (st["err"] == 0)
            )
            far = can & (st["cp_dist"] > H - 16)
            st["err"] = st["err"] | jnp.where(far, ERR_FAR_DIST, 0)
            can = can & ~far

            src_base = st["qp"] - st["cp_dist"]
            w0 = jnp.maximum(src_base, 0) >> 2
            need_far = can & (w0 < st["r_lane"] - REC_W)
            # the O(V) sweep fires only when some lane actually has a far
            # source, at most every FAR_EVERY rows; far lanes stall the
            # off rows (near/literal rows pay emission only — round 3
            # paid this sweep unconditionally every row)
            fire = jnp.any(need_far) & (jax.lax.rem(row, FAR_EVERY) == 0)

            @pl.when(fire)
            def _():
                accs = ring_gather(ring, V, jax.lax.rem(w0, V), KD)
                for j in range(KD):
                    fbuf[j] = accs[j]

            can = can & (~need_far | fire)
            e = jnp.where(can, jnp.minimum(st["cp_rem"], DRAIN_B), 0)

            # --- KD consecutive source words, each from its region ---
            # (fbuf/racc are positionally aligned: index i = word w0+i)
            racc = ring_gather(rec, REC_W, jax.lax.rem(w0, REC_W), KD)
            facc = [zeros_u] * KD
            fi0 = w0 - st["r_lane"]
            for t in range(FIFO_W):
                fv = st[FKEYS[t]]
                for i in range(KD):
                    facc[i] = jnp.where(fi0 + i == t, fv, facc[i])
            rw = []
            for i in range(KD):
                aw = w0 + i
                rw.append(jnp.where(
                    aw >= st["r_lane"], facc[i],
                    jnp.where(aw >= st["r_lane"] - REC_W, racc[i], fbuf[i]),
                ))

            fsh = ((src_base & 3) * 8).astype(jnp.uint32)
            hi_sh = (32 - fsh) & 31
            nz = fsh > 0
            fw = [
                (rw[i] >> fsh)
                | jnp.where(nz, rw[i + 1] << hi_sh, jnp.uint32(0))
                for i in range(KD - 1)
            ]
            adds = [zeros_u] * (KD - 1)
            appended = []
            for j in range(DRAIN_B):
                b = (fw[j >> 2] >> (8 * (j & 3))) & jnp.uint32(0xFF)
                # dist < DRAIN_B: source inside this row's appended run
                for jj in range(j):
                    b = jnp.where((j - st["cp_dist"]) == jj, appended[jj], b)
                appended.append(b)
                adds[j >> 2] = adds[j >> 2] | (b << (8 * (j & 3)))
            # per-word byte masks (i32 min/shift: Mosaic has no arith.minui)
            for a in range(KD - 1):
                ea = jnp.clip(e - 4 * a, 0, 4)
                mask = (jnp.uint32(1) << (ea * 8).astype(jnp.uint32)) - 1
                mask = jnp.where(ea >= 4, jnp.uint32(0xFFFFFFFF), mask)
                adds[a] = adds[a] & mask
            fifo_append(st, adds, e)
            st["cp_rem"] = st["cp_rem"] - e
            return st

        def pop_uniform2(st, r_pop, filled):
            """Buffer every lane's tokens from shared rows r_pop, r_pop+1.

            Both rows are fetched by one chained sweep over the DT window;
            each row pops only if every still-buffering lane has space
            (pads skipped for free).  Returns (st, n_popped scalar)."""
            st = dict(st)
            trows = [
                twin[jax.lax.rem(r_pop + k, DT)] for k in range(POPS_PER_ROW)
            ]

            n_popped = jnp.int32(0)
            for roff, t in enumerate(trows):
                buffering = (st["err"] == 0) & (st["qp"] < mlen)
                can_pop = (
                    jnp.all(~buffering | (st["tcnt"] < KBUF))
                    & (r_pop + roff < filled)
                    & (r_pop + roff < R_tok)
                    & (n_popped >= roff)   # row r+1 only after row r popped
                )
                take = can_pop & buffering & (t != 0)
                for k in range(KBUF):
                    st[f"tbuf{k}"] = jnp.where(
                        take & (st["tcnt"] == k), t, st[f"tbuf{k}"]
                    )
                st["tcnt"] = st["tcnt"] + take.astype(jnp.int32)
                n_popped = n_popped + can_pop.astype(jnp.int32)
            return st, n_popped

        def pull(st):
            """Consume the buffer head when the lane's byte stream needs it:
            literals append to the byte FIFO (order: only when no copy is
            active), copy tokens arm cp_dist/cp_rem."""
            st = dict(st)
            t = st["tbuf0"]
            can = (
                (st["tcnt"] > 0) & (st["cp_rem"] == 0)
                & (st["err"] == 0) & (st["qp"] < mlen)
            )
            tag = (t >> 30).astype(jnp.int32)
            is_lit = can & (tag == 0) & (st["cnt"] <= FIFO_W * 4 - 3)
            is_len = can & (tag == 1)
            is_dist = can & (tag == 2)
            is_fused = can & (tag == 3)

            cnt_t = ((t >> 24) & 3).astype(jnp.int32)
            payload = t & jnp.uint32(0xFFFFFF)
            st2 = dict(st)
            fifo_append(st2, [payload], cnt_t)
            for k2 in FKEYS + ["cnt", "qp"]:
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
            """Per-lane emission of up to EMIT_W output words per row:
            write the FIFO's low words to the lane's own ring rows (one
            chained scatter sweep over V slots) and mirror them into the
            rec mini-ring (an O(REC_W) sweep) so near-distance drains
            never pay the O(V) gather.

            Per-lane (not lockstep) so no lane's starvation can wedge
            another's progress; the flush frontier caps how far ahead a
            lane may run (ring slots must stay flushable: V - FLUSH rows
            of headroom, the skew budget that the W<V mini-ring broke)."""
            st = dict(st)
            P0 = 4 * st["r_lane"]
            done = (st["err"] != 0) | (P0 >= mlen)
            room = (flush_base + (V - FLUSH)) - st["r_lane"]
            need = jnp.clip(mlen - P0, 0, 4 * EMIT_W)
            # words this row: as many complete words as are buffered (or
            # the whole tail), capped by EMIT_W and the flush-frontier room
            full_w = st["cnt"] >> 2
            tail_w = jnp.where(
                (st["cnt"] >= need) & (need > 0), (need + 3) >> 2, 0
            )
            nw = jnp.maximum(full_w, tail_w)
            nw = jnp.minimum(jnp.minimum(nw, EMIT_W), jnp.maximum(room, 0))
            nw = jnp.where(done, 0, nw)
            qs = [
                jnp.where(nw >= k + 1, jax.lax.rem(st["r_lane"] + k, V), -1)
                for k in range(EMIT_W)
            ]
            qr = [
                jnp.where(
                    nw >= k + 1, jax.lax.rem(st["r_lane"] + k, REC_W), -1
                )
                for k in range(EMIT_W)
            ]
            ws = [st[FKEYS[k]] for k in range(EMIT_W)]

            # full one-hot scatter sweep over the V-slot ring.  (A banded
            # variant that visited only rows past the flush frontier via
            # dynamic scalar-indexed ring writes WEDGED THE CHIP — scalar-
            # dynamic VMEM read-modify-write in a fori body is not
            # hardware-safe.)
            def wbody(i, _):
                for k in range(8):
                    v = 8 * i + k
                    rv = ring[v]
                    for k2 in range(EMIT_W):
                        rv = jnp.where(qs[k2] == v, ws[k2], rv)
                    ring[v] = rv
                return 0

            jax.lax.fori_loop(0, V // 8, wbody, 0)
            # rec mirror: statically unrolled (REC_W slots, ~1/16 of V)
            for v in range(REC_W):
                rv = rec[v]
                for k2 in range(EMIT_W):
                    rv = jnp.where(qr[k2] == v, ws[k2], rv)
                rec[v] = rv
            # shift the FIFO down by nw words (reads from the originals)
            orig = [st[k] for k in FKEYS]
            for t in range(FIFO_W):
                acc = jnp.where(nw == 0, orig[t], zeros_u)
                for s in range(1, EMIT_W + 1):
                    src = orig[t + s] if t + s < FIFO_W else zeros_u
                    acc = jnp.where(nw == s, src, acc)
                st[FKEYS[t]] = acc
            st["cnt"] = jnp.maximum(st["cnt"] - 4 * nw, 0)
            st["r_lane"] = st["r_lane"] + nw
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

            st = drain(st, row)
            st, n_popped = pop_uniform2(st, r_pop, filled)
            r_pop = r_pop + n_popped
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
            # lane has emitted past it (done/err lanes do not hold it up);
            # the ring IS the reorder buffer, so the DMA reads it directly --
            live = (st["err"] == 0) & (4 * st["r_lane"] < mlen)
            min_r = jnp.min(
                jnp.where(live, st["r_lane"], jnp.int32(1 << 30))
            )
            do_flush = flush_base + FLUSH <= min_r

            @pl.when(do_flush)
            def _():
                dma_o = pltpu.make_async_copy(
                    ring.at[pl.ds(jax.lax.rem(flush_base, V), FLUSH)],
                    out_ref.at[pl.ds(out0 + flush_base, FLUSH)],
                    sem_out,
                )
                dma_o.start()
                dma_o.wait()

            flush_base = jnp.where(do_flush, flush_base + FLUSH, flush_base)

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

        def body4(carry):
            # several rows per while iteration: the exit check and loop
            # bookkeeping amortize (exit granularity ROWS_PER_ITER rows)
            for _ in range(ROWS_PER_ITER):
                carry = body(carry)
            return carry

        def cond(carry):
            row, flush_base, r_pop, filled, stag, st_t = carry
            st = to_dict(st_t)
            alive = jnp.any((st["err"] == 0) & (4 * st["r_lane"] < mlen))
            return (row < row_budget) & alive

        row, flush_base, r_pop, filled, stag, st_t = jax.lax.while_loop(
            cond, body4,
            (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(DT),
             jnp.int32(0), to_tuple(state0)),
        )
        st = to_dict(st_t)

        # lanes that did not reach mlen (row budget exhausted) are truncated
        # — they MUST carry an error flag or the caller would accept
        # zero-padded output as decoded bytes.
        short = (st["err"] == 0) & (4 * st["r_lane"] < mlen)
        st["err"] = st["err"] | jnp.where(short, ERR_STARVED, 0)

        # ---- flush every remaining block (err/done lanes' tails; all
        # un-flushed emitted rows live within the ring by the room cap) ----
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

        # ---- status tail (ring rows 0..7 are already flushed) ----
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
                pltpu.VMEM((V, SUB, LANES), jnp.uint32),     # history ring
                pltpu.VMEM((REC_W, SUB, LANES), jnp.uint32),  # recent emits
                pltpu.VMEM((KD, SUB, LANES), jnp.uint32),    # far-gather stage
                pltpu.VMEM((DT, SUB, LANES), jnp.uint32),    # token window
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
                       interpret: bool = False, W: int | None = None):
    import jax

    del W  # accepted for caller compat; the single-ring design has no W
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
                          row_budget: int | None = None,
                          W: int | None = None):
    """Resolve (R, G*8, 128) u32 entropy tokens to bytes on device.

    `mlens` has G*1024 entries (decoded size per stream, 0 for pad lanes).
    Returns (out device array (G, R_out+8, 8, 128) u32, n_out_rows).
    Truncated/malformed/too-far lanes carry error flags in the status row;
    a degraded configuration falls back to host decode, never to silent
    corruption.
    """
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
    tokens_g = _jnp.transpose(
        _jnp.asarray(tokens).reshape(R, G, SUB, LANES), (1, 0, 2, 3)
    ).reshape(G * R, SUB, LANES)
    scal = mlens.astype(np.int32).reshape(G * SUB, LANES)
    kernel = get_resolve_kernel(
        R, n_out_rows, V, DT, G, row_budget, interpret, W
    )
    out = kernel(tokens_g, _jnp.asarray(scal))
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
