"""Device Zopfli DP sweep (q10): the optimal-parse node relaxation as a
lockstep XLA scan over positions, batched over streams.

The reference's q11 already separates match collection from the DP
(backward-references-hq.ts:501-545); SURVEY §7 maps the DP onto a
position wavefront.  This module is that wavefront: matches are
precollected (the same ordered sets the BinaryTreeHasher emits, with the
host's trim/skip schedule), and the cost relaxation — 8-entry
start-position queue, distance-cache candidate probes with on-device byte
compares, per-length command-cost relaxation — runs as ONE jitted scan
with every stream in lockstep.

DECISION EQUALITY is the contract (VERDICT r2 item 7): the kernel
reproduces the host `create_zopfli_backward_references` node arrays
exactly — float64 cost arithmetic in the host's association order, the
queue's ring/bubble semantics, the strict-less update rule — so the
backtracked command stream is identical (gated by
tests/test_device_zopfli.py on corpus prefixes).  Speed is explicitly
second: the per-lane byte probes are XLA gathers (~0.07 G elem/s), fine
for decision gates and small batches; the match-collection phase (the
q10/11 hot loop) is what the sort-based device machinery accelerates.

Host pieces reused as-is: ZopfliCostModel arrays (uploaded; every
decision depending on them happens in the kernel), and
`_compute_shortest_path` + `_create_commands_from_path` (backtrack over
the device-computed nodes).
"""

from __future__ import annotations

import numpy as np

from ..constants import (
    COPY_LENGTH_N_BITS,
    COPY_LENGTH_OFFSET,
    INSERT_LENGTH_N_BITS,
    INSERT_LENGTH_OFFSET,
)
from ..encode.backward_refs_hq import (
    _DIST_CACHE_INDEX,
    _DIST_CACHE_OFFSET,
    MAX_BACKWARD_LIMIT,
    ZopfliNode,
    _compute_shortest_path,
    _create_commands_from_path,
    _trim_long_matches,
    max_zopfli_len,
)
from ..encode.cost_model import INFINITY_COST, ZopfliCostModel

MAXC = 64          # precollected match candidates per position (assert)
MINLEN_CAP = 96    # _compute_minimum_copy_length scan cap (gate-checked)
PAD = 40           # data tail padding (beyond the host's 8-byte pad)


def collect_matches(data: bytes, quality: int = 10):
    """Host match precollection for one stream: the exact ordered match
    sets (with the host's trim rule and visit schedule) the sequential
    q10 loop sees.  Returns (mlen, mdist, mdelta (N, MAXC) i32,
    nmatch (N,) i32, active (N,) i32)."""
    from ..encode.api import _NO_MASK, _padded
    from ..encode.hash_binary_tree import BinaryTreeHasher

    n = len(data)
    padded = _padded(bytes(data))
    hasher = BinaryTreeHasher(22, n)
    max_zlen = max_zopfli_len(quality)
    mlen = np.zeros((n, MAXC), np.int32)
    mdist = np.zeros((n, MAXC), np.int32)
    mdelta = np.zeros((n, MAXC), np.int32)
    nmatch = np.zeros(n, np.int32)
    active = np.zeros(n, np.int32)
    i = 0
    while i + 3 < n:
        active[i] = 1
        max_distance = min(i, MAX_BACKWARD_LIMIT)
        matches = hasher.find_all_matches(padded, _NO_MASK, i, n - i,
                                          max_distance)
        matches = _trim_long_matches(matches, max_zlen)
        assert len(matches) <= MAXC, f"raise MAXC (pos {i}: {len(matches)})"
        for k, m in enumerate(matches):
            mlen[i, k] = m.length
            mdist[i, k] = m.distance
            mdelta[i, k] = m.len_code_delta
        nmatch[i] = len(matches)
        if len(matches) == 1 and matches[0].length > max_zlen:
            i += matches[0].length - 1
        i += 1
    return mlen, mdist, mdelta, nmatch, active


def _build_dp(N: int, B: int, max_zlen: int, maxbw: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    INF = INFINITY_COST
    DCI = [int(v) for v in _DIST_CACHE_INDEX]
    DCO = [int(v) for v in _DIST_CACHE_OFFSET]

    def code_chain(x, offsets):
        code = jnp.zeros(x.shape, jnp.int32)
        for k in range(1, len(offsets)):
            code = code + (x >= int(offsets[k])).astype(jnp.int32)
        return code

    def combine(ins_code, cp_code, use_last):
        bits64 = ((ins_code & 7) << 3) | (cp_code & 7)
        cell_lut = {
            (0, 0): 2, (0, 1): 3, (1, 0): 4, (1, 1): 5,
            (0, 2): 6, (2, 0): 7, (1, 2): 8, (2, 1): 9, (2, 2): 10,
        }
        ih, ch = ins_code >> 3, cp_code >> 3
        cell = jnp.zeros(ins_code.shape, jnp.int32)
        for (a, c), v in cell_lut.items():
            cell = jnp.where((ih == a) & (ch == c), v, cell)
        normal = (cell << 6) | bits64
        implicit_ok = use_last & (ins_code < 8) & (cp_code < 16)
        implicit = jnp.where(cp_code < 8, bits64, bits64 | 64)
        return jnp.where(implicit_ok, implicit, normal)

    ins_x = jnp.asarray([int(v) for v in INSERT_LENGTH_N_BITS], jnp.float64)
    cp_x = jnp.asarray([int(v) for v in COPY_LENGTH_N_BITS], jnp.float64)

    def dist_sym(dist):
        """prefix_encode_copy_distance(dist+15, 0, 0) -> (symbol, nbits)."""
        dcode = dist + 15
        short = dcode < 16
        d2 = 4 + (dcode - 16)
        f = jnp.clip(d2, 1, None).astype(jnp.float32)
        bl = (jax.lax.bitcast_convert_type(f, jnp.int32) >> 23) - 126
        bucket = bl - 2
        prefix = (d2 >> jnp.clip(bucket, 0, 30)) & 1
        nbits = bucket
        code = 16 + (2 * (nbits - 1) + prefix)
        return (
            jnp.where(short, dcode, code),
            jnp.where(short, 0, nbits).astype(jnp.float64),
        )

    def dp(data8, lit_cost, cost_cmd, cost_dist, min_cost_cmd, start_cache,
           n_valid, m_len_a, m_dist_a, m_delta_a, n_m_a, active_a):
        lanes = jnp.arange(B)

        cost = jnp.full((N + 1, B), INF, jnp.float64).at[0].set(0.0)
        nlen = jnp.ones((N + 1, B), jnp.int32).at[0].set(0)
        ndist = jnp.zeros((N + 1, B), jnp.int32)
        ndci = jnp.zeros((N + 1, B), jnp.int32)
        nsc = jnp.zeros((N + 1, B), jnp.int32)

        q_pos = jnp.zeros((8, B), jnp.int32)
        q_cd = jnp.full((8, B), INF, jnp.float64)
        q_cost = jnp.full((8, B), INF, jnp.float64)
        q_cache = jnp.zeros((8, 4, B), jnp.int32)
        q_idx = jnp.zeros(B, jnp.int32)

        def g2d(arr, rows):
            return arr[jnp.clip(rows, 0, N), lanes]

        def byte_at(idx):
            return data8[lanes, jnp.clip(idx, 0, data8.shape[1] - 1)]

        def lit_between(a, b):
            return lit_cost[lanes, b] - lit_cost[lanes, a]

        def step(carry, xs):
            (cost, nlen, ndist, ndci, nsc,
             q_pos, q_cd, q_cost, q_cache, q_idx) = carry
            pos, m_len, m_dist, m_delta, n_m, is_active = xs
            live = (is_active > 0) & (pos + 3 < n_valid)

            max_distance = jnp.minimum(pos, maxbw)
            max_len = n_valid - pos

            # ---- _evaluate_node: shortcut ----
            node_cost = cost[pos]
            clen = nlen[pos] & 0x1FFFFFF
            ilen = ndci[pos] & 0x7FFFFFF
            dist = ndist[pos]
            short_f = ndci[pos] >> 27
            dcode_pos = jnp.where(short_f == 0, dist + 15, short_f - 1)
            sc_ok = (
                (dist + clen <= pos) & (dist <= MAX_BACKWARD_LIMIT)
                & (dcode_pos > 0)
            )
            prev_sc = g2d(nsc, pos - clen - ilen)
            shortcut = jnp.where(
                pos == 0, 0, jnp.where(sc_ok, pos, prev_sc)
            )
            nsc = nsc.at[pos].set(jnp.where(live, shortcut, nsc[pos]))

            # push iff node_cost <= litcost(0, pos)
            zero = jnp.zeros(B, jnp.int32)
            lc0p = lit_between(zero, pos)
            do_push = live & (node_cost <= lc0p)
            # distance cache via the shortcut chain (<= 4 hops)
            cache = jnp.zeros((4, B), jnp.int32)
            p = nsc[pos]
            filled = jnp.zeros(B, jnp.int32)
            for _hop in range(4):
                ok = p > 0
                d_h = g2d(ndist, p)
                for slot in range(4):
                    cache = cache.at[slot].set(jnp.where(
                        ok & (filled == slot), d_h, cache[slot]
                    ))
                cl_h = g2d(nlen, p) & 0x1FFFFFF
                il_h = g2d(ndci, p) & 0x7FFFFFF
                nxt = g2d(nsc, p - cl_h - il_h)
                filled = filled + ok.astype(jnp.int32)
                p = jnp.where(ok, nxt, p)
            for slot in range(4):
                src = jnp.clip(slot - filled, 0, 3)
                fb = start_cache[lanes, src]
                cache = cache.at[slot].set(jnp.where(
                    slot >= filled, fb, cache[slot]
                ))

            # ---- StartPosQueue.push (ring + bubble), masked ----
            offset = (~q_idx) & 7
            new_idx = q_idx + jnp.where(do_push, 1, 0)
            costdiff = node_cost - lc0p
            rows8 = jnp.arange(8)[:, None]
            put = (rows8 == offset[None, :]) & do_push[None, :]
            q_pos = jnp.where(put, pos, q_pos)
            q_cd = jnp.where(put, costdiff[None, :], q_cd)
            q_cost = jnp.where(put, node_cost[None, :], q_cost)
            for slot in range(4):
                q_cache = q_cache.at[:, slot, :].set(jnp.where(
                    put, cache[slot][None, :], q_cache[:, slot, :]
                ))
            size = jnp.minimum(new_idx, 8)

            def take8(qf, idx):
                return jnp.take_along_axis(qf, idx[None, :], axis=0)[0]

            for i_b in range(1, 8):
                a = (offset + i_b - 1) & 7
                b_ = (offset + i_b) & 7
                do = do_push & (i_b < size)
                swap = do & (take8(q_cd, a) > take8(q_cd, b_))
                oha = (rows8 == a[None, :]) & swap[None, :]
                ohb = (rows8 == b_[None, :]) & swap[None, :]

                def sw(qf):
                    va = take8(qf, a)[None, :]
                    vb = take8(qf, b_)[None, :]
                    return jnp.where(oha, vb, jnp.where(ohb, va, qf))

                q_pos, q_cd, q_cost = sw(q_pos), sw(q_cd), sw(q_cost)
                for slot in range(4):
                    q_cache = q_cache.at[:, slot, :].set(
                        sw(q_cache[:, slot, :])
                    )
            q_idx = new_idx

            # ---- queue.at(0) + min copy length ----
            at0 = (0 - q_idx) & 7
            pd_pos = take8(q_pos, at0)
            pd_cost = take8(q_cost, at0)
            pd_cd = take8(q_cd, at0)
            pd_cache = jnp.stack(
                [take8(q_cache[:, s, :], at0) for s in range(4)]
            )
            min_cost = pd_cost + min_cost_cmd + lit_between(pd_pos, pos)

            ln0 = jnp.full(B, 2, jnp.int32)
            nlb = jnp.full(B, 4, jnp.int32)
            nlo = jnp.full(B, 10, jnp.int32)
            mc = min_cost
            done = jnp.zeros(B, jnp.bool_)
            for _ in range(MINLEN_CAP):
                cnext = g2d(cost, pos + ln0)
                ok = ~done & (pos + ln0 <= n_valid) & (cnext <= mc)
                ln_new = ln0 + 1
                hit = ok & (ln_new == nlo)
                mc = jnp.where(hit, mc + 1.0, mc)
                nlo = jnp.where(hit, nlo + nlb, nlo)
                nlb = jnp.where(hit, nlb * 2, nlb)
                ln0 = jnp.where(ok, ln_new, ln0)
                done = done | ~ok
            min_len = ln0

            # ---- k = 0 (q10: max_iters == 1) ----
            start = pd_pos
            ins_code = code_chain(pos - start, INSERT_LENGTH_OFFSET)
            base_cost = pd_cd + ins_x[ins_code] + lit_between(zero, pos)

            arrs = (cost, nlen, ndist, ndci)

            def relax(arrs, act, l, length_code, backward, short_code, c):
                cost, nlen, ndist, ndci = arrs
                tgt = jnp.clip(pos + l, 0, N)
                better = act & (c < cost[tgt, lanes])
                cost = cost.at[tgt, lanes].set(
                    jnp.where(better, c, cost[tgt, lanes]))
                nlen = nlen.at[tgt, lanes].set(jnp.where(
                    better, l | ((l + 9 - length_code) << 25),
                    nlen[tgt, lanes]))
                ndist = ndist.at[tgt, lanes].set(
                    jnp.where(better, backward, ndist[tgt, lanes]))
                ndci = ndci.at[tgt, lanes].set(jnp.where(
                    better, (short_code << 27) | (pos - start),
                    ndci[tgt, lanes]))
                return (cost, nlen, ndist, ndci)

            def fml(prev, limit, go):
                def cond(st):
                    t, alive = st
                    return jnp.any(alive)

                def body(st):
                    t, alive = st
                    m = alive & (t < limit) & (byte_at(prev + t) ==
                                               byte_at(pos + t))
                    return t + m.astype(jnp.int32), m

                t, _ = lax.while_loop(
                    cond, body,
                    (jnp.zeros(B, jnp.int32), go & (limit > 0)),
                )
                return t

            # distance-cache candidates, exact order + best_len chaining
            best_len = min_len - 1
            for j in range(16):
                backward = pd_cache[DCI[j]] + DCO[j]
                okj = (
                    live & (best_len < max_len) & (backward > 0)
                    & (backward <= max_distance)
                )
                prev = pos - backward
                okj = okj & (byte_at(prev + best_len) ==
                             byte_at(pos + best_len))
                ln = fml(prev, max_len, okj)
                use = okj & (ln >= 4)
                dist_cost = base_cost + cost_dist[lanes, j]
                use_last = jnp.full(B, j == 0, jnp.bool_)

                def lrel_body(st):
                    arrs, l, bl = st
                    act = use & (l <= ln)
                    copy_code = code_chain(l, COPY_LENGTH_OFFSET)
                    cmd_code = combine(ins_code, copy_code, use_last)
                    c = (
                        jnp.where(cmd_code < 128, base_cost, dist_cost)
                        + cp_x[copy_code]
                        + cost_cmd[lanes, jnp.clip(cmd_code, 0, 703)]
                    )
                    arrs = relax(arrs, act, l, l, backward, j + 1, c)
                    bl = jnp.where(act, l, bl)
                    return arrs, l + act.astype(jnp.int32), bl

                def lrel_cond(st):
                    arrs, l, bl = st
                    return jnp.any(use & (l <= ln))

                arrs, _, best_len = lax.while_loop(
                    lrel_cond, lrel_body,
                    (arrs, best_len + 1, best_len),
                )

            # hasher matches, exact order with monotone match_len
            match_len = min_len
            no_last = jnp.zeros(B, jnp.bool_)
            for k in range(MAXC):
                mlen_k = m_len[:, k]
                mdist_k = m_dist[:, k]
                mdelta_k = m_delta[:, k]
                has = live & (k < n_m)
                is_dict = mdist_k > max_distance
                ds, dnb = dist_sym(mdist_k)
                dist_cost = (
                    base_cost + dnb
                    + cost_dist[lanes, jnp.clip(ds & 0x3FF, 0, 1023)]
                )
                bump = has & (match_len < mlen_k) & (
                    is_dict | (mlen_k > max_zlen)
                )
                match_len = jnp.where(bump, mlen_k, match_len)

                def mrel_body(st):
                    arrs, l = st
                    act = has & (l <= mlen_k)
                    len_code = jnp.where(is_dict, mlen_k + mdelta_k, l)
                    copy_code = code_chain(len_code, COPY_LENGTH_OFFSET)
                    cmd_code = combine(ins_code, copy_code, no_last)
                    c = (
                        dist_cost + cp_x[copy_code]
                        + cost_cmd[lanes, jnp.clip(cmd_code, 0, 703)]
                    )
                    arrs = relax(arrs, act, l, len_code, mdist_k, 0, c)
                    return arrs, l + act.astype(jnp.int32)

                def mrel_cond(st):
                    arrs, l = st
                    return jnp.any(has & (l <= mlen_k))

                arrs, ml2 = lax.while_loop(
                    mrel_cond, mrel_body, (arrs, match_len)
                )
                match_len = jnp.where(has, ml2, match_len)

            cost, nlen, ndist, ndci = arrs
            return (cost, nlen, ndist, ndci, nsc,
                    q_pos, q_cd, q_cost, q_cache, q_idx), 0

        xs = (
            jnp.arange(N, dtype=jnp.int32),
            m_len_a, m_dist_a, m_delta_a, n_m_a, active_a,
        )
        init = (cost, nlen, ndist, ndci, nsc,
                q_pos, q_cd, q_cost, q_cache, q_idx)
        (cost, nlen, ndist, ndci, nsc, *_), _ = lax.scan(step, init, xs)
        return cost, nlen, ndist, ndci, nsc

    return dp


def zopfli_commands_device(data: bytes, quality: int = 10):
    """q10 optimal parse with the DP on device: returns the command list
    (decision-equal to host `create_zopfli_backward_references`)."""
    import jax
    import jax.numpy as jnp

    from ..encode.api import _NO_MASK, _padded

    n = len(data)
    padded = _padded(bytes(data))
    model = ZopfliCostModel(n, 544)
    model.set_from_literal_costs(0, padded, _NO_MASK)
    m_len, m_dist, m_delta, n_m, active = collect_matches(data, quality)

    B = 1
    data8 = np.zeros((B, n + PAD), np.int32)
    data8[0, : n + 8] = np.frombuffer(bytes(padded[: n + 8]), np.uint8)
    lit_cost = np.zeros((B, n + 2), np.float64)
    lit_cost[0] = np.asarray(model.literal_costs[: n + 2], np.float64)
    cost_cmd = np.asarray(model.cost_cmd, np.float64)[None, :].repeat(B, 0)
    cost_dist = np.full((B, 1024), np.inf, np.float64)
    cost_dist[0, :544] = np.asarray(model.cost_dist, np.float64)
    start_cache = np.asarray([[4, 11, 15, 16]], np.int32).repeat(B, 0)

    with jax.enable_x64(True):
        dp = _build_dp(n, B, max_zopfli_len(quality), MAX_BACKWARD_LIMIT)
        out = jax.jit(dp)(
            jnp.asarray(data8), jnp.asarray(lit_cost),
            jnp.asarray(cost_cmd), jnp.asarray(cost_dist),
            jnp.asarray(np.float64(model.get_min_cost_cmd())),
            jnp.asarray(start_cache),
            jnp.asarray(np.int32(n)),
            jnp.asarray(m_len[:, None, :].repeat(B, 1)),
            jnp.asarray(m_dist[:, None, :].repeat(B, 1)),
            jnp.asarray(m_delta[:, None, :].repeat(B, 1)),
            jnp.asarray(n_m[:, None].repeat(B, 1)),
            jnp.asarray(active[:, None].repeat(B, 1)),
        )
        cost, nlen, ndist, ndci, nsc = (np.asarray(x) for x in out)

    nodes = []
    for i in range(n + 1):
        node = ZopfliNode()
        node.length = int(nlen[i, 0])
        node.distance = int(ndist[i, 0])
        node.dcode_insert_length = int(ndci[i, 0])
        node.cost = float(cost[i, 0])
        node.shortcut = int(nsc[i, 0])
        nodes.append(node)
    _compute_shortest_path(n, nodes)
    dist_cache = [4, 11, 15, 16]
    commands, _, last_insert = _create_commands_from_path(
        n, 0, nodes, dist_cache, 0, 0, 0
    )
    return commands, last_insert
