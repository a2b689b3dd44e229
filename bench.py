"""Benchmark: end-to-end decode, device encode, and scaling proxy (real TPU).

Prints one JSON line per metric:
  e2e_decode_throughput_1chip   — compressed bits -> decoded BYTES IN HBM
                                  (entropy kernel + on-device LZ resolve;
                                  nothing host-side in the timed region);
                                  extra fields: err_lanes on the timed
                                  batch, preflight_ms_per_batch (host
                                  header parse + table staging cost)
  e2e_decode_sustained_1chip    — per-batch host preflight overlapped with
                                  the in-flight device batch (the pipeline
                                  number; burst_fraction vs metric 1)
  decode_multibatch_scaling     — N*t(1)/t(N) for N independent batches
                                  stacked in ONE jitted computation (the
                                  scale-out proxy the tunnel cannot distort)
  entropy_decode_throughput_1chip — the token phase alone (round-1 metric,
                                  kept for continuity)
  device_encode_throughput_1chip — the WHOLE encode pipeline steady-state:
                                  match/parse/record stages + host table
                                  build + Pallas pack + device stream
                                  assembly; compressed streams end resident
                                  in HBM (host download of the streams is
                                  excluded — the dev tunnel's ~1 MB/s
                                  device->host path is a harness artifact,
                                  not a chip property); ratio measured on
                                  the same batch
  decode_dispatch_overlap        — async multi-batch dispatch efficiency on
                                  one chip (scaling proxy; real multi-chip
                                  paths are validated by dryrun_multichip)

Baselines: the reference's single-core JS decode ~0.15 GB/s (BASELINE.md,
noto-tc 7 MB / 47 ms on M2 Max) and q11 encode ~15 MB/s.

Methodology (CLAUDE.md measurement discipline): REP invocations inside one
jit, a scalar fetch forces completion, and the axon tunnel's per-invocation
round-trip is measured on a trivial op and subtracted; Pallas kernels are
side-effecting so they cannot be hoisted out of the repeat loop
(perturb=False).  An untimed correctness gate runs the FULL pipeline at the
same chunk/group configuration as the timed batch and must reproduce the
input bit-exactly with zero fallback lanes.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_DECODE_GBPS = 0.15   # reference decode, M2 Max single core
BASELINE_ENCODE_MBPS = 15.0   # reference q11 encode, M2 Max single core

# e2e decode configuration. The resolve kernel bounds inter-lane output
# skew by its ring headroom (V - FLUSH rows); the e2e batch therefore uses
# the TEXT corpus (narrow compression-rate spread) with rate-sorted slots,
# while the entropy-phase metric keeps round-1's mixed corpus.
E2E_CHUNK = 8192
E2E_H = 2048      # resolve ring (V=512): the O(V) sweeps bound throughput
E2E_GROUPS = 4    # 4096 streams, 33.6 MB timed batch
ENT_CHUNK = 32768
ENT_GROUPS = 8
ENC_CHUNK = 32768
ENC_DEPTH = 4  # d8 buys <0.001 ratio over d4 and doubles the match sorts
ENC_TABLE_GROUPS = 8   # native table builder (6.1 ms/group) makes 8 groups
                       # ~50 ms host work per 33.5 MB batch; ratio 0.4459
                       # vs 0.4554 at tg=2 (round-4 exact-size probe)
ENC_CTX_TREES = 8      # context-mapped literal trees (UTF8 mode)
FF_CHUNK = 4096        # full-format (v3) decode batch chunk size
FF_H = 1024            # VMEM ring per group (far-fetch covers beyond)
FF_GROUPS = 6          # interleaved lane-groups: the v3 symbol chain is
                       # latency-bound, so independent groups fill bubbles
                       # (v2 measured near-linear to G=12)
REP = 3

TEXT_FIXTURES = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
)
FIXTURES = TEXT_FIXTURES + (
    "/root/reference/bench/fixtures/enc-ttf.bin",
)


def _emit(metric, value, unit, vs_baseline, **extra):
    line = {"metric": metric, "value": round(value, 1), "unit": unit,
            "vs_baseline": round(vs_baseline, 4)}
    line.update(extra)
    print(json.dumps(line), flush=True)


def _chip_available(timeout_s: int = 240) -> bool:
    """Probe the TPU in a subprocess: a wedged chip hangs jax backend init
    for tens of minutes (watchdog recovery is hours) — fail fast with an
    explicit metric line instead."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; print(int(jnp.arange(4).sum()))"],
            capture_output=True, timeout=timeout_s,
        )
        return r.returncode == 0 and b"6" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _chip_available():
        _emit("chip_unavailable", 0.0, "none", 0.0,
              note="TPU backend init failed/hung (wedged chip?); see "
                   "CLAUDE.md Mosaic pitfalls - watchdog recovery is slow")
        raise SystemExit(1)

    import jax
    import jax.numpy as jnp

    from brotli_tpu.encode.sharded import encode_sharded
    from brotli_tpu.ops import device_encode as DE
    from brotli_tpu.ops import pallas_decode2 as P2
    from brotli_tpu.ops import pallas_resolve as PR
    from brotli_tpu.utils import time_device_fn

    base = b"".join(open(f, "rb").read() for f in FIXTURES)

    # ---- metric 1: end-to-end decode (entropy + resolve, bytes in HBM) ----
    text = b"".join(open(f, "rb").read() for f in TEXT_FIXTURES)
    data = (text * 64)[: 1024 * E2E_CHUNK * E2E_GROUPS]
    streams = encode_sharded(data, chunk_size=E2E_CHUNK,
                             max_distance=E2E_H - 16)

    # correctness gate (untimed): the FULL library path at the SAME
    # chunk/group config as the timed batch, bit-exact with 0 fallbacks
    got = P2.decode_batch_device_e2e(streams, H=E2E_H, groups=E2E_GROUPS)
    assert b"".join(got) == data, "bench correctness gate failed"
    assert P2.fallback_stats()["lanes_fallback"] == 0, "gate lanes fell back"

    t0 = time.time()
    batch = P2.preflight_shared(streams, groups=E2E_GROUPS, rate_sort=True)
    preflight_s = time.time() - t0
    assert batch is not None
    n_blocks = P2.plan_blocks(batch)
    kernel = P2.get_kernel(
        batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, False,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    rows = n_blocks * P2.DEFAULT_BLOCK_ROWS
    mlens = batch.mlens
    max_mlen = int(mlens.max())
    n_out = max(PR.FLUSH, -(-max_mlen // 4 // PR.FLUSH) * PR.FLUSH)
    args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                                     batch.dist_t, batch.dx_t, batch.consts,
                                     batch.scal)]
    # untimed first run: trim the all-pad token tail the entropy row budget
    # over-provisions (the resolve cursor walks every row it is given)
    out0 = kernel(*args)
    r_cap = P2.used_token_rows(out0, n_blocks)
    rkernel = PR.get_resolve_kernel(r_cap, n_out, E2E_H // 4, PR.DEFAULT_DT,
                                    E2E_GROUPS, None, False)
    scal_j = jnp.asarray(mlens.astype(np.int32).reshape(E2E_GROUPS * 8, 128))

    def e2e(*a):
        out = kernel(*a)
        toks = jnp.transpose(
            out[:r_cap].reshape(r_cap, E2E_GROUPS, 8, 128), (1, 0, 2, 3)
        ).reshape(E2E_GROUPS * r_cap, 8, 128)
        res = rkernel(toks, scal_j)
        return res[0, 0, :8].astype(jnp.int32)

    t_e2e = time_device_fn(e2e, *args, rep=REP, samples=3, perturb=False)
    total = int(mlens.sum())
    e2e_j = jax.jit(e2e)
    int(e2e_j(*args).reshape(-1)[0])  # warm the top-level jit
    # untimed flag check: the timed batch itself must fully resolve
    toks0 = jnp.transpose(
        out0[:r_cap].reshape(r_cap, E2E_GROUPS, 8, 128), (1, 0, 2, 3)
    ).reshape(E2E_GROUPS * r_cap, 8, 128)
    res4 = rkernel(toks0, scal_j).reshape(E2E_GROUPS, n_out + 8, 8, 128)
    errs = np.asarray(res4[:, n_out]).reshape(-1)
    n_err = int((errs[: batch.n_streams] != 0).sum())
    gbps = total / t_e2e / 1e9
    _emit("e2e_decode_throughput_1chip", gbps * 1000, "MB/s",
          gbps / BASELINE_DECODE_GBPS, err_lanes=n_err,
          batch_mb=round(total / 1e6, 1),
          preflight_ms_per_batch=round(preflight_s * 1e3, 1))

    # ---- metric 1b: sustained decode (host preflight vs device overlap) ----
    # Burst throughput stages tables once; a production pipeline re-runs the
    # host preflight per batch.  Here batch k's kernel is dispatched async,
    # the NEXT batch's full host preflight (native header parse + table
    # build + staging) runs while it flies, then a scalar fetch syncs.
    # Dispatch round-trips are the dev tunnel's ~29 ms artifact (production
    # dispatch is ~100 us) and are measured + subtracted per iteration.
    from brotli_tpu.utils.benchmarks import measure_rtt

    rtt = measure_rtt()
    N_SUS = 4
    t0 = time.time()
    for _ in range(N_SUS):
        h = e2e_j(*args)                      # dispatch, async
        P2.preflight_shared(streams, groups=E2E_GROUPS, rate_sort=True)
        int(h.reshape(-1)[0])                 # sync batch k
    t_sus = max(1e-9, (time.time() - t0 - N_SUS * rtt) / N_SUS)
    sus_gbps = total / t_sus / 1e9
    _emit("e2e_decode_sustained_1chip", sus_gbps * 1000, "MB/s",
          sus_gbps / BASELINE_DECODE_GBPS,
          burst_fraction=round(t_e2e / t_sus, 3))

    # ---- metric 1c: multi-batch scaling inside ONE jit (no dispatch) ----
    # N independent per-device batches stacked as N lane-groups in a single
    # jitted computation vs one batch alone: the marginal per-batch cost is
    # the honest single-host analog of data-parallel scale-out (the tunnel
    # serializes separate dispatches, so round 3's async-dispatch proxy
    # measured the tunnel, not the chip).  Efficiency N*t(1)/t(N) >= 1
    # means per-batch cost does not grow when batches share a computation.
    streams_1g = streams[:1024]
    b1 = P2.preflight_shared(streams_1g, groups=1, rate_sort=True)
    nb1 = P2.plan_blocks(b1)
    k1 = P2.get_kernel(
        b1.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, nb1,
        b1.npostfix, b1.ndirect, b1.maxbw, False,
        lit_k=b1.lit_k, cmd_k=b1.cmd_k, dist_k=b1.dist_k,
        dx_k=b1.dx_k, groups=1,
    )
    args1 = [jnp.asarray(x) for x in (b1.wt, b1.lit_t, b1.cmd_t, b1.dist_t,
                                      b1.dx_t, b1.consts, b1.scal)]
    out01 = k1(*args1)
    r_cap1 = P2.used_token_rows(out01, nb1)
    max_mlen1 = int(b1.mlens.max())
    n_out1 = max(PR.FLUSH, -(-max_mlen1 // 4 // PR.FLUSH) * PR.FLUSH)
    rk1 = PR.get_resolve_kernel(r_cap1, n_out1, E2E_H // 4, PR.DEFAULT_DT,
                                1, None, False)
    scal1 = jnp.asarray(b1.mlens.astype(np.int32).reshape(8, 128))

    def e2e_1(*a):
        out = k1(*a)
        res = rk1(out[:r_cap1], scal1)
        return res[0, 0, :8].astype(jnp.int32)

    t1 = time_device_fn(e2e_1, *args1, rep=REP, samples=3, perturb=False)
    eff = (E2E_GROUPS * t1) / t_e2e
    _emit("decode_multibatch_scaling", eff, "x", eff, n=E2E_GROUPS,
          t1_ms=round(t1 * 1e3, 1), tn_ms=round(t_e2e * 1e3, 1))

    # ---- metric 2: entropy phase alone (round-1 continuity) ----
    data2 = (base * 64)[: 1024 * ENT_CHUNK]
    streams2 = encode_sharded(data2, chunk_size=ENT_CHUNK) * ENT_GROUPS
    b2 = P2.preflight_shared(streams2, groups=ENT_GROUPS)
    nb2 = P2.plan_blocks(b2)
    k2 = P2.get_kernel(
        b2.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, nb2,
        b2.npostfix, b2.ndirect, b2.maxbw, False,
        lit_k=b2.lit_k, cmd_k=b2.cmd_k, dist_k=b2.dist_k,
        dx_k=b2.dx_k, groups=b2.groups,
    )
    args2 = [jnp.asarray(x) for x in (b2.wt, b2.lit_t, b2.cmd_t, b2.dist_t,
                                      b2.dx_t, b2.consts, b2.scal)]
    t_ent = time_device_fn(
        lambda *a: k2(*a)[:8].astype(jnp.int32), *args2, rep=4, samples=3,
        perturb=False,
    )
    g2 = int(b2.mlens.sum()) / t_ent / 1e9
    _emit("entropy_decode_throughput_1chip", g2 * 1000, "MB/s",
          g2 / BASELINE_DECODE_GBPS)

    # ---- metric 3: device encode, whole pipeline steady-state ----
    data3 = (base * 64)[: 1024 * ENC_CHUNK]
    # input staged in HBM once (untimed): the dev tunnel's host->device path
    # is a harness artifact; production inputs arrive at PCIe/DMA rates
    pad3 = ENC_CHUNK * DE.B_LANES - len(data3)
    arr3 = np.frombuffer(data3 + b"\x00" * pad3, np.uint8).reshape(
        DE.B_LANES, ENC_CHUNK
    )
    data_np3 = np.concatenate(
        [arr3, np.zeros((DE.B_LANES, DE.MATCH_CAP + 4), np.uint8)], axis=1
    )
    nv3 = np.full(DE.B_LANES, ENC_CHUNK, np.int32)
    dev_in = (jnp.asarray(data_np3), jnp.asarray(nv3))

    def encode_start():
        return DE._encode_start(data3, ENC_CHUNK, 1, 2048,
                                None, ENC_DEPTH, device_input=dev_in,
                                lit_ctx=ENC_CTX_TREES > 1, hist_stride=16)

    def encode_once():
        state = encode_start()
        DE._encode_mid(state, 22, False, ENC_TABLE_GROUPS, ENC_CTX_TREES)
        sizes = DE.stream_sizes(state)   # status fetch syncs the pipeline
        return state, sizes

    # warm-up run compiles everything and feeds the correctness gate
    state, sizes = encode_once()
    enc_streams = DE._encode_finish(state)
    ratio = sum(len(s) for s in enc_streams) / len(data3)
    from brotli_tpu.decode import decode as host_decode

    assert b"".join(host_decode(s) for s in enc_streams[:3]) \
        == data3[: 3 * ENC_CHUNK], "encode gate failed"
    ovf3 = np.asarray(state["status"])[5].reshape(-1)
    assert all(
        len(s) == sz for s, sz, o in zip(enc_streams, sizes, ovf3) if not o
    ), "size accounting mismatch"

    # steady state, PIPELINED: batch k+1's device stages are dispatched
    # before batch k's host table build, so sorts/parse overlap the host
    # work; full pipeline per batch (stages + tables + pack + device
    # assembly), jits cached, compressed streams resident in HBM
    t0 = time.time()
    st = encode_start()
    for k in range(REP):
        st_next = encode_start() if k + 1 < REP else None
        DE._encode_mid(st, 22, False, ENC_TABLE_GROUPS, ENC_CTX_TREES)
        DE.stream_sizes(st)
        st = st_next
    t_enc = (time.time() - t0) / REP
    mbps = len(data3) / t_enc / 1e6
    _emit("device_encode_throughput_1chip", mbps, "MB/s",
          mbps / BASELINE_ENCODE_MBPS, ratio=round(ratio, 4),
          wall_s=round(t_enc, 2))

    # ---- metric 5: full-format device decode (v3 fused kernel) ----
    # context-mapped literal trees + tree groups decoded ON DEVICE: the
    # batch is this framework's own context-modeled encode (the streams any
    # conformant brotli decoder accepts); the untimed capability gate also
    # decodes Google-encoded corpus vectors + an all-transform-class
    # static-dictionary stream bit-exactly through the same kernel.
    from brotli_tpu.ops import pallas_decode3 as P3

    # FF_GROUPS independent 1024-stream lane-groups (per-batch tables give
    # each batch its own signature, so they bin into separate groups and
    # interleave in ONE kernel — the latency-hiding lever)
    ff_data = (text * 64)[: FF_GROUPS * 1024 * FF_CHUNK]
    ff_streams = []
    for gi in range(FF_GROUPS):
        piece = ff_data[gi * 1024 * FF_CHUNK:(gi + 1) * 1024 * FF_CHUNK]
        ff_streams.extend(DE.encode_device_batch(
            piece, chunk_size=FF_CHUNK, max_distance=FF_H - 16,
            chain_depth=ENC_DEPTH, table_groups=1,
            lit_ctx_trees=ENC_CTX_TREES,
        ))
    gate_names = ["ukkonooa", "10x10y", "64x", "monkey", "cp852-utf8"]
    gdir = "/root/reference/test/fixtures/vectors"
    gstreams = [open(f"{gdir}/{n}.compressed", "rb").read()
                for n in gate_names]
    gexp = [open(f"{gdir}/{n}", "rb").read() for n in gate_names]
    try:
        # H=1024: the round-5 full-path caps (160 lit trees / 128 block
        # types) put the H=2048 variant 2% over the 16 MB scoped-VMEM
        # limit; far-fetch serves beyond-ring distances either way
        got_g = P3.decode_batch_v3(gstreams, H=1024, max_groups=8)
        n_vec_ok = sum(int(a == b) for a, b in zip(got_g, gexp))

        ff_batch = P3.preflight_v3(ff_streams, max_groups=FF_GROUPS)
        assert ff_batch is not None, "full-format batch must be v3-eligible"
        # our own streams carry no static-dictionary refs: use_dict=False
        # drops the per-row DICT phase + dictionary VMEM from the timed
        # kernel
        k3, a3, n_out3 = P3.staged_v3(ff_batch, H=FF_H, use_dict=False)
        out3 = k3(*a3)
        out3_np = np.asarray(out3).reshape(
            ff_batch.groups, n_out3 + P3.TAIL, 8, 128
        )
        errs3 = out3_np[:, n_out3].reshape(-1)
        n_err3 = int((errs3[: ff_batch.n_streams] != 0).sum())
        # untimed bit-exactness gate on the timed batch itself
        by_stream = np.transpose(out3_np[:, :n_out3], (0, 2, 3, 1)).reshape(
            ff_batch.groups * 1024, -1
        )
        raw3 = np.ascontiguousarray(by_stream).astype("<u4").view(np.uint8)
        raw3 = raw3.reshape(ff_batch.groups * 1024, -1)
        for slot in range(ff_batch.groups * 1024):
            i = int(ff_batch.perm[slot])
            if 0 <= i < ff_batch.n_streams and errs3[slot] == 0:
                assert bytes(raw3[slot, : ff_batch.mlens[slot]]) == \
                    ff_data[i * FF_CHUNK:(i + 1) * FF_CHUNK], \
                    "v3 gate mismatch"
        t_ff = time_device_fn(
            lambda *a: k3(*a)[0, 0, :8].astype(jnp.int32), *a3,
            rep=REP, samples=3, perturb=False,
        )
        ff_gbps = int(ff_batch.mlens.sum()) / t_ff / 1e9
        _emit("fullformat_decode_throughput_1chip", ff_gbps * 1000, "MB/s",
              ff_gbps / BASELINE_DECODE_GBPS, err_lanes=n_err3,
              batch_mb=round(int(ff_batch.mlens.sum()) / 1e6, 1),
              google_vectors_ok=f"{n_vec_ok}/{len(gate_names)}")
    except Exception as exc:  # noqa: BLE001
        _emit("fullformat_decode_throughput_1chip", 0.0, "MB/s", 0.0,
              error=str(exc)[:200])

    # ---- metric 5b: the reference's own headline fixtures on device ----
    # enc-ttf.br (80 literal trees / 61 block types, lgwin-22 distances)
    # and enc-otf.br decoded END-TO-END on the TPU through the full-path
    # caps + HBM far-fetch (VERDICT r4 missing #1).  The batch replicates
    # each fixture across a lane group (identical streams run in perfect
    # lockstep, so the far-fetch window is fully coherent — the favorable
    # but real layout for CDN-style hot-file decode).  Correctness gate:
    # bit-exact against the .bin pair on every lane.
    fix_names = ["enc-ttf", "enc-otf"]
    fdir = "/root/reference/bench/fixtures"
    # H=1024: largest ring the round-5 full-caps + static-dict VMEM budget
    # compiles under the 16 MB scoped-VMEM limit; lgwin-22 distances beyond
    # the ring are served by the HBM far-fetch window
    REFFIX_H = 1024
    try:
        fix_entries = []
        fix_exp = []
        from brotli_tpu.decode.bitreader import BitReader
        from brotli_tpu.decode.engine import (
            _MetablockState, _decode_window_bits, _read_metablock_length,
        )

        tot_bytes = 0
        tot_time = 0.0
        n_errf = 0
        for nme in fix_names:
            sb = open(f"{fdir}/{nme}.br", "rb").read()
            exp = open(f"{fdir}/{nme}.bin", "rb").read()
            br = BitReader(sb)
            wb, _ = _decode_window_bits(br, False)
            ie = bool(br.read(1))
            if ie:
                assert br.read(1) == 0
            mbl, is_unc, is_meta = _read_metablock_length(br, ie)
            assert not is_unc and not is_meta
            stx = _MetablockState(br, large_window=False)
            assert P3._caps_full_ok(stx)
            pad = (-len(sb)) % 4 + 12
            wrds = np.frombuffer(sb + b"\x00" * pad, dtype="<u4")
            fix_entries = [
                P3._EntryV3(
                    idx=lane, st=stx, words=wrds, bitpos=br.bitpos,
                    mlen=mbl, maxbw=(1 << wb) - 16, sig=P3._sig_of(stx),
                )
                for lane in range(1024)
            ]
            fb = P3.assemble_v3(fix_entries, max_groups=1)
            kf, af, n_outf = P3.staged_v3(fb, H=REFFIX_H)
            outf = kf(*af)
            outf_np = np.asarray(outf).reshape(
                1, n_outf + P3.TAIL, 8, 128
            )
            errf = outf_np[:, n_outf].reshape(-1)
            n_errf += int((errf != 0).sum())
            byf = np.transpose(outf_np[:, :n_outf], (0, 2, 3, 1)).reshape(
                1024, -1
            )
            rawf = np.ascontiguousarray(byf).astype("<u4").view(np.uint8)
            rawf = rawf.reshape(1024, -1)
            for slot in range(1024):
                if errf[slot] == 0:
                    assert bytes(rawf[slot, : fb.mlens[slot]]) == exp, \
                        f"reference fixture gate mismatch ({nme})"
            assert int((errf == 0).sum()) == 1024, \
                f"{nme}: {int((errf != 0).sum())}/1024 lanes flagged " \
                f"(codes {sorted(set(int(e) for e in errf if e))}) - a " \
                "failed batch must not be timed"
            t_fix = time_device_fn(
                lambda *a: kf(*a)[0, 0, :8].astype(jnp.int32), *af,
                rep=REP, samples=3, perturb=False,
            )
            tot_bytes += int(fb.mlens.sum())
            tot_time += t_fix
        fix_gbps = tot_bytes / tot_time / 1e9
        _emit("reference_fixture_decode_1chip", fix_gbps * 1000, "MB/s",
              fix_gbps / BASELINE_DECODE_GBPS, err_lanes=n_errf,
              fixtures="enc-ttf+enc-otf", lanes_per_fixture=1024,
              batch_mb=round(tot_bytes / 1e6, 1))
    except Exception as exc:  # noqa: BLE001
        _emit("reference_fixture_decode_1chip", 0.0, "MB/s", 0.0,
              error=str(exc)[:200])

    # ---- metric 4: dispatch-overlap scaling proxy (one chip) ----
    # async-dispatch N kernels then sync, vs N synchronous runs: the ratio
    # N*t1/tN measures how well independent per-device batches overlap —
    # the single-host analog of the data-parallel scale-out path.
    def one(*a):
        return k2(*a)[:8].astype(jnp.int32)

    jitted = jax.jit(one)
    int(jitted(*args2).reshape(-1)[0])  # warm
    t0 = time.time()
    outs = [jitted(*args2) for _ in range(4)]
    for o in outs:
        int(o.reshape(-1)[0])
    t_async = time.time() - t0
    t0 = time.time()
    for _ in range(4):
        int(jitted(*args2).reshape(-1)[0])
    t_sync = time.time() - t0
    _emit("decode_dispatch_overlap", t_sync / t_async, "x",
          (t_sync / t_async) / 4.0, n=4)


if __name__ == "__main__":
    main()
