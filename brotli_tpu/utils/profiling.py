"""Profiling: device traces plus per-phase pipeline timing reports.

`trace` wraps jax.profiler for xprof/tensorboard captures.  `profile_e2e_decode`
produces the per-phase breakdown of the flagship decode pipeline — host
preflight, entropy kernel, LZ-resolve kernel — with the measurement
discipline the dev tunnel demands (see CLAUDE.md): device phases are timed
with REP invocations inside one jit and the tunnel round-trip subtracted
(`time_device_fn`), host phases with perf_counter.  This is the library
form of the ad-hoc breakdowns in tools/diag_e2e.py / tools/diag_encode.py
(reference analog: the bench harness timings in bench/decode.ts — the
reference has no per-stage profiler; this is a TPU-native addition).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time
from typing import Any


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/brotli_tpu_trace"):
    """Context manager: profile the enclosed device work.

    View with tensorboard/xprof pointed at `log_dir`."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class Phase:
    """One timed pipeline phase."""

    name: str
    seconds: float
    kind: str                     # "host" | "device"
    extra: dict[str, Any] = dataclasses.field(default_factory=dict)


def phase_report(phases: list[Phase], total_bytes: int | None = None) -> str:
    """Aligned text table of a phase list; per-phase MB/s when sized."""
    width = max(len(p.name) for p in phases)
    lines = []
    for p in phases:
        rate = ""
        if total_bytes and p.seconds > 0:
            rate = f"  {total_bytes / p.seconds / 1e6:8.1f} MB/s"
        ex = "  ".join(f"{k}={v}" for k, v in p.extra.items())
        lines.append(f"{p.name:<{width}}  {p.seconds * 1e3:9.2f} ms"
                     f"  [{p.kind}]{rate}  {ex}".rstrip())
    return "\n".join(lines)


def profile_e2e_decode(streams: list[bytes], H: int = 2048,
                       groups: int = 1, rep: int = 2,
                       interpret: bool = False):
    """Per-phase timing of the device decode fast path on `streams`.

    Returns (phases, summary): host preflight, entropy kernel, resolve
    kernel, and the fused e2e device chain, each timed separately; the
    summary carries throughput, error-lane count, and the token-row
    budget/use that bound the resolve cost.  Kernel phases include an
    untimed warm-up call, so compile time never pollutes the numbers.
    """
    import jax.numpy as jnp
    import numpy as np

    from ..ops import pallas_decode2 as P2
    from ..ops import pallas_resolve as PR
    from .benchmarks import time_device_fn

    phases: list[Phase] = []
    t0 = time.perf_counter()
    batch = P2.preflight_shared(streams, groups=groups, rate_sort=True)
    if batch is None:
        raise ValueError("streams are not eligible for the shared fast path")
    phases.append(Phase("preflight (host)", time.perf_counter() - t0, "host",
                        {"streams": len(streams)}))

    n_blocks = P2.plan_blocks(batch)
    kernel = P2.get_kernel(
        batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
        batch.npostfix, batch.ndirect, batch.maxbw, interpret,
        lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
        dx_k=batch.dx_k, groups=batch.groups,
    )
    args = [jnp.asarray(x) for x in (batch.wt, batch.lit_t, batch.cmd_t,
                                     batch.dist_t, batch.dx_t, batch.consts,
                                     batch.scal)]
    out0 = kernel(*args)          # warm-up + token-row trim source
    r_cap = P2.used_token_rows(out0, n_blocks)
    t_ent = time_device_fn(lambda *a: kernel(*a)[:8].astype(jnp.int32),
                           *args, rep=rep, samples=2, perturb=False)
    rows = n_blocks * P2.DEFAULT_BLOCK_ROWS
    phases.append(Phase("entropy kernel", t_ent, "device",
                        {"row_budget": rows, "rows_used": int(r_cap)}))

    mlens = batch.mlens
    n_out = max(PR.FLUSH, -(-int(mlens.max()) // 4 // PR.FLUSH) * PR.FLUSH)
    rkernel = PR.get_resolve_kernel(r_cap, n_out, H // 4, PR.DEFAULT_DT,
                                    groups, None, interpret)
    scal_j = jnp.asarray(mlens.astype(np.int32).reshape(groups * 8, 128))

    def to_tokens(out):
        return jnp.transpose(
            out[:r_cap].reshape(r_cap, groups, 8, 128), (1, 0, 2, 3)
        ).reshape(groups * r_cap, 8, 128)

    toks0 = to_tokens(out0)
    res0 = rkernel(toks0, scal_j)  # warm-up + error-flag source
    t_res = time_device_fn(
        lambda t, s: rkernel(t, s)[0, 0, :8].astype(jnp.int32),
        toks0, scal_j, rep=rep, samples=2, perturb=False)
    res4 = np.asarray(res0).reshape(groups, n_out + 8, 8, 128)
    errs = res4[:, n_out].reshape(-1)[: batch.n_streams]
    phases.append(Phase("resolve kernel", t_res, "device",
                        {"err_lanes": int((errs != 0).sum()), "H": H}))

    t_e2e = time_device_fn(
        lambda *a: rkernel(to_tokens(kernel(*a)),
                           scal_j)[0, 0, :8].astype(jnp.int32),
        *args, rep=rep, samples=2, perturb=False)
    phases.append(Phase("e2e device chain", t_e2e, "device"))

    total = int(mlens.sum())
    summary = {
        "bytes": total,
        "e2e_mbps": total / t_e2e / 1e6,
        "err_lanes": int((errs != 0).sum()),
        "token_rows_used": int(r_cap),
        "token_row_budget": rows,
    }
    return phases, summary


def profile_device_encode(data: bytes, *, chunk_size: int = 32768,
                          chain_depth: int = 4, table_groups: int = 2,
                          lit_ctx_trees: int = 8, hist_stride: int = 16,
                          sample_stride: int = 256,
                          interpret: bool = False):
    """Per-phase timing of the device encode pipeline on `data`.

    One warm run compiles every jit; the timed run then splits the
    steady-state wall into the pipeline's sync points: the match/parse
    stage chain (dispatch + sample-fetch sync), the host cluster/table
    build + histogram/pack/assembly dispatch, and the final size fetch
    that drains the device queue.  Returns (phases, summary) with the
    steady-state MB/s and exact compressed ratio.  The phase split is
    wall-clock at the sync boundaries (tunnel round-trips included) —
    it mirrors bench.py metric 3 rather than the RTT-subtracted kernel
    timings, because encode throughput is a whole-pipeline number.
    """
    import numpy as np

    from ..ops import device_encode as DE

    def run(timed):
        phases = []
        t0 = time.perf_counter()
        state = DE._encode_start(data, chunk_size, 1, sample_stride, None,
                                 chain_depth, lit_ctx=lit_ctx_trees > 1,
                                 hist_stride=hist_stride)
        np.asarray(state["rec0_sample_dev"])   # sync the stage chain
        phases.append(Phase("match/parse stages", time.perf_counter() - t0,
                            "device", {"chunks": state["n_chunks"]}))
        t0 = time.perf_counter()
        DE._encode_mid(state, 22, interpret, table_groups, lit_ctx_trees)
        phases.append(Phase("tables + pack dispatch",
                            time.perf_counter() - t0, "host"))
        t0 = time.perf_counter()
        sizes = DE.stream_sizes(state)
        phases.append(Phase("assembly sync", time.perf_counter() - t0,
                            "device"))
        return phases, sizes

    run(False)                                  # warm: compile everything
    t0 = time.perf_counter()
    phases, sizes = run(True)
    wall = time.perf_counter() - t0
    summary = {
        "bytes": len(data),
        "encode_mbps": len(data) / wall / 1e6,
        "ratio": float(np.sum(sizes)) / len(data),
    }
    return phases, summary
