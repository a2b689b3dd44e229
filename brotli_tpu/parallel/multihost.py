"""Multi-host (multi-process) scaling for the batch codec.

The reference is single-threaded (SURVEY.md section 2.3); the TPU-native
scale-out design is two-level, matching the hardware fabric:

  * intra-host: per-device data parallelism over ICI — the
    `mesh.py` paths (encode_batches_multichip / decode_batches_multichip)
    run the flagship kernels on every local device;
  * inter-host: batch distribution over DCN — each PROCESS owns the
    batches `pid::nprocs` (host-level round-robin), runs its own host
    preflight + local-device dispatch, and the compressed/decoded results
    are reassembled IN ORDER across hosts with a zero-padded global sum
    (`process_allgather`): every process contributes its own rows, zeros
    elsewhere, so the sum is an ordered scatter-gather with no
    coordination beyond the collective itself.

There is no NCCL/MPI to write (SURVEY section 5 "distributed backend"):
`jax.distributed.initialize` + JAX collectives over the global mesh ARE
the backend; on real pods the same code rides ICI within a slice and DCN
across hosts.

Simulation: `tools/multihost_sim.py` launches N real OS processes with a
local coordinator and CPU devices per process
(`--xla_force_host_platform_device_count`), exactly the JAX-documented
multi-process topology, so per-host preflight, batch ownership, and
cross-host ordered reassembly run for real — only the transport under
the collectives is local.
"""

from __future__ import annotations

import numpy as np


def init_multihost(coordinator: str, process_id: int, num_processes: int,
                   local_devices: int = 4) -> None:
    """Initialize this process as one host of a multi-host run.

    CPU simulation: forces `local_devices` virtual CPU devices before the
    backend locks (the axon TPU plugin overrides JAX_PLATFORMS, so the
    config.update must happen first).  On real multi-host TPU the
    device count argument is ignored by the platform.
    """
    import os

    import jax

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={local_devices}"
        ).strip()
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_local_mesh(axis_name: str = "streams"):
    """Mesh over THIS process's devices (the intra-host ICI analog)."""
    import jax
    from jax.sharding import Mesh

    return Mesh(np.array(jax.local_devices()), (axis_name,))


def _barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Rendezvous through the coordination service before entering a
    Gloo collective: on a 1-core simulation host, worker compute skew can
    exceed Gloo's ~30 s key-exchange timeout, so the (long-timeout)
    barrier absorbs the skew and the collective itself starts aligned.
    Best-effort: multi-host TPU pods don't need it."""
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(name, timeout_ms)
    except Exception:  # noqa: BLE001 - internal API; barrier is an aid
        pass


_BARRIER_SEQ = [0]


def _allgather_bytes(rows: list[bytes | None], n_total: int):
    """Ordered cross-host reassembly of per-index byte strings.

    Each process passes a full-length list holding bytes for the indices
    it owns and None elsewhere; returns the merged list on every process.
    Implementation: zero-padded (n_total, max_len) u8 + length vector,
    summed across processes (disjoint ownership makes sum = scatter).
    """
    import jax
    from jax.experimental import multihost_utils

    _BARRIER_SEQ[0] += 1
    _barrier(f"allgather_bytes_{_BARRIER_SEQ[0]}")
    lens = np.zeros(n_total, np.int64)
    for i, r in enumerate(rows):
        if r is not None:
            lens[i] = len(r)
    # global max length (all processes must agree on the array shape)
    all_lens = multihost_utils.process_allgather(lens)
    max_len = int(all_lens.max()) if all_lens.size else 0
    max_len = max(max_len, 1)
    buf = np.zeros((n_total, max_len), np.uint8)
    for i, r in enumerate(rows):
        if r is not None:
            buf[i, : len(r)] = np.frombuffer(r, np.uint8)
    gathered = multihost_utils.process_allgather(buf)   # (nproc, n, L)
    glens = all_lens.reshape(jax.process_count(), n_total)
    merged_lens = glens.sum(axis=0)
    merged = gathered.sum(axis=0, dtype=np.int64).astype(np.uint8)
    return [bytes(merged[i, : merged_lens[i]]) for i in range(n_total)]


def encode_multihost(data: bytes, *, chunk_size: int = 1024,
                     interpret: bool = False, piece_streams: int | None = None,
                     backend: str = "device", **knobs) -> list[bytes]:
    """Encode `data` across all hosts: host-level round-robin over
    per-host pieces (DCN analog), per-piece encode on the owning host
    (device mesh, or the host encoder for light simulations), ordered
    cross-host gather of the streams."""
    import jax

    from ..ops.device_encode import B_LANES
    from .mesh import encode_batches_multichip

    pid = jax.process_index()
    nproc = jax.process_count()
    batch_bytes = (piece_streams or B_LANES) * chunk_size
    pieces = [data[off: off + batch_bytes]
              for off in range(0, len(data), batch_bytes)]
    # chunk count per piece decides the output index space
    n_streams_of = [-(-len(p) // chunk_size) for p in pieces]
    bases = np.concatenate([[0], np.cumsum(n_streams_of)])
    results: list[bytes | None] = [None] * int(bases[-1])
    mesh = get_local_mesh()
    for bi in range(pid, len(pieces), nproc):
        if backend == "host":
            from ..encode.sharded import encode_sharded

            streams = encode_sharded(pieces[bi], chunk_size=chunk_size)
        else:
            streams = encode_batches_multichip(
                pieces[bi], mesh, chunk_size=chunk_size,
                interpret=interpret, **knobs,
            )
        for k, s in enumerate(streams):
            results[int(bases[bi]) + k] = s
    return _allgather_bytes(results, int(bases[-1]))


def decode_multihost(streams: list[bytes], *, interpret: bool = False,
                     group_size: int | None = None) -> list[bytes]:
    """Decode streams across all hosts: each host preflights and decodes
    the stream groups it owns on its local devices; ordered cross-host
    reassembly returns the full output list on every host."""
    import jax

    from .mesh import decode_batches_multichip

    pid = jax.process_index()
    nproc = jax.process_count()
    gs = group_size or 1024
    groups = [streams[i: i + gs] for i in range(0, len(streams), gs)]
    results: list[bytes | None] = [None] * len(streams)
    mesh = get_local_mesh()
    for gi in range(pid, len(groups), nproc):
        outs = decode_batches_multichip(
            groups[gi], mesh, interpret=interpret, group_size=gs,
        )
        for k, o in enumerate(outs):
            results[gi * gs + k] = o
    return _allgather_bytes(results, len(streams))
