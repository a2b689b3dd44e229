"""Device-mesh scaling for batched decode.

The batch codec is pure data-parallel over streams (SURVEY.md section 2.3):
inputs are sharded on a 1-D `streams` mesh axis, Huffman tables travel with
their lanes, shared constants (the 122 KB static dictionary, code tables) are
replicated, and outputs come back through jit's ordered global-array gather —
XLA inserts the all-gather over ICI.
"""

from __future__ import annotations

import numpy as np


def get_mesh(n_devices: int | None = None, axis_name: str = "streams"):
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def _pad_batch(batch, multiple: int):
    """Pad a preflight batch to a lane-count multiple with dummy lanes."""
    import copy

    pad = (-len(batch)) % multiple
    padded = list(batch)
    for _ in range(pad):
        dummy = copy.copy(batch[0])
        dummy.mlen = 0  # lane exits the loop immediately
        padded.append(dummy)
    return padded, pad


def sharded_decode_batch(streams: list[bytes], mesh=None) -> list[bytes]:
    """Decode a batch of streams data-parallel over a device mesh.

    Device-eligible streams run in the lockstep kernel with lanes sharded
    across the mesh; the rest (and error lanes) use the host decoder.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..decode import decode as host_decode
    from ..ops.device_decode import preflight, run_device_batch

    if mesh is None:
        mesh = get_mesh()
    n_dev = mesh.devices.size

    pre = [preflight(s) for s in streams]
    results: list[bytes | None] = [None] * len(streams)
    device_idx = [i for i, p in enumerate(pre) if p is not None]
    for i, p in enumerate(pre):
        if p is None:
            results[i] = host_decode(streams[i])
    if device_idx:
        batch, pad = _pad_batch([pre[i] for i in device_idx], n_dev)
        shard_spec = NamedSharding(mesh, P("streams"))

        def put(x):
            return jax.device_put(x, shard_spec)

        outs, lens, errs = run_device_batch(batch, device_put=put)
        for k, i in enumerate(device_idx):
            if errs[k]:
                results[i] = host_decode(streams[i])
            else:
                results[i] = bytes(outs[k, : lens[k]])
    return results  # type: ignore[return-value]


def broadcast_dictionary(mesh=None):
    """Replicate the 122 KB static dictionary across the mesh (HBM-resident).

    Dictionary-referencing device decode lands in a later round; the
    broadcast path (replicated sharding over ICI) is the scaling-relevant
    piece and is exercised by the multi-chip dryrun.
    """
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..decode.dictionary import get_dictionary

    if mesh is None:
        mesh = get_mesh()
    data = np.frombuffer(get_dictionary(), dtype=np.uint8)
    return jax.device_put(jnp.asarray(data), NamedSharding(mesh, P()))


def decode_batches_multichip(
    streams: list[bytes],
    mesh=None,
    *,
    interpret: bool = False,
    n_threads: int = 8,
    group_size: int | None = None,
) -> list[bytes]:
    """Decode many shared-table streams across all mesh devices.

    The format's scale-out unit is the independent stream (SURVEY.md
    section 2.3), so multi-chip decode is pure data parallelism: streams are
    grouped into 1024-lane shared-table batches, batches round-robin over
    the mesh devices, and each device runs its own v2 lockstep kernel
    concurrently (async dispatch; no cross-chip collectives are needed —
    ordered reassembly is by batch index).  Host fallback covers
    device-ineligible or error lanes, exactly like the single-chip path.
    """
    import jax
    import jax.numpy as jnp

    from ..decode import decode as host_decode
    from ..native import lz_resolve_batch_v2
    from ..ops import pallas_decode2 as P2

    if mesh is None:
        mesh = get_mesh()
    devices = list(mesh.devices.reshape(-1))

    NS = P2.NSTREAM
    gs = min(group_size or NS, NS)
    groups = [streams[i : i + gs] for i in range(0, len(streams), gs)]
    results: list[bytes | None] = [None] * len(streams)

    # preflight all groups first (host-side), then dispatch device work
    pending = []  # (group_idx, batch, n_blocks, device, args)
    for gi, group in enumerate(groups):
        batch = P2.preflight_shared(group)
        if batch is None:
            base = gi * gs
            sub = P2.decode_batch_pallas2(group, n_threads=n_threads,
                                          interpret=interpret)
            for k, out in enumerate(sub):
                results[base + k] = out
            continue
        dev = devices[len(pending) % len(devices)]
        n_blocks = P2.plan_blocks(batch)
        kernel = P2.get_kernel(
            batch.Wpad, P2.DEFAULT_D, P2.DEFAULT_BLOCK_ROWS, n_blocks,
            batch.npostfix, batch.ndirect, batch.maxbw, interpret,
            lit_k=batch.lit_k, cmd_k=batch.cmd_k, dist_k=batch.dist_k,
            dx_k=batch.dx_k,
        )
        args = [
            jax.device_put(jnp.asarray(x), dev)
            for x in (batch.wt, batch.lit_t, batch.cmd_t, batch.dist_t,
                      batch.dx_t, batch.consts, batch.scal)
        ]
        out = kernel(*args)  # async dispatch per device
        pending.append((gi, batch, n_blocks, out))

    import numpy as np

    for gi, batch, n_blocks, out in pending:
        out_np = np.asarray(out)
        rows = n_blocks * P2.DEFAULT_BLOCK_ROWS
        tokens = out_np[:rows]
        phases = out_np[rows].reshape(-1)
        expected = np.zeros(NS, dtype=np.int64)
        expected[: batch.n_streams] = batch.mlens[: batch.n_streams]
        resolved, lens = lz_resolve_batch_v2(
            tokens.reshape(rows, -1), expected, n_threads
        )
        base = gi * gs
        for k in range(batch.n_streams):
            if phases[k] != P2.DONE or lens[k] != batch.mlens[k]:
                results[base + k] = host_decode(groups[gi][k])
            else:
                results[base + k] = bytes(resolved[k, : lens[k]])
    return results  # type: ignore[return-value]


def encode_batches_multichip(
    data: bytes,
    mesh=None,
    *,
    chunk_size: int = 32768,
    hash_stride: int = 1,
    interpret: bool = False,
) -> list[bytes]:
    """Encode large inputs across mesh devices, one 32 MB batch per device.

    Data parallel like decode_batches_multichip, with overlapped dispatch:
    the encode pipeline (ops/device_encode.py) is driven in three phases —
    (1) match/parse/record stages dispatched to every device before any
    result is fetched, (2) host table build + pack-kernel dispatch per
    device, (3) fetch + stream assembly — so all devices compute their
    heavy stages concurrently instead of round-robin serially.
    """
    import jax

    from ..ops.device_encode import (
        B_LANES,
        _encode_finish,
        _encode_mid,
        _encode_start,
    )
    from ..encode.api import _encode_empty

    if mesh is None:
        mesh = get_mesh()
    if len(data) == 0:
        return [_encode_empty()]
    devices = list(mesh.devices.reshape(-1))
    batch_bytes = B_LANES * chunk_size
    pieces = [
        bytes(data[off : off + batch_bytes])
        for off in range(0, len(data), batch_bytes)
    ]

    # phase 1: dispatch the XLA stages on every device (async)
    states = []
    for bi, piece in enumerate(pieces):
        dev = devices[bi % len(devices)]
        with jax.default_device(dev):
            states.append((dev, _encode_start(piece, chunk_size, hash_stride, 256)))
    # phase 2: host tables + pack dispatch (fetches each device's sample,
    # which only waits on that device; pack kernels again run concurrently)
    for dev, state in states:
        with jax.default_device(dev):
            _encode_mid(state, 22, interpret)
    # phase 3: ordered fetch + assembly
    out: list[bytes] = []
    for dev, state in states:
        out.extend(_encode_finish(state))
    return out
