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
