"""brotli_tpu — a TPU-native Brotli (RFC 7932) encoder/decoder framework.

Built from scratch in JAX/Pallas with the full capability surface of the
reference TypeScript library (countertype/brotli-lib): one-shot and streaming
encode across qualities 0-11, full-format decode with static/custom
dictionaries, plus what the reference does not have — batched device
execution and multi-chip/multi-host scaling over a `jax.sharding.Mesh`.

Layout:
  constants.py  — RFC format tables, shared by both pipelines
  decode/       — decoder: host golden path + Pallas lockstep kernels
  encode/       — encoder: quality-tiered pipelines
  ops/          — JAX/Pallas device kernels (bit I/O, Huffman, hashing, ...)
  parallel/     — mesh sharding, dictionary broadcast, ordered gather
  utils/        — profiling/bench helpers
"""

from .decode import decode, decoded_size, BrotliError
from .encode import encode, Encoder, encode_fragment
from .encode.sharded import encode_sharded, encode_sharded_concat


def encode_sharded_device(data, **kw):
    """TPU device encoder: sort-based parallel encode of <=1024 chunks
    (ops/device_encode.py). Lazy import keeps JAX off the critical path."""
    from .ops.device_encode import encode_device_batch

    return encode_device_batch(data, **kw)

__version__ = "0.2.0"

__all__ = [
    "decode", "decoded_size", "BrotliError",
    "encode", "Encoder", "encode_fragment",
    "encode_sharded", "encode_sharded_concat", "encode_sharded_device",
    "__version__",
]
