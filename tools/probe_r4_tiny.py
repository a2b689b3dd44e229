"""Tiny chip probe: resolve kernel alone on hand tokens (wedge isolation).

Usage: python tools/probe_r4_tiny.py [H] [W]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

H = int(sys.argv[1]) if len(sys.argv) > 1 else 256
W = int(sys.argv[2]) if len(sys.argv) > 2 else None

from brotli_tpu.ops import pallas_resolve as PR


def _lit(*bs):
    t = len(bs) << 24
    for k, b in enumerate(bs):
        t |= b << (8 * k)
    return t


def _fused(length, dist):
    return (3 << 30) | (length << 22) | dist


# stream 0: "abcd" + copy(8, dist 4); stream 1: 120 x 7s then far-ish copy
col0 = [_lit(97, 98, 99), _lit(100), _fused(8, 4)]
col1 = [_lit(7, 7, 7)] * 120 + [_fused(40, 200)]
toks = np.zeros((144, 8, 128), np.uint32)
for s, col in enumerate((col0, col1)):
    toks[: len(col), 0, s] = col
mlens = np.zeros(1024, np.int64)
mlens[0] = 12
mlens[1] = 400

t0 = time.time()
out, n_rows = PR.resolve_tokens_device(toks, mlens, H=H, DT=16, W=W)
out_np = np.asarray(out)
print(f"ran in {time.time()-t0:.1f}s", flush=True)
outs, errs = PR.unpack_resolved(out_np, n_rows, mlens)
exp0 = b"abcdabcdabcd"
exp1 = (b"\x07" * 360)[:400]
exp1 = bytes([7] * 360 + list((bytes([7] * 200) * 2)[:40]))
print("errs:", errs[:2], flush=True)
assert outs[0] == exp0, outs[0][:16]
assert outs[1] == bytes([7] * 400), outs[1][-8:]
print("tiny chip probe OK", flush=True)
