"""Host q5 ratio on the SAME independently-chunked corpus the device
encoder is measured on — the apples-to-apples quality target.

The device encoder compresses B independent chunk streams (no cross-chunk
history); BASELINE.md's host-q5 numbers encode whole files, so they carry
a window advantage the device path structurally lacks.  This prints both
so the ratio gap decomposes into (chunking) + (parse/table quality).

Usage: python tools/host_q5_chunked.py [n_chunks] [chunk_kb] [quality]
"""
import sys

sys.path.insert(0, "/root/repo")

from brotli_tpu import encode

N_CHUNKS = int(sys.argv[1]) if len(sys.argv) > 1 else 128
CHUNK = (int(sys.argv[2]) if len(sys.argv) > 2 else 32) * 1024
Q = int(sys.argv[3]) if len(sys.argv) > 3 else 5

FIXTURES = (
    "/root/reference/test/fixtures/vectors/alice29.txt",
    "/root/reference/test/fixtures/vectors/lcet10.txt",
    "/root/reference/test/fixtures/vectors/plrabn12.txt",
    "/root/reference/bench/fixtures/enc-ttf.bin",
)
base = b"".join(open(f, "rb").read() for f in FIXTURES)
data = (base * 64)[: N_CHUNKS * CHUNK]

chunked = 0
for i in range(0, len(data), CHUNK):
    chunked += len(encode(data[i : i + CHUNK], quality=Q))
    if (i // CHUNK) % 16 == 15:
        print(f"  {i // CHUNK + 1}/{N_CHUNKS}", flush=True)
whole = len(encode(data, quality=Q))
print(f"host q{Q} chunked ({CHUNK//1024} KB x {N_CHUNKS}): "
      f"{chunked/len(data):.4f}")
print(f"host q{Q} whole ({len(data)//1024} KB): {whole/len(data):.4f}")
