#!/usr/bin/env python3
"""Extract RFC 7932 format *data* constants from the reference tree into binary assets.

The Brotli format is defined by RFC 7932 and comes with fixed data tables:
  - the 122,784-byte static dictionary (shipped brotli-compressed in the
    reference at src/decode/dictionary-bin.ts; originally Appendix A of the RFC),
  - the 121 word transforms (RFC Appendix B),
  - the literal-context lookup table (RFC section 7.1).

These are *format constants*, not code. This tool parses them out of the
reference's packed-string representation once and stores them as plain binary
assets under brotli_tpu/data/ so the framework is standalone. All unpacking
logic here is written fresh against the documented packing scheme
(reference: src/decode/engine.ts:1534-1556 transforms, 1935-1969 context LUT,
src/decode/dictionary-bin.ts:3 compressed dictionary).
"""

import base64
import re
import sys
from pathlib import Path

import numpy as np

REF = Path("/root/reference")
OUT = Path(__file__).resolve().parent.parent / "brotli_tpu" / "data"


def js_unescape(s: str) -> str:
    """Decode the escape sequences used in the reference's TS string literals."""
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\":
            n = s[i + 1]
            if n == "x":
                out.append(chr(int(s[i + 2 : i + 4], 16)))
                i += 4
            elif n == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
            elif n == "n":
                out.append("\n")
                i += 2
            elif n == "t":
                out.append("\t")
                i += 2
            elif n == "r":
                out.append("\r")
                i += 2
            else:  # \" \' \\ etc.
                out.append(n)
                i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def extract_string_args(text: str, fn_call: str, count: int) -> list[str]:
    """Pull the double-quoted string literal arguments of a call site."""
    idx = text.index(fn_call)
    # find all "..." literals after the call, allowing escaped quotes
    lits = re.findall(r'"((?:[^"\\]|\\.)*)"', text[idx : idx + 4000])
    assert len(lits) >= count, f"found {len(lits)} literals at {fn_call}"
    return [js_unescape(x) for x in lits[:count]]


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)

    # --- compressed static dictionary -----------------------------------
    bin_ts = (REF / "src/decode/dictionary-bin.ts").read_text()
    b64 = re.search(r'compressedDictionary = "([^"]+)"', bin_ts).group(1)
    blob = base64.b64decode(b64)
    (OUT / "dictionary.br").write_bytes(blob)
    print(f"dictionary.br: {len(blob)} bytes (brotli-compressed static dictionary)")

    engine = (REF / "src/decode/engine.ts").read_text()

    # --- word transforms (RFC 7932 Appendix B) --------------------------
    # Packing scheme: prefix/suffix strings are '#'-separated segments whose
    # UTF-16 code units are the raw bytes; the 363-char code string holds the
    # 121 (prefix_idx, op, suffix_idx) triplets as charCode-32 each.
    ps_src, tr_src = extract_string_args(engine, "unpackTransforms(", 2)
    storage: list[int] = []
    heads = [0]
    for ch in ps_src:
        b = ord(ch)
        if b == 35:  # '#'
            heads.append(len(storage))
        else:
            storage.append(b & 0xFF)
    triplets = np.array([ord(c) - 32 for c in tr_src], dtype=np.int32).reshape(121, 3)
    np.savez(
        OUT / "transforms.npz",
        triplets=triplets,
        storage=np.array(storage, dtype=np.uint8),
        heads=np.array(heads, dtype=np.int32),
    )
    print(f"transforms.npz: 121 triplets, {len(storage)} storage bytes, {len(heads)} heads")

    # --- literal context lookup table (RFC 7932 section 7.1) ------------
    # Layout: 4 modes x (256-entry p1 half, 256-entry p2 half) = 2048 int32.
    # LSB6/MSB6/SIGNED halves are formula-generated; the UTF8 halves come from
    # a 128-char map (x4) plus an RLE-coded p2 table.
    utf_map, utf_rle = extract_string_args(engine, "unpackLookupTable(LOOKUP,", 2)
    lut = np.zeros(2048, dtype=np.int32)
    i = np.arange(256)
    lut[0:256] = i & 0x3F          # LSB6 p1
    lut[512:768] = i >> 2          # MSB6 p1
    lut[1792:2048] = 2 + (i >> 6)  # SIGNED p2 (base; patched below)
    for k in range(128):           # UTF8 p1, ascii part
        lut[1024 + k] = 4 * (ord(utf_map[k]) - 32)
    k = np.arange(64)
    lut[1152:1216] = k & 1         # UTF8 p1, 0x80-0xBF continuation bytes
    lut[1216:1280] = 2 + (k & 1)   # UTF8 p1, 0xC0-0xFF lead bytes
    off = 1280                     # UTF8 p2: RLE of values cycling 0,1,2,3
    for k in range(19):
        rep = ord(utf_rle[k]) - 32
        lut[off : off + rep] = k & 3
        off += rep
    assert off == 1536, off
    lut[1792:1808] = 1
    lut[2032:2048] = 6
    lut[1792] = 0
    lut[2047] = 7
    lut[1536:1792] = lut[1792:2048] << 3  # SIGNED p1 = p2 lut shifted
    np.save(OUT / "context_lut.npy", lut)
    print("context_lut.npy: 2048 entries")


if __name__ == "__main__":
    sys.exit(main())
