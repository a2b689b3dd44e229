"""Encoder parity gates (VERDICT round 1, missing item 1).

The reference encoder can't run here (no JS runtime), so the contract is
enforced via two locked artifacts in golden_encode.json:

  * exact-output regression locks — sha256 of this encoder's bytes across a
    (source, quality, mode) matrix; any decision change in encode/ that
    reaches the bitstream fails here (regenerate deliberately with
    tools/gen_golden_encode.py and review the size deltas);
  * size gates — q11 output must stay <= the paired Google-C-encoder
    `.compressed` corpus file (the north star's "compressed size <=
    reference for every (quality, lgwin, mode)", measured against the
    strongest encoder available).

Mirrors the reference's encoder property tests (test/brotli.test.ts:104-150)
with byte-exact teeth.
"""

import hashlib
import json
from pathlib import Path

import pytest

from brotli_tpu import decode
from brotli_tpu.encode import encode

from conftest import VECTORS_DIR, BENCH_FIXTURES_DIR

GOLDEN = json.loads((Path(__file__).parent / "golden_encode.json").read_text())

_SRC = {
    "alice29": (f"{VECTORS_DIR}/alice29.txt", None),
    "asyoulik": (f"{VECTORS_DIR}/asyoulik.txt", None),
    "alice29_30k": (f"{VECTORS_DIR}/alice29.txt", 30000),
    "quickfox": (f"{VECTORS_DIR}/quickfox", None),
    "x": (f"{VECTORS_DIR}/x", None),
    "random_org_10k": (f"{VECTORS_DIR}/random_org_10k.bin", None),
    "enc_ttf_20k": (f"{BENCH_FIXTURES_DIR}/enc-ttf.bin", 20000),
    "alice29_8k_text": (f"{VECTORS_DIR}/alice29.txt", 8000),
}


def _load(key: str) -> bytes:
    path, cut = _SRC[key]
    data = open(path, "rb").read()
    return data[:cut] if cut else data


_FAST = [k for k in GOLDEN["outputs"] if "q11" not in k or "30k" in k or
         k.split(":")[0] in ("quickfox", "x", "alice29_8k_text")]
_SLOW = [k for k in GOLDEN["outputs"] if k not in _FAST]


def _check_golden(case: str) -> None:
    key, q, m = case.split(":")
    data = _load(key)
    out = encode(data, quality=int(q[1:]), mode=int(m[1:]))
    exp = GOLDEN["outputs"][case]
    assert len(out) == exp["size"], (
        f"{case}: size {len(out)} != locked {exp['size']}"
    )
    assert hashlib.sha256(out).hexdigest() == exp["sha256"], (
        f"{case}: bytes changed at equal size"
    )
    assert decode(out) == data


@pytest.mark.parametrize("case", sorted(_FAST))
def test_golden_output(case: str):
    _check_golden(case)


@pytest.mark.slow
@pytest.mark.parametrize("case", sorted(_SLOW) or ["<none>"])
def test_golden_output_slow(case: str):
    if case == "<none>":
        pytest.skip("every golden case is in the fast lane")
    _check_golden(case)


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(GOLDEN["q11_size_gates"]))
def test_q11_size_gate_vs_google(name: str):
    """q11 re-encode of each corpus text must stay <= Google's q11 bytes."""
    gate = GOLDEN["q11_size_gates"][name]
    data = open(f"{VECTORS_DIR}/{name}", "rb").read()
    out = encode(data, quality=11)
    assert decode(out) == data
    assert len(out) <= gate["google"], (
        f"{name}: q11 {len(out)} exceeds Google encoder {gate['google']}"
    )
    assert hashlib.sha256(out).hexdigest() == gate["sha256"], (
        f"{name}: q11 bytes drifted from locked output ({len(out)} vs "
        f"{gate['ours']})"
    )


def test_q11_size_gates_locked_below_google():
    """The locked sizes themselves satisfy the north-star contract."""
    for name, gate in GOLDEN["q11_size_gates"].items():
        assert gate["ours"] <= gate["google"], (name, gate)
