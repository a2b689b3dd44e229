"""The interpret-before-chip gate (CLAUDE.md Mosaic pitfalls, VERDICT r4
weak #7): interpret=False kernel builds must refuse to compile any kernel
module whose current source digest lacks a recorded interpret pass."""

import os

import pytest

from brotli_tpu.ops import device_encode, pallas_decode2, pallas_decode3, \
    pallas_resolve
from brotli_tpu.utils import interpret_gate


KERNEL_MODULES = [pallas_decode2, pallas_resolve, pallas_decode3,
                  device_encode]


def test_registry_covers_current_kernel_sources():
    # tools/interpret_validate.py must have been re-run after any kernel
    # edit; this test pins that discipline into the suite.
    for mod in KERNEL_MODULES:
        interpret_gate.assert_validated(mod.__file__)


def test_gate_refuses_unvalidated_source(tmp_path, monkeypatch):
    monkeypatch.delenv("BROTLI_TPU_NO_GATE", raising=False)
    fake = tmp_path / "pallas_newkernel.py"
    fake.write_text("# brand-new kernel variant, never validated\n")
    with pytest.raises(RuntimeError, match="interpret-gate"):
        interpret_gate.assert_validated(str(fake))


def test_gate_escape_hatch(tmp_path, monkeypatch):
    fake = tmp_path / "pallas_newkernel.py"
    fake.write_text("# unvalidated\n")
    monkeypatch.setenv("BROTLI_TPU_NO_GATE", "1")
    interpret_gate.assert_validated(str(fake))  # no raise


def test_record_then_pass(tmp_path, monkeypatch):
    monkeypatch.delenv("BROTLI_TPU_NO_GATE", raising=False)
    reg = tmp_path / "reg.json"
    monkeypatch.setattr(interpret_gate, "_REGISTRY", str(reg))
    fake = tmp_path / "pallas_k.py"
    fake.write_text("v1\n")
    with pytest.raises(RuntimeError):
        interpret_gate.assert_validated(str(fake))
    interpret_gate.record_validated(str(fake))
    interpret_gate.assert_validated(str(fake))
    fake.write_text("v2 - edited after validation\n")
    with pytest.raises(RuntimeError):
        interpret_gate.assert_validated(str(fake))
