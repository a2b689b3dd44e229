"""Mechanical interpret-before-chip gate for Pallas kernel modules.

Two Mosaic bug classes (4-D scalar-indexed DMA at grid>1; dynamic
scalar-indexed VMEM scratch read-modify-write) WEDGE the physical chip —
watchdog-only recovery, hours of downtime (CLAUDE.md "Mosaic pitfalls";
this cost ~6 h in round 4).  The prose rule "never run a new kernel
variant on chip before interpret validation" is enforced here
mechanically: every kernel module calls :func:`assert_validated` on its
own ``__file__`` before building with ``interpret=False``.  The gate
refuses to compile for the real chip unless the module's current source
digest has a recorded interpret-mode bit-exact validation pass
(``tools/interpret_validate.py`` runs the suite and records digests; the
registry ``.interpret_ok.json`` at the repo root is committed so a
validated state survives sessions).

The key is the *source digest* of the kernel module, not the per-call
config: shape/config variation of proven kernel code (n_blocks, ring
sizes...) has never wedged the chip — new kernel *code* has.  Gating on
source keeps the friction where the risk is.

Escape hatch: ``BROTLI_TPU_NO_GATE=1`` (for the validate tool itself and
for emergencies; never set it in benches).
"""

from __future__ import annotations

import hashlib
import json
import os

_REGISTRY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".interpret_ok.json",
)


def module_digest(module_file: str) -> str:
    with open(module_file, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def _load() -> dict:
    try:
        with open(_REGISTRY) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def assert_validated(module_file: str) -> None:
    """Raise unless ``module_file``'s current source has a recorded
    interpret-mode validation pass.  Call ONLY on the interpret=False
    build path."""
    if os.environ.get("BROTLI_TPU_NO_GATE"):
        return
    digest = module_digest(module_file)
    reg = _load()
    name = os.path.basename(module_file)
    entry = reg.get(name)
    if entry and entry.get("digest") == digest:
        return
    raise RuntimeError(
        f"interpret-gate: {name} (sha256 {digest[:12]}...) has no recorded "
        "interpret-mode validation pass - a new kernel variant must be "
        "validated in interpret mode BEFORE it may compile for the real "
        "chip (a bad Mosaic lowering can wedge the chip for hours).  Run: "
        "python tools/interpret_validate.py"
    )


def record_validated(module_file: str) -> None:
    """Record the module's current source digest as interpret-validated."""
    reg = _load()
    reg[os.path.basename(module_file)] = {
        "digest": module_digest(module_file),
    }
    with open(_REGISTRY, "w") as f:
        json.dump(reg, f, indent=1, sort_keys=True)
        f.write("\n")
