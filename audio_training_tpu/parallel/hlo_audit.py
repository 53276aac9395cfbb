"""Compiled-HLO collective audit for the DP scaling claim.

The virtual-mesh dryrun (``__graft_entry__.dryrun_multichip``) proves the
data-parallel step is CORRECT (DP logits == single-device); this module
provides the throughput-scaling half of the evidence: from the compiled
SPMD module's HLO text, verify that the only cross-device traffic is the
expected per-step constant — gradient/metric/batch-stat all-reduces — and
that no activation-sized collective or all-gather appears.  Under that
inventory, per-chip step cost is independent of the data-axis size (the
all-reduced bytes are batch-independent and ride ICI), which is what the
bench artifact's ``dp_chips_for_50k_extrapolated`` field extrapolates
from.  Scaling remains a MODEL until measured on real multi-chip hardware
— this audit rules out the compiler-inserted traffic that would break it,
it does not measure ICI.

SURVEY §2.2 DP row; the reference has no working multi-device path at all
(MirroredStrategy tried and disabled, audiomodel.py:498-500).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import numpy as np

# HLO collective op mnemonics (sync + async-start forms).  ``all-reduce``
# is expected (gradients/metrics/BN stats); everything else is not part of
# a pure-DP step over replicated params.
_COLLECTIVES = (
    "all-reduce",
    "all-gather",
    "all-to-all",
    "collective-permute",
    "collective-broadcast",
    "reduce-scatter",
)

# shapes on the result side of an HLO op line: dtype[d0,d1,...]
_SHAPE_RE = re.compile(r"\b[a-z]+[0-9]*\[([0-9,]*)\]")


def _shape_elements(dims: str) -> int:
    if not dims:
        return 1  # scalar
    return int(np.prod([int(d) for d in dims.split(",")]))


@dataclass
class CollectiveInventory:
    """Per-collective-kind list of result-shape element counts."""

    ops: dict[str, list[int]] = field(default_factory=dict)

    @property
    def kinds(self) -> set[str]:
        return set(self.ops)

    def total_elements(self, kind: str) -> int:
        return sum(self.ops.get(kind, []))

    def count(self, kind: str) -> int:
        return len(self.ops.get(kind, []))

    def summary(self) -> str:
        if not self.ops:
            return "no collectives"
        return "; ".join(
            f"{k}: {self.count(k)} ops, {self.total_elements(k)} elements"
            for k in sorted(self.ops)
        )


def collective_inventory(hlo_text: str) -> CollectiveInventory:
    """Scan compiled HLO text for collective ops and their result sizes.

    Tuple-shaped results (XLA combines gradient all-reduces into tuples)
    contribute every component; ``-start`` async forms are folded into
    their base mnemonic and their paired ``-done`` ops are skipped (the
    done op restates the same buffer).
    """
    inv = CollectiveInventory()
    for line in hlo_text.splitlines():
        # tuple shape lists carry /*index=N*/ comments — strip them before
        # matching (the '=' inside would break the result-side capture)
        line = re.sub(r"/\*.*?\*/", "", line)
        # match the op position: "<result> = <shape(s)> <opcode>(",
        # skipping metadata/backend-config mentions of the words
        m = re.search(r"=\s*(\(?[^=]*?)\s+([a-z-]+)\(", line)
        if not m:
            continue
        opcode = m.group(2)
        base = opcode.removesuffix("-start")
        if opcode.endswith("-done") or base not in _COLLECTIVES:
            continue
        shapes = _SHAPE_RE.findall(m.group(1))
        inv.ops.setdefault(base, []).extend(
            _shape_elements(s) for s in shapes
        )
    return inv


def audit_dp_train_step(
    hlo_text: str,
    param_elements: int,
    batch_stat_elements: int = 0,
    scalar_slack: int = 4096,
) -> CollectiveInventory:
    """Assert the DP train step's compiled collectives are exactly the
    per-step-constant set: gradient all-reduces covering every parameter,
    plus (small) batch-stat partial sums and metric scalars — and NOTHING
    activation-sized or gather-shaped.

    Raises AssertionError with the offending inventory otherwise; returns
    the inventory so callers can print it (the multichip dryrun records it
    in its tail for the driver artifact).
    """
    inv = collective_inventory(hlo_text)
    extra = inv.kinds - {"all-reduce"}
    assert not extra, (
        f"unexpected collective kinds in DP step: {sorted(extra)} "
        f"({inv.summary()})"
    )
    total = inv.total_elements("all-reduce")
    assert total >= param_elements, (
        f"gradient all-reduce coverage too small: {total} elements reduced "
        f"< {param_elements} params — gradients are not being synced"
    )
    # BN stats sync as per-channel sums (mean + var, and XLA sometimes
    # carries sum-of-squares separately: allow 4x); metrics are scalars.
    budget = param_elements + 4 * batch_stat_elements + scalar_slack
    assert total <= budget, (
        f"all-reduce volume {total} elements exceeds the per-step-constant "
        f"budget {budget} (params {param_elements} + 4*bn "
        f"{batch_stat_elements} + slack) — an activation is being reduced "
        f"({inv.summary()})"
    )
    return inv


def audit_dp_inference(hlo_text: str, scalar_slack: int = 64
                       ) -> CollectiveInventory:
    """Assert a mesh-sharded inference pass is embarrassingly parallel:
    no gather/permute collectives, and at most scalar-sized all-reduces
    (the PCEN global min-max is a legitimate cross-batch scalar reduce)."""
    inv = collective_inventory(hlo_text)
    extra = inv.kinds - {"all-reduce"}
    assert not extra, (
        f"unexpected collective kinds in DP inference: {sorted(extra)} "
        f"({inv.summary()})"
    )
    total = inv.total_elements("all-reduce")
    assert total <= scalar_slack, (
        f"DP inference all-reduces {total} elements (> {scalar_slack}): "
        f"activations are crossing devices ({inv.summary()})"
    )
    return inv
