"""Per-step collective-communication budget from compiled HLO.

The reference has no distributed path at all (SURVEY.md §2 comm-backend
row); the new framework scales via jit + sharding, where XLA's SPMD
partitioner inserts the collectives. This module makes those collectives
*inspectable*: it parses a compiled program's HLO for every all-reduce /
all-gather / reduce-scatter / all-to-all / collective-permute, sizes each
one, and classifies it onto a mesh axis by its replica groups — so a
training step carries a written per-axis byte budget (``data`` rides DCN
between hosts, ``model`` rides ICI inside one) and the 1→N-host scaling
estimate is arithmetic instead of folklore (north-star ≥85% row).

Usage::

    budget = collective_budget(jax.jit(step).lower(...).compile(), mesh)
    print(format_budget(budget))
    est = scaling_estimate(budget, step_seconds, hosts=2)
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from .mesh import DATA_AXIS, MODEL_AXIS

_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3fn": 1, "f8e5m2": 1,
    "s64": 8, "u64": 8, "s32": 4, "u32": 4, "s16": 2, "u16": 2,
    "s8": 1, "u8": 1, "pred": 1, "c64": 8, "c128": 16,
}

_COLLECTIVES = (
    "all-reduce", "all-gather", "reduce-scatter", "all-to-all",
    "collective-permute",
)

# shapes on the defining LHS of an HLO instruction: e.g. f32[8,128]{1,0}
_SHAPE_RE = re.compile(r"\b(" + "|".join(_DTYPE_BYTES) + r")\[([\d,]*)\]")
_GROUPS_RE = re.compile(r"replica_groups=\{(\{[\d,{} ]*\})\}")
# iota list format: replica_groups=[G,S]<=[d0,d1,...]T(p0,p1,...)
_IOTA_RE = re.compile(
    r"replica_groups=\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?"
)
_PAIRS_RE = re.compile(r"source_target_pairs=\{(\{[\d,]+\}(?:,\{[\d,]+\})*)\}")


@dataclass
class CollectiveOp:
    kind: str
    bytes: int  # payload tensor bytes (per participating device)
    axis: str  # 'data' | 'model' | 'mixed' | 'unknown'
    group_size: int

    def wire_bytes(self) -> int:
        """Ring-algorithm bytes each device sends for this collective."""
        g = max(self.group_size, 1)
        if self.kind == "all-reduce":
            return int(2 * (g - 1) / g * self.bytes)
        if self.kind in ("all-gather", "reduce-scatter"):
            return int((g - 1) / g * self.bytes)
        if self.kind == "all-to-all":
            return int((g - 1) / g * self.bytes)
        return self.bytes  # collective-permute: one hop


@dataclass
class CommBudget:
    ops: List[CollectiveOp] = field(default_factory=list)

    def bytes_by_axis(self, wire: bool = True) -> Dict[str, int]:
        out: Dict[str, int] = {}
        for op in self.ops:
            b = op.wire_bytes() if wire else op.bytes
            out[op.axis] = out.get(op.axis, 0) + b
        return out


def _axis_of_groups(groups: List[List[int]], mesh) -> str:
    """Which mesh axis a replica-group pattern communicates over.

    Works for any mesh rank: each device id is mapped to its N-D coordinate
    in ``mesh.devices``; the collective is attributed to the single mesh axis
    its groups vary along, or ``'mixed'`` if they span several axes.
    """
    arr = np.asarray(mesh.devices)
    coords = {}  # device id -> N-D mesh coordinate
    for idx in np.ndindex(arr.shape):
        coords[arr[idx].id] = idx
    varying: set = set()
    for g in groups:
        cs = [coords[d] for d in g if d in coords]
        if len(cs) <= 1:
            continue
        for ax in range(arr.ndim):
            if len({c[ax] for c in cs}) > 1:
                varying.add(ax)
    if not varying:
        return "unknown"  # singleton groups
    if len(varying) == 1:
        return str(mesh.axis_names[varying.pop()])
    return "mixed"


def collective_budget(compiled, mesh) -> CommBudget:
    """Parse a ``jax`` compiled object's HLO for its collectives.

    ``compiled`` is the result of ``jit(f).lower(*args).compile()`` (or
    anything whose ``as_text()`` returns HLO).
    """
    text = compiled.as_text() if hasattr(compiled, "as_text") else str(compiled)
    budget = CommBudget()
    for line in text.splitlines():
        stripped = line.strip()
        # "ROOT %name = ..." — a collective can be the computation root
        m = re.match(r"(?:ROOT\s+)?%?[\w.\-]+\s*=\s*(.*)", stripped)
        if not m:
            continue
        rhs = m.group(1)
        kind = op_m = None
        for c in _COLLECTIVES:
            op_m = re.search(rf"\b{c}(-start)?\(", rhs)
            if op_m:
                kind = c
                break
        if kind is None:
            continue
        # total payload: every shape left of the op name — a bare shape, or
        # a tuple of them for variadic collectives (the fused grad
        # all-reduce bundles every gradient leaf into one tuple op)
        lhs = rhs[: op_m.start()]
        nbytes = 0
        for dt, dims in _SHAPE_RE.findall(lhs):
            n = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
            nbytes += n * _DTYPE_BYTES[dt]
        if nbytes == 0:
            continue
        gm = _GROUPS_RE.search(rhs)
        im = _IOTA_RE.search(rhs)
        if gm:
            groups = [
                [int(x) for x in g.split(",") if x.strip()]
                for g in re.findall(r"\{([\d, ]*)\}", gm.group(1))
            ]
        elif im:
            g, s = int(im.group(1)), int(im.group(2))
            dims = [int(d) for d in im.group(3).split(",")]
            ids = np.arange(int(np.prod(dims))).reshape(dims)
            if im.group(4):
                ids = ids.transpose([int(p) for p in im.group(4).split(",")])
            groups = ids.reshape(g, s).tolist()
        else:
            pm = _PAIRS_RE.search(rhs)
            if pm:
                # collective-permute: each (src, tgt) hop is its own pair —
                # classify the union pattern pair-by-pair
                groups = [
                    [int(x) for x in p.split(",")]
                    for p in re.findall(r"\{([\d,]+)\}", pm.group(1))
                ]
            else:
                groups = []
        axis = _axis_of_groups(groups, mesh) if groups else "unknown"
        gsize = max((len(g) for g in groups), default=1)
        budget.ops.append(
            CollectiveOp(kind=kind, bytes=nbytes, axis=axis, group_size=gsize)
        )
    return budget


def format_budget(budget: CommBudget) -> str:
    by_axis = budget.bytes_by_axis(wire=True)
    lines = [
        f"collectives: {len(budget.ops)} "
        + " ".join(f"{a}={b / 1e6:.3f}MB" for a, b in sorted(by_axis.items()))
    ]
    kinds: Dict[str, int] = {}
    for op in budget.ops:
        key = f"{op.kind}@{op.axis}"
        kinds[key] = kinds.get(key, 0) + 1
    lines.append("  " + " ".join(f"{k}x{v}" for k, v in sorted(kinds.items())))
    return "\n".join(lines)


def scaling_estimate(
    budget: CommBudget,
    step_seconds: float,
    *,
    hosts: int = 2,
    dcn_bytes_per_s: float = 25e9,
    overlap: bool = False,
) -> Dict[str, float]:
    """Analytic 1→``hosts`` data-parallel scaling efficiency.

    Model: the ``data`` axis moves to DCN; per-step DCN time is the data-axis
    wire bytes over ``dcn_bytes_per_s`` (default 25 GB/s per host — v5e-class
    DCN). Without overlap the comm serializes after compute; with overlap it
    hides under the backward pass. Efficiency = ideal step time over modeled
    step time at equal global batch (weak scaling of the data axis).
    """
    # re-evaluate the ring formula at group size = ``hosts`` (the analyzed
    # mesh's data axis may have a different degree than the target hosts)
    dcn_bytes = sum(
        CollectiveOp(op.kind, op.bytes, op.axis, hosts).wire_bytes()
        for op in budget.ops
        if op.axis == DATA_AXIS
    )
    t_comm = dcn_bytes / dcn_bytes_per_s
    t_step = max(step_seconds, t_comm) if overlap else step_seconds + t_comm
    return {
        "hosts": float(hosts),
        "dcn_bytes_per_step": float(dcn_bytes),
        "t_comm_s": t_comm,
        "t_step_1host_s": step_seconds,
        "efficiency": step_seconds / t_step,
    }
