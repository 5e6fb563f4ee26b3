"""Collective-traffic accounting for sharded steps.

Parses the compiled (optimized) HLO of a jitted function and sums the
bytes moved by each collective kind (all-gather, all-reduce,
collective-permute, reduce-scatter, all-to-all).  This is the per-step
ICI/DCN traffic the mesh design puts on the wire — the number to compare
against per-step compute time when checking that halos/fixups stay off
the critical path (SURVEY.md §2.13; BASELINE >=85% scaling)."""

from __future__ import annotations

import re

import jax

_DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
                "s8": 1, "u8": 1, "pred": 1, "f64": 8, "s64": 8, "c64": 8}

_COLLECTIVES = ("all-gather", "all-reduce", "collective-permute",
                "reduce-scatter", "all-to-all")

_SHAPE_RE = re.compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Total bytes of an HLO result type like 'f32[4,448]' or a tuple."""
    total = 0
    for m in _SHAPE_RE.finditer(shape_str):
        dt, dims = m.groups()
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_report(fn, *args) -> dict:
    """Compile fn(*args) and account its collectives.

    Returns {kind: {"count": n, "bytes": b}, "total_bytes": B}."""
    compiled = jax.jit(fn).lower(*args).compile()
    txt = compiled.as_text()
    report: dict = {}
    for line in txt.splitlines():
        s = line.strip()
        # result-producing ops look like:  %name = f32[4,448] all-gather(...)
        # async forms lower as <kind>-start / <kind>-done pairs: count the
        # -start (it carries the transferred shape), skip the -done
        m = re.match(r"%?[\w.\-]+\s*=\s*(\([^)]*\)|[\w\[\],{}\s]*?)\s*"
                     r"(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(", s)
        if not m:
            continue
        shape_str, kind = m.groups()
        b = _shape_bytes(shape_str)
        rec = report.setdefault(kind, {"count": 0, "bytes": 0})
        rec["count"] += 1
        rec["bytes"] += b
    report["total_bytes"] = sum(v["bytes"] for k, v in report.items()
                                if isinstance(v, dict))
    return report
