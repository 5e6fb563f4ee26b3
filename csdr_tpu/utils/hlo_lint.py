"""TPU-pathology lint over jaxprs — the parsevect equivalent.

The reference machine-checks its "these loops vectorize" claims at build
time (reference Makefile:58-60 + parsevect:1-83: compile with
-fopt-info-vec and diff the vectorized-loop list against an expected
file).  The equivalent hazard class on this backend (CLAUDE.md "TPU/axon
gotchas") is compiled-graph pathologies:

- **dynamic gathers**: any `gather` whose indices are TRACED (derived from
  runtime inputs rather than constants/iota) compiles to a ~100x-slow
  kernel.  Small gathers (a few elements per application, e.g. the Gardner
  TED's 4-sample window reads inside a per-symbol scan) are the documented
  right form and are allowed below a size threshold.
- **large strided slices** (`x[::k]`): ~0.3-5 ms at 1M elements; the fix
  is reshape + one-hot matmul or plain reshape-column picks.
- **stride-1 conv_general_dilated** on the TPU path: express as
  frames @ taps matmuls instead.

`lint_fn(fn, *args)` traces fn to a jaxpr (monkeypatching
jax.default_backend() to "tpu" so backend-gated dispatches take their TPU
path even when the lint itself runs on CPU) and walks every equation,
recursing into scan/while/cond/pjit bodies, propagating a taint bit from
the function inputs.  Returns a list of findings; an empty list means the
compiled program is free of the known cliffs.
"""

from __future__ import annotations

import contextlib
from dataclasses import dataclass

import jax
import numpy as np
from jax.extend import core as jcore


def _is_dropvar(v) -> bool:
    return type(v).__name__ == "DropVar"


# gathers moving at most this many elements per op application are allowed
# (per-symbol window reads inside scans; index arithmetic on scalars)
GATHER_ELEMS_THRESHOLD = 1024
# constant-index gathers (incl. x[::k], which traces to an iota-driven
# gather) are slow on this backend too, but only matter at bulk sizes;
# small setup/halo gathers are fine
CONST_GATHER_ELEMS_THRESHOLD = 65536
# strided slices over operands at most this long are allowed
STRIDED_SLICE_THRESHOLD = 65536


@dataclass
class Finding:
    kind: str          # 'dynamic-gather' | 'strided-slice' | 'stride1-conv'
    primitive: str
    detail: str

    def __str__(self):
        return f"[{self.kind}] {self.primitive}: {self.detail}"


def _size(v) -> int:
    try:
        return int(np.prod(v.aval.shape)) if v.aval.shape else 1
    except Exception:
        return 1


def _is_lit(x) -> bool:
    return isinstance(x, jcore.Literal)


def _subjaxprs(eqn):
    """(closed_jaxpr, n_prefix_invars) pairs for control-flow eqns."""
    p = eqn.params
    out = []
    if "jaxpr" in p:
        j = p["jaxpr"]
        out.append(j if hasattr(j, "jaxpr") else jcore.ClosedJaxpr(j, ()))
    if "branches" in p:
        out.extend(p["branches"])
    if "cond_jaxpr" in p:
        out.append(p["cond_jaxpr"])
    if "body_jaxpr" in p:
        out.append(p["body_jaxpr"])
    if "call_jaxpr" in p:
        j = p["call_jaxpr"]
        out.append(j if hasattr(j, "jaxpr") else jcore.ClosedJaxpr(j, ()))
    return out


def _lint_jaxpr(jaxpr, in_taint, findings, depth=0):
    """Walk `jaxpr` (a core.Jaxpr) propagating taint; returns out taints."""
    taint = {}

    def get(x):
        return False if _is_lit(x) else taint.get(x, False)

    for v, t in zip(jaxpr.invars, in_taint):
        taint[v] = t
    for v in jaxpr.constvars:
        taint[v] = False

    def run_eqns():
        for eqn in jaxpr.eqns:
            name = eqn.primitive.name
            in_t = [get(x) for x in eqn.invars]

            if name == "gather":
                idx = eqn.invars[1]
                n_elems = (_size(eqn.outvars[0]) if eqn.outvars else 0)
                if get(idx) and n_elems > GATHER_ELEMS_THRESHOLD:
                    findings.append(Finding(
                        "dynamic-gather", name,
                        f"gather of {n_elems} elems with traced indices "
                        f"{idx.aval.shape} from operand "
                        f"{eqn.invars[0].aval.shape}"))
                elif not get(idx) and n_elems > CONST_GATHER_ELEMS_THRESHOLD:
                    findings.append(Finding(
                        "large-const-gather", name,
                        f"gather of {n_elems} elems (constant indices "
                        f"{idx.aval.shape}) from operand "
                        f"{eqn.invars[0].aval.shape} — use reshape/one-hot-"
                        f"matmul forms"))
            elif name == "slice":
                strides = eqn.params.get("strides")
                if strides and any(s > 1 for s in strides):
                    n = _size(eqn.invars[0])
                    ndim = len(eqn.invars[0].aval.shape)
                    # stride-2 halving slices on multi-dim operands are the
                    # associative_scan lowering (measured fine when batched);
                    # the measured ~ms-class pathology is 1-D stream
                    # subsampling and any genuine stride>=4 decimation
                    bad = (ndim == 1 and any(s > 1 for s in strides)) or \
                          any(s >= 4 for s in strides)
                    if bad and n > STRIDED_SLICE_THRESHOLD:
                        findings.append(Finding(
                            "strided-slice", name,
                            f"strides {strides} over operand of {n} elems"))
            elif name == "conv_general_dilated":
                strides = eqn.params.get("window_strides", ())
                n = _size(eqn.invars[0])
                if all(s == 1 for s in strides) and n > STRIDED_SLICE_THRESHOLD:
                    findings.append(Finding(
                        "stride1-conv", name,
                        f"stride-1 conv over operand of {n} elems"))

            subs = _subjaxprs(eqn)
            if subs:
                out_t = [False] * len(eqn.outvars)
                n_carry = eqn.params.get("num_carry")
                n_consts = eqn.params.get("num_consts", 0)
                for cj in subs:
                    nin = len(cj.jaxpr.invars)
                    # align taints to sub-jaxpr invars (best effort: pad
                    # with the 'any input tainted' bit)
                    any_t = any(in_t)
                    sub_in = (in_t + [any_t] * nin)[:nin]
                    # iterate: loop carries can circulate taint
                    prev = None
                    for _ in range(3):
                        sub_out = _lint_jaxpr(cj.jaxpr, sub_in, findings,
                                              depth + 1)
                        if sub_out == prev:
                            break
                        prev = sub_out
                        if n_carry is not None:
                            # scan: outputs are [carry..., ys...]; feed the
                            # carry taints back into the carry slots (after
                            # the consts), not the xs tail
                            sub_in = list(sub_in)
                            for i in range(min(n_carry, len(sub_out))):
                                j = n_consts + i
                                if j < nin:
                                    sub_in[j] = sub_in[j] or sub_out[i]
                        else:
                            nout = min(len(sub_out), nin)
                            sub_in = (list(sub_in[:nin - nout]) +
                                      [a or b for a, b in
                                       zip(sub_in[nin - nout:],
                                           sub_out[:nout])])
                    for i in range(len(out_t)):
                        if i < len(prev or []):
                            out_t[i] = out_t[i] or prev[i]
                        else:
                            out_t[i] = out_t[i] or any(in_t)
                for v, t in zip(eqn.outvars, out_t):
                    if not _is_dropvar(v):
                        taint[v] = t
            else:
                t = any(in_t)
                for v in eqn.outvars:
                    if not _is_dropvar(v):
                        taint[v] = t

    run_eqns()
    # findings inside sub-jaxprs may be duplicated by the taint iteration;
    # the caller dedups
    return [get(v) for v in jaxpr.outvars]


@contextlib.contextmanager
def pretend_tpu():
    """Trace-time backend spoof so `jax.default_backend() != 'tpu'` gates
    pick their TPU path while linting on CPU."""
    orig = jax.default_backend
    jax.default_backend = lambda: "tpu"
    try:
        yield
    finally:
        jax.default_backend = orig


def lint_fn(fn, *args, spoof_tpu: bool = True) -> list[Finding]:
    """Trace fn(*args) and lint the jaxpr.  Function inputs are the taint
    sources; constants/iota/ramps are clean."""
    ctx = pretend_tpu() if spoof_tpu else contextlib.nullcontext()
    with ctx:
        closed = jax.make_jaxpr(fn)(*args)
    findings: list[Finding] = []
    _lint_jaxpr(closed.jaxpr, [True] * len(closed.jaxpr.invars), findings)
    # dedup (sub-jaxpr fixpoint iteration can re-visit eqns)
    seen, out = set(), []
    for f in findings:
        key = (f.kind, f.primitive, f.detail)
        if key not in seen:
            seen.add(key)
            out.append(f)
    return out
