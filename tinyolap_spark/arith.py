"""Arithmetic-rule auto-compilation — the Catalyst expression tier.

The dominant real-world rule shape (reference
``samples/enterprise_model/rules.py:1-36``, ``samples/tiny.py:137-144``) is a
pure arithmetic combination of sibling members of ONE dimension::

    def sales_rule(c):
        q, p = c["Quantity"], c["Price"]
        if q is not None and p is not None:
            return q * p

Such a body needs no Python at evaluation time.  This module:

1. **Traces** the rule once, driver-side, with a symbolic cell whose reads
   return expression nodes and whose arithmetic operators build a tree.
   Any data-dependent behavior (``if q > 5``, ``bool(q)``, comparisons,
   cube writes, attribute access) raises :class:`NotArithmetic` and the
   rule stays on the opaque ``mapInPandas`` tier.  Because branching on
   values is impossible, a successful trace IS the function — up to how it
   treats missing (``None``) operands and division by zero, which a trace
   cannot see.
2. **Verifies** the trace differentially: the Python body runs against a
   dict-backed cell over a sampled grid of operand assignments (distinct
   values, each operand ``None``, each operand ``0.0``, all-``None``,
   all-zero) and must agree — value AND spreadsheet error sentinel — with
   a Python mirror of the exact Catalyst columns that will be generated,
   under one of two null policies:

   - ``nullprop`` — guarded rules (``if q is not None``): any missing
     operand yields ``None``; division by zero with all operands present
     yields ``#DIV/0!``;
   - ``nullerr`` — unguarded rules (``return q * p``): an operation on a
     missing operand raises ``TypeError`` → ``#ERR!`` in Python
     evaluation order; division by zero → ``#DIV/0!``.

   Any disagreement rejects the compile; the opaque tier remains correct.
3. **Compiles** the verified tree to native Spark SQL columns over the
   per-cell ``{member_id: value}`` map the rule engine already builds —
   the whole rule batch then evaluates inside whole-stage codegen with no
   Python, no Arrow transfer, and no probe job.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_ERR = "#ERR!"
_DIV0 = "#DIV/0!"

_BINOPS = ("add", "sub", "mul", "div")
_UNOPS = ("neg", "abs")


class NotArithmetic(Exception):
    """The rule body is not a pure arithmetic expression over reads."""


class _VerifyEscape(Exception):
    """The body did something during verification a compiled plan cannot
    reproduce (cross-dimension read, write, attribute access)."""


# ---------------------------------------------------------------------------
# symbolic trace
# ---------------------------------------------------------------------------


class _TraceVal:
    """Symbolic operand: arithmetic builds a tree, everything else raises."""

    __slots__ = ("node",)

    def __init__(self, node):
        self.node = node

    # -- supported arithmetic ------------------------------------------------
    def _bin(self, op, other, swap=False):
        if isinstance(other, _TraceVal):
            o = other.node
        elif isinstance(other, bool) or not isinstance(other, (int, float)):
            raise NotArithmetic(f"operand {type(other).__name__}")
        else:
            o = ("const", float(other))
        l, r = (o, self.node) if swap else (self.node, o)
        return _TraceVal((op, l, r))

    def __add__(self, other):
        return self._bin("add", other)

    def __radd__(self, other):
        return self._bin("add", other, swap=True)

    def __sub__(self, other):
        return self._bin("sub", other)

    def __rsub__(self, other):
        return self._bin("sub", other, swap=True)

    def __mul__(self, other):
        return self._bin("mul", other)

    def __rmul__(self, other):
        return self._bin("mul", other, swap=True)

    def __truediv__(self, other):
        return self._bin("div", other)

    def __rtruediv__(self, other):
        return self._bin("div", other, swap=True)

    def __neg__(self):
        return _TraceVal(("neg", self.node))

    def __pos__(self):
        return self

    def __abs__(self):
        return _TraceVal(("abs", self.node))

    # -- everything else is data-dependent -> not compilable -----------------
    def _na(self, what):
        raise NotArithmetic(what)

    def __bool__(self):
        self._na("bool()")

    def __eq__(self, other):  # noqa: PLE0302
        self._na("==")

    def __ne__(self, other):
        self._na("!=")

    def __lt__(self, other):
        self._na("<")

    def __le__(self, other):
        self._na("<=")

    def __gt__(self, other):
        self._na(">")

    def __ge__(self, other):
        self._na(">=")

    def __float__(self):
        self._na("float()")

    def __int__(self):
        self._na("int()")

    def __mod__(self, other):
        self._na("%")

    def __rmod__(self, other):
        self._na("%")

    def __floordiv__(self, other):
        self._na("//")

    def __rfloordiv__(self, other):
        self._na("//")

    def __pow__(self, other):
        self._na("**")

    def __rpow__(self, other):
        self._na("**")

    def __hash__(self):
        self._na("hash()")


def _resolve_on_dim(cube, p, modifiers) -> int:
    """Mirror ``Cell._resolve_modifier`` / ``_SliceCell._resolve``: resolve
    each modifier; every one must land on dimension ``p`` (single-dimension
    eligibility); the LAST one wins.  Raises KeyError for unknown members
    and :class:`_VerifyEscape` for cross-dimension reads."""
    if isinstance(modifiers, str):
        modifiers = (modifiers,)
    midx: Optional[int] = None
    for mod in modifiers:
        mod = str(mod)
        pos = None
        if ":" in mod:
            dpart, mname = mod.split(":", 1)
            dpart, mname = dpart.strip(), mname.strip()
            if dpart.isdigit():
                pos = int(dpart)
                if pos >= len(cube.dimensions):
                    raise KeyError(f"dimension ordinal {pos} out of range")
            else:
                pos = cube._dim_position(dpart)
            m = cube.dimensions[pos].member(mname).index
        else:
            m = None
            for dpos, dim in enumerate(cube.dimensions):
                if mod in dim:
                    pos, m = dpos, dim.member(mod).index
                    break
            if m is None:
                raise KeyError(f"member '{mod}' not found in any dimension")
        if pos != p:
            raise _VerifyEscape(f"read on dimension {pos} != {p}")
        midx = m
    if midx is None:
        raise _VerifyEscape("empty modifier tuple")
    return midx


class _TraceCell:
    """Symbolic cursor handed to the rule during the trace."""

    __slots__ = ("_cube", "_p", "_trigger_midx", "_reads")

    def __init__(self, cube, p, trigger_midx, reads):
        object.__setattr__(self, "_cube", cube)
        object.__setattr__(self, "_p", p)
        object.__setattr__(self, "_trigger_midx", trigger_midx)
        object.__setattr__(self, "_reads", reads)

    def _read(self, midx) -> _TraceVal:
        self._reads.append(int(midx))
        return _TraceVal(("read", int(midx)))

    @property
    def value(self):
        return self._read(self._trigger_midx)

    def __getitem__(self, modifiers):
        try:
            midx = _resolve_on_dim(self._cube, self._p, modifiers)
        except _VerifyEscape as exc:
            raise NotArithmetic(str(exc)) from exc
        return self._read(midx)

    def __setitem__(self, modifiers, value):
        raise NotArithmetic("write from rule body")

    def __getattr__(self, name):
        raise NotArithmetic(f"attribute access .{name}")


class _DictCell:
    """Concrete cursor over a plain ``{member_id: value}`` dict — the
    verification twin of ``_SliceCell`` (cube.py), driver-side."""

    __slots__ = ("_cube", "_p", "_trigger_midx", "_vals")

    def __init__(self, cube, p, trigger_midx, vals):
        object.__setattr__(self, "_cube", cube)
        object.__setattr__(self, "_p", p)
        object.__setattr__(self, "_trigger_midx", trigger_midx)
        object.__setattr__(self, "_vals", vals)

    @property
    def value(self):
        return self._vals.get(self._trigger_midx)

    def __getitem__(self, modifiers):
        midx = _resolve_on_dim(self._cube, self._p, modifiers)
        return self._vals.get(midx)

    def __setitem__(self, modifiers, value):
        raise _VerifyEscape("write from rule body")

    def __getattr__(self, name):
        raise _VerifyEscape(f"attribute access .{name}")


# ---------------------------------------------------------------------------
# python mirror of the generated columns (verification oracle)
# ---------------------------------------------------------------------------


def _eval_raw(node, vals, errs: list) -> Optional[float]:
    """``nullerr`` semantics: ops on a missing operand append ``#ERR!``,
    division by zero appends ``#DIV/0!`` — in Python evaluation (post-)
    order, mirroring the generated ``coalesce`` over per-op error columns."""
    kind = node[0]
    if kind == "read":
        v = vals.get(node[1])
        return float(v) if isinstance(v, (int, float)) else None
    if kind == "const":
        return node[1]
    if kind in _UNOPS:
        v = _eval_raw(node[1], vals, errs)
        if v is None:
            errs.append(_ERR)
            return None
        return -v if kind == "neg" else abs(v)
    l = _eval_raw(node[1], vals, errs)
    r = _eval_raw(node[2], vals, errs)
    if l is None or r is None:
        errs.append(_ERR)
        return None
    if kind == "add":
        return l + r
    if kind == "sub":
        return l - r
    if kind == "mul":
        return l * r
    if r == 0.0:
        errs.append(_DIV0)
        return None
    return l / r


def _eval_guarded(node, vals, errs: list) -> Optional[float]:
    """``nullprop`` inner evaluation (all reads known present): only
    division by zero errs, post-order."""
    kind = node[0]
    if kind == "read":
        v = vals.get(node[1])
        return float(v) if isinstance(v, (int, float)) else None
    if kind == "const":
        return node[1]
    if kind in _UNOPS:
        v = _eval_guarded(node[1], vals, errs)
        if v is None:
            return None
        return -v if kind == "neg" else abs(v)
    l = _eval_guarded(node[1], vals, errs)
    r = _eval_guarded(node[2], vals, errs)
    if kind == "div":
        if r == 0.0:
            errs.append(_DIV0)
            return None
        if l is None or r is None:
            return None
        return l / r
    if l is None or r is None:
        return None
    if kind == "add":
        return l + r
    return l - r if kind == "sub" else l * r


def eval_tree(
    node, reads: Sequence[int], vals: dict, policy: str
) -> tuple[Optional[float], Optional[str]]:
    """Evaluate the tree exactly as the generated columns will.
    Returns ``(value, err)`` — at most one is non-None."""
    errs: list[str] = []
    if policy == "nullprop":
        if any(
            not isinstance(vals.get(m), (int, float)) for m in reads
        ):
            return None, None
        v = _eval_guarded(node, vals, errs)
    else:
        v = _eval_raw(node, vals, errs)
    if errs:
        return None, errs[0]
    return v, None


# ---------------------------------------------------------------------------
# catalyst compilation
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ArithPlan:
    tree: tuple
    reads: tuple  # distinct member ids, in first-read order
    policy: str  # "nullprop" | "nullerr"


def to_columns(plan: ArithPlan, read_col) -> tuple[Column, Column]:
    """Compile the plan to ``(value, err)`` Columns.  ``read_col`` maps a
    member id to the Column carrying that operand's value for the current
    evaluation point (NULL = missing cell) — e.g. a conditional-aggregate
    column or ``element_at`` over a per-cell map.  Pure built-in
    functions — the rule batch stays inside whole-stage codegen."""

    ops: list[tuple[str, Column, Optional[Column]]] = []

    def build(node) -> Column:
        kind = node[0]
        if kind == "read":
            return read_col(node[1])
        if kind == "const":
            return F.lit(float(node[1]))
        if kind in _UNOPS:
            c = build(node[1])
            ops.append((kind, c, None))
            return -c if kind == "neg" else F.abs(c)
        l = build(node[1])
        r = build(node[2])
        ops.append((kind, l, r))
        if kind == "add":
            return l + r
        if kind == "sub":
            return l - r
        if kind == "mul":
            return l * r
        # div: mask zero-denominator to NULL (the err column carries the
        # sentinel; Spark double division would otherwise yield Inf/NaN)
        return F.when(r != 0, l / r)

    raw = build(plan.tree)
    null_str = F.lit(None).cast("string")
    if plan.policy == "nullprop":
        anynull = (
            reduce(
                lambda a, b: a | b,
                [read_col(m).isNull() for m in plan.reads],
            )
            if plan.reads
            else F.lit(False)
        )
        div_errs = [
            F.when(r == 0, F.lit(_DIV0))
            for kind, _l, r in ops
            if kind == "div"
        ]
        err = (
            F.when(~anynull, F.coalesce(*div_errs))
            if div_errs
            else null_str
        )
    else:
        op_errs = []
        for kind, l, r in ops:
            if kind in _UNOPS:
                op_errs.append(F.when(l.isNull(), F.lit(_ERR)))
            elif kind == "div":
                op_errs.append(
                    F.when(l.isNull() | r.isNull(), F.lit(_ERR)).when(
                        r == 0, F.lit(_DIV0)
                    )
                )
            else:
                op_errs.append(
                    F.when(l.isNull() | r.isNull(), F.lit(_ERR))
                )
        err = F.coalesce(*op_errs) if op_errs else null_str
    value = F.when(err.isNull(), raw).cast("double")
    return value, err


# ---------------------------------------------------------------------------
# trace + verify + cache
# ---------------------------------------------------------------------------

_SAMPLE_A = (3.0, 5.0, 7.0, 11.0, 13.0, 17.0, 19.0, 23.0, 29.0, 31.0)
_SAMPLE_B = (2.5, -4.0, 9.5, 0.5, -1.25, 6.0, 8.75, -3.5, 12.0, 0.25)


def _normalize_expected(cube, rdef, p, trigger_midx, vals):
    """Run the Python body over a dict-backed cell, normalized exactly as
    the opaque executor tier normalizes results (cube.py ``run``)."""
    from .rules import CONTINUE, map_rule_error

    try:
        v = rdef.function(_DictCell(cube, p, trigger_midx, vals))
    except _VerifyEscape:
        return "reject"
    except Exception as exc:  # noqa: BLE001 — sentinel mapping is the contract
        return None, map_rule_error(exc)
    if v is CONTINUE:
        return "reject"
    if isinstance(v, bool):
        return "reject"
    if v is None:
        return None, None
    if isinstance(v, (int, float)):
        return float(v), None
    return "reject"


def _values_agree(a: Optional[float], b: Optional[float]) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if math.isnan(a) or math.isnan(b):
        return math.isnan(a) and math.isnan(b)
    return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-12)


def _verify(cube, rdef, p, trigger_midx, tree, reads, policy) -> bool:
    samples: list[dict] = [
        dict(zip(reads, _SAMPLE_A)),
        dict(zip(reads, _SAMPLE_B)),
    ]
    base = samples[0]
    for m in reads:
        for repl in (None, 0.0):
            s = dict(base)
            s[m] = repl
            samples.append(s)
    samples.append({m: None for m in reads})
    samples.append({m: 0.0 for m in reads})
    for vals in samples:
        expected = _normalize_expected(cube, rdef, p, trigger_midx, vals)
        if expected == "reject":
            return False
        got = eval_tree(tree, reads, vals, policy)
        if expected[1] != got[1] or not _values_agree(expected[0], got[0]):
            return False
    return True


def _try_compile(cube, rdef, p, trigger_midx) -> Optional[ArithPlan]:
    reads: list[int] = []
    try:
        out = rdef.function(_TraceCell(cube, p, trigger_midx, reads))
    except Exception:  # noqa: BLE001 — NotArithmetic or body error: opaque tier
        return None
    if isinstance(out, _TraceVal):
        tree = out.node
    elif isinstance(out, (int, float)) and not isinstance(out, bool):
        tree = ("const", float(out))
    else:
        return None
    distinct = tuple(dict.fromkeys(reads))
    for policy in ("nullprop", "nullerr"):
        if _verify(cube, rdef, p, trigger_midx, tree, distinct, policy):
            return ArithPlan(tree=tree, reads=distinct, policy=policy)
    return None


def compile_rule_plan(cube, rdef, p, trigger_midx) -> Optional[ArithPlan]:
    """Cached entry point: trace + verify + compile a rule, or ``None``
    (opaque tier).  The cache key pins the cube, trigger position and the
    dimension version, so dimension edits recompile."""
    key = (
        id(cube),
        int(p),
        int(trigger_midx),
        cube.dimensions[p].version,
    )
    cached = getattr(rdef, "_arith_plan", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    plan = _try_compile(cube, rdef, p, trigger_midx)
    rdef._arith_plan = (key, plan)
    return plan
