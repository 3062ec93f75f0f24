"""Rules — user-defined calculations over cube cells.

Parity with the reference's signature feature (``tinyolap/rules.py``,
``tinyolap/decorators.py:13-49``, matching ``rules.py:207-251``):

- ``@rule(cube, trigger, scope, feeder, volatile)`` declares a Python
  function receiving a :class:`~tinyolap_spark.cube.Cell` cursor;
- first matching trigger wins (registration order);
- scopes: ALL_LEVELS, AGGREGATION_LEVEL, BASE_LEVEL, ON_ENTRY, COMMAND
  (reference ``rules.py:24-32``);
- a rule may return ``Rules.CONTINUE`` to fall through to the stored /
  aggregated value (reference ``cube.py:357-367``);
- errors map to spreadsheet sentinels: ZeroDivisionError -> ``#DIV/0!``,
  KeyError/missing member -> ``#REF!``, anything else -> ``#ERR!``
  (reference ``rules.py:15-20`` + ``cube.py:357-367``, asserted by
  ``tests/test_cube.py:83-88``).

Execution model in the Spark build: rule *matching* and *dispatch* are
driver-side (cell addresses are driver values); the cell reads a rule makes
through its cursor are served by the cube's batched/cached read path, so a
grid refresh first computes all non-rule aggregates in ONE Spark job and
rule cells then evaluate against warm cache.  Rules whose body is a pure
arithmetic combination of sibling measures therefore cost zero extra Spark
jobs once the grid is cached.
"""

from __future__ import annotations

import enum
import inspect
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence


class RuleScope(enum.Enum):
    """Reference ``rules.py:24-32``."""

    ALL_LEVELS = 1
    AGGREGATION_LEVEL = 2
    BASE_LEVEL = 3
    ROLL_UP = 4
    ON_ENTRY = 5
    COMMAND = 6


class RuleError(str, enum.Enum):
    """Spreadsheet-style error sentinels (reference ``rules.py:15-20``)."""

    DIV0 = "#DIV/0!"
    VALUE = "#VALUE!"
    REF = "#REF!"
    ERR = "#ERR!"

    def __str__(self) -> str:  # pragma: no cover
        return self.value


class _Continue:
    """Sentinel: rule passes, fall through to stored/aggregated value."""

    _instance: Optional["_Continue"] = None

    def __new__(cls) -> "_Continue":
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self) -> str:  # pragma: no cover
        return "Rules.CONTINUE"


CONTINUE = _Continue()
NOT_PROCESSED = CONTINUE  # reference alias


@dataclass
class RuleDef:
    function: Callable
    trigger: list[str]
    scope: RuleScope = RuleScope.ALL_LEVELS
    feeder: Optional[list[str]] = None
    volatile: bool = False
    name: str = ""
    # compiled: list of (dim_position, member_idx)
    idx_pattern: list[tuple[int, int]] = field(default_factory=list)
    feeder_idx_pattern: list[tuple[int, int]] = field(default_factory=list)
    trigger_idx_pattern: list[tuple[int, int]] = field(default_factory=list)
    # expression fast path (see ExpressionRule): "[Profit] / [Sales]"
    expression: Optional[str] = None
    # operand member name -> member idx in the trigger's dimension
    operand_idx: dict[str, int] = field(default_factory=dict)


_EXPR_REF = __import__("re").compile(r"\[([^\]]+)\]")


def compile_expression_rule(
    cube, trigger: str, expression: str, name: str = ""
) -> RuleDef:
    """Single-dimension expression rule: the trigger is ONE member and the
    expression references sibling members of the SAME dimension in
    brackets — ``"[Profit] / [Sales]"``.

    This is the fast tier for the dominant real-world rule shape
    (ratio/difference measures, SURVEY §2.10 strategy note): a view
    evaluates these from its own grid batch — ZERO extra Spark jobs —
    and point reads evaluate them from one batched operand read.
    """
    pattern = RuleRegistry._compile(cube, [trigger])
    (dim_pos, _midx) = pattern[0]
    dim = cube.dimensions[dim_pos]
    operands: dict[str, int] = {}
    for ref in _EXPR_REF.findall(expression):
        operands[ref] = dim.member(ref).index
    if not operands:
        raise ValueError("expression references no [Member] operands")

    def _no_call(_c):  # the expression path never calls a Python body
        raise RuntimeError("expression rule has no callable body")

    return RuleDef(
        function=_no_call,
        trigger=[trigger],
        scope=RuleScope.ALL_LEVELS,
        name=name or f"expr:{trigger}",
        idx_pattern=pattern,
        expression=expression,
        operand_idx=operands,
    )


def eval_expression(
    expression: str, values: dict[str, object]
) -> object:
    """Evaluate a bracket-reference expression against operand values.

    ``None`` operands coerce to 0.0 (reference ``Cell`` float semantics);
    errors map to the spreadsheet sentinels.
    """
    ns: dict[str, float] = {}
    py = expression
    for i, (ref, v) in enumerate(values.items()):
        var = f"__v{i}"
        py = py.replace(f"[{ref}]", var)
        ns[var] = 0.0 if not isinstance(v, (int, float)) else float(v)
    try:
        return eval(py, {"__builtins__": {}}, ns)  # noqa: S307 — same trust model as reference rules
    except ZeroDivisionError:
        return RuleError.DIV0.value
    except Exception:
        return RuleError.ERR.value


def rule(
    cube: str,
    trigger: "Sequence[str] | str",
    scope: RuleScope = RuleScope.ALL_LEVELS,
    feeder: "Sequence[str] | str | None" = None,
    volatile: bool = False,
):
    """Decorator declaring a rule (reference ``decorators.py:13-49``).

    Usage::

        @rule("sales", trigger=["Profit in %"])
        def profit_pct(c):
            profit, sales = c["Profit"], c["Sales"]
            return profit / sales if sales else None
    """

    def decorator(fn: Callable) -> Callable:
        fn._rule_def = RuleDef(  # type: ignore[attr-defined]
            function=fn,
            trigger=[trigger] if isinstance(trigger, str) else list(trigger),
            scope=scope,
            feeder=(
                [feeder] if isinstance(feeder, str) else list(feeder)
            )
            if feeder is not None
            else None,
            volatile=volatile,
            name=fn.__name__,
        )
        fn._rule_cube = cube  # type: ignore[attr-defined]
        return fn

    return decorator


def collect_rules_from_module(module) -> list[tuple[str, RuleDef]]:
    """Find all ``@rule``-decorated functions in a module."""
    out = []
    for _, fn in inspect.getmembers(module, callable):
        if hasattr(fn, "_rule_def"):
            out.append((fn._rule_cube, fn._rule_def))
    return out


class RuleRegistry:
    """Per-cube ordered rule list with first-match dispatch
    (reference ``rules.py:207-251``)."""

    def __init__(self) -> None:
        self._rules: list[RuleDef] = []

    def register(self, cube, rdef: RuleDef) -> None:
        """Compile the trigger pattern against the cube's dimensions."""
        rdef.idx_pattern = self._compile(cube, rdef.trigger)
        if rdef.feeder:
            rdef.feeder_idx_pattern = self._compile(cube, rdef.feeder)
            rdef.trigger_idx_pattern = rdef.idx_pattern
        self._rules.append(rdef)

    @staticmethod
    def _compile(cube, names: Sequence[str]) -> list[tuple[int, int]]:
        """Member names -> [(dim_position, member_idx)] (reference
        ``cube.py:874-891``).  ``"dim:member"`` pins the dimension; a bare
        member name resolves against the first dimension containing it."""
        pattern = []
        for name in names:
            dim_pos: Optional[int] = None
            member_name = name
            if ":" in name:
                dpart, member_name = name.split(":", 1)
                dim_pos = cube._dim_position(dpart.strip())
                member_name = member_name.strip()
            if dim_pos is None:
                for pos, dim in enumerate(cube.dimensions):
                    if member_name in dim:
                        dim_pos = pos
                        break
            if dim_pos is None:
                raise KeyError(
                    f"trigger member '{name}' not found in any dimension of "
                    f"cube '{cube.name}'"
                )
            midx = cube.dimensions[dim_pos].member(member_name).index
            pattern.append((dim_pos, midx))
        return pattern

    def match(
        self, idx_address: Sequence[int], scopes: Sequence[RuleScope]
    ) -> Optional[RuleDef]:
        """First rule whose every (dim, member) pair equals the address."""
        for rdef in self._rules:
            if rdef.scope not in scopes:
                continue
            if all(idx_address[pos] == midx for pos, midx in rdef.idx_pattern):
                return rdef
        return None

    def __len__(self) -> int:
        return len(self._rules)

    def __iter__(self):
        return iter(self._rules)


def map_rule_error(exc: BaseException) -> str:
    """Reference ``cube.py:357-367``."""
    if isinstance(exc, ZeroDivisionError):
        return RuleError.DIV0.value
    if isinstance(exc, KeyError):
        return RuleError.REF.value
    from .metadata import InvalidAddressError

    if isinstance(exc, InvalidAddressError):
        return RuleError.REF.value
    return RuleError.ERR.value
