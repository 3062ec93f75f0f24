"""Physical-plan linting — make the 100 TB design contract checkable.

The repo's own tests assert plan shapes inline (``tests/test_plans.py``:
broadcast-only rollup joins, parquet pushdown, no Python in hot paths).
This module exposes the same discipline as a PUBLIC utility so user
pipelines can gate THEIR plans in CI the way this engine gates its own:

    from tinyolap_spark import plans
    findings = plans.lint(df)          # list of Finding
    plans.assert_scale_safe(df)        # raises PlanHazard on blockers

The checks are pattern-based over the (AQE-final, when ``execute=True``)
executed-plan text — static signals only.  They catch the plan shapes
that are fine on a laptop and fatal at cluster scale:

- ``BatchEvalPython``: row-at-a-time Python UDF — 10-100x slower than
  the Arrow path (``ArrowEvalPython`` / ``MapInPandas`` rank lower).
- ``CartesianProduct`` / ``BroadcastNestedLoopJoin``: non-equi or
  keyless joins — O(n*m) compare or an unbounded broadcast build.
- parquet scans that read every column (``scan_reads_all_columns``):
  a projection that never reached the reader.
- excessive shuffle-``Exchange`` counts (broadcast exchanges excluded):
  every shuffle exchange rewrites its whole input across the cluster.

No reference counterpart (the reference is an in-process engine with no
distributed plans); this generalizes the plan contract the engine's own
operators are tested against.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

# severity order matters: assert_scale_safe blocks on "error" only
_SEVERITIES = ("error", "warning", "info")


@dataclass(frozen=True)
class Finding:
    """One lint finding: ``code`` is stable for programmatic filtering."""

    code: str
    severity: str  # "error" | "warning" | "info"
    message: str

    def __str__(self) -> str:  # pragma: no cover - cosmetic
        return f"[{self.severity}] {self.code}: {self.message}"


class PlanHazard(AssertionError):
    """Raised by :func:`assert_scale_safe`; carries the findings."""

    def __init__(self, findings: "list[Finding]"):
        self.findings = findings
        super().__init__(
            "plan has scale hazards:\n"
            + "\n".join(f"  {f}" for f in findings)
        )


def plan_text(df: DataFrame, execute: bool = False) -> str:
    """Executed-plan text.  ``execute=True`` runs the query first so AQE
    finalizes runtime join strategies (a plan can show SortMergeJoin
    before AQE demotes it to broadcast) — same idiom as the repo's own
    plan tests."""
    if execute:
        df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def _scan_schemas(plan: str) -> "list[str]":
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def lint(
    df: "DataFrame | str",
    execute: bool = False,
    max_exchanges: int = 5,
) -> "list[Finding]":
    """Scan a DataFrame's physical plan for scale hazards.

    ``df`` may also be an already-captured plan STRING (so a plan can be
    linted post-hoc, e.g. from a log).  Findings, most severe first:

    ====================================  ========  =========================
    code                                  severity  trigger
    ====================================  ========  =========================
    ``python_row_udf``                    error     BatchEvalPython node
    ``cartesian_product``                 error     CartesianProduct node
    ``broadcast_nested_loop``             error     BroadcastNestedLoopJoin
    ``python_arrow_udf``                  info      ArrowEvalPython /
                                                    MapInPandas (Arrow path
                                                    — fine, but JVM-only
                                                    plans beat it)
    ``sort_merge_join``                   info      SortMergeJoin (both
                                                    sides shuffle+sort; OK
                                                    for fact-fact, wasteful
                                                    for dimension joins)
    ``many_exchanges``                    warning   > ``max_exchanges``
                                                    SHUFFLE Exchange nodes
                                                    (broadcast exchanges
                                                    excluded)
    ``scan_reads_all_columns``            warning   a parquet scan whose
                                                    ReadSchema has > 20
                                                    fields (pruning likely
                                                    never reached the
                                                    reader)
    ``filter_not_pushed``                 warning   a Filter node above a
                                                    scan whose
                                                    PushedFilters is empty
    ``no_codegen``                        warning   no WholeStageCodegen
                                                    stage in a non-trivial
                                                    plan
    ====================================  ========  =========================
    """
    plan = df if isinstance(df, str) else plan_text(df, execute=execute)
    out: "list[Finding]" = []

    if "BatchEvalPython" in plan:
        out.append(Finding(
            "python_row_udf", "error",
            "row-at-a-time Python UDF (BatchEvalPython) — rewrite with "
            "built-in functions or an Arrow pandas UDF (10-100x)",
        ))
    if "CartesianProduct" in plan:
        out.append(Finding(
            "cartesian_product", "error",
            "CartesianProduct — O(n*m) compare; add an equi-join key "
            "(bucketed candidates, LSH bands, block keys)",
        ))
    if "BroadcastNestedLoopJoin" in plan:
        out.append(Finding(
            "broadcast_nested_loop", "error",
            "BroadcastNestedLoopJoin — keyless/non-equi join with an "
            "unbounded broadcast build side",
        ))
    if "ArrowEvalPython" in plan or "MapInPandas" in plan:
        out.append(Finding(
            "python_arrow_udf", "info",
            "Arrow-batched Python stage — acceptable; prefer JVM "
            "built-ins where expressible",
        ))
    if "SortMergeJoin" in plan:
        out.append(Finding(
            "sort_merge_join", "info",
            "SortMergeJoin — both sides shuffle and sort; broadcast the "
            "small side or bucket both on the key to skip it",
        ))
    # count SHUFFLE exchanges only: the node prints as "+- Exchange
    # hashpartitioning(...)" (or range/SinglePartition).  BroadcastExchange
    # is not a shuffle, and a ReusedExchange line repeats the original's
    # "Exchange hashpartitioning(...)" text INLINE after a comma — the
    # node-position anchor excludes both.
    n_exchanges = len(
        re.findall(r"(?m)(?:^|[+:]- )Exchange (?:hash|range|Single)", plan)
    )
    if n_exchanges > max_exchanges:
        out.append(Finding(
            "many_exchanges", "warning",
            f"{n_exchanges} shuffle Exchange nodes (> {max_exchanges}) — "
            "each is a full shuffle; look for a reusable partitioning",
        ))
    wide = [s for s in _scan_schemas(plan) if s.count(",") + 1 > 20]
    if wide:
        out.append(Finding(
            "scan_reads_all_columns", "warning",
            f"{len(wide)} parquet scan(s) read >20 columns — column "
            "pruning may not have reached the reader",
        ))
    # predicate pushdown check: Catalyst pushes IsNotNull constraints
    # even for unpushable expression predicates, so "PushedFilters
    # non-empty" proves nothing.  Warn when a comparison Filter sits
    # DIRECTLY above a scan that pushed nothing beyond null checks —
    # that scan reads every row group then filters after the fact
    # (predicate on a computed expression; materialize the column at
    # write time to make it pushable).  Positional on purpose: filters
    # above joins/aggregates (HAVING, join verifies) have nothing to
    # push and must not warn.
    def _real_push(lst: str) -> bool:
        return any(
            tok.strip()
            and not tok.strip().startswith(("IsNotNull", "IsNull"))
            for tok in lst.split(",")
        )

    lines = plan.splitlines()
    # node may be the plan root (no tree prefix) or nested ("+- ", ":- ")
    filter_rx = re.compile(r"^\*?\(?\d*\)? ?Filter .*[<>=]")
    scan_rx = re.compile(r"Scan parquet|FileScan")
    pushed_rx = re.compile(r"PushedFilters: \[([^\]]*)\]")
    for i, line in enumerate(lines):
        node = re.sub(r"^[\s:+|-]*", "", line)
        if not filter_rx.search(node):
            continue
        for nxt in lines[i + 1: i + 4]:
            if scan_rx.search(nxt):
                m = pushed_rx.search(nxt)
                if m is not None and not _real_push(m.group(1)):
                    out.append(Finding(
                        "filter_not_pushed", "warning",
                        "a comparison filter sits directly above a "
                        "parquet scan that pushed nothing beyond null "
                        "checks — every row group is read then "
                        "filtered; filter on stored columns (not "
                        "computed expressions) so the reader can skip",
                    ))
                break
        if any(f.code == "filter_not_pushed" for f in out):
            break
    # a plan with joins/aggregates but no codegen stage runs interpreted.
    # Only meaningful on a FINAL plan: an unexecuted AQE plan
    # (isFinalPlan=false) hasn't compiled its stages yet and would
    # always look codegen-free — pass execute=True for this check.
    if (
        "isFinalPlan=false" not in plan
        and "*(" not in plan
        and ("Join" in plan or "HashAggregate" in plan)
    ):
        out.append(Finding(
            "no_codegen", "warning",
            "no WholeStageCodegen stage in a join/aggregate plan — "
            "check for codegen-disabling expressions",
        ))
    out.sort(key=lambda f: _SEVERITIES.index(f.severity))
    return out


def assert_scale_safe(
    df: "DataFrame | str",
    execute: bool = False,
    allow: "tuple[str, ...]" = (),
    max_exchanges: int = 5,
) -> "list[Finding]":
    """Raise :class:`PlanHazard` if the plan has any ``error``-severity
    finding not listed in ``allow``; returns ALL findings otherwise (so
    callers can log warnings).  The CI idiom:

        plans.assert_scale_safe(my_pipeline_df, execute=True)
    """
    findings = lint(df, execute=execute, max_exchanges=max_exchanges)
    blockers = [
        f for f in findings if f.severity == "error" and f.code not in allow
    ]
    if blockers:
        raise PlanHazard(blockers)
    return findings
