"""Physical-plan audit: programmatic checks that a query's plan has the shape
we'd want on a 1000-executor cluster, not just one that passes locally.

The reference delegates all planning to its host engines and adds nothing
(SURVEY §4.1); our engine's planning layer is Catalyst, so the engineering
work is *verifying* that the DataFrame we declared actually compiles to the
plan we designed for: filters pushed into the parquet scan, column-pruned read
schemas, small dimensions broadcast, no more exchanges than the operator
fundamentally needs, hot expressions inside whole-stage codegen.

These audits run in tests (tests/test_plans.py) so a regression that, say,
turns a broadcast join into a sort-merge join or blocks pushdown behind an
opaque UDF fails CI — locally, long before it burns a cluster at 100 TB.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (``df.explain`` only prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


@dataclass
class PlanAudit:
    """Structured summary of one physical plan."""

    n_exchanges: int = 0
    n_broadcast_joins: int = 0
    n_sortmerge_joins: int = 0
    n_shuffledhash_joins: int = 0
    n_nestedloop_joins: int = 0
    n_codegen_spans: int = 0
    n_python_evals: int = 0
    pushed_filters: list[str] = field(default_factory=list)
    read_schemas: list[str] = field(default_factory=list)
    reused_exchanges: int = 0
    raw: str = ""

    @property
    def joins(self) -> int:
        return (
            self.n_broadcast_joins
            + self.n_sortmerge_joins
            + self.n_shuffledhash_joins
            + self.n_nestedloop_joins
        )


def audit_plan(df: DataFrame, execute: bool = False) -> PlanAudit:
    """Parse ``explain('formatted')`` into a PlanAudit.

    Counts come from the operator tree section; pushed filters / read schemas
    from the per-scan detail section. With ``execute=False`` AQE plans are
    audited pre-execution (AdaptiveSparkPlan initial plan) — join-strategy
    counts reflect the static choice, and codegen spans read 0 because AQE
    compiles codegen per query stage at runtime. ``execute=True`` runs the
    query first and audits the FINAL adaptive plan (isFinalPlan=true),
    including runtime join demotions, ReusedExchange, and codegen ids.
    """
    if execute:
        df.collect()
    txt = explain_str(df, "formatted")
    a = PlanAudit(raw=txt)

    # Operator occurrences in the tree listing ("(n) OperatorName").
    def count(op: str) -> int:
        return len(re.findall(rf"\(\d+\)\s+{op}", txt))

    a.n_exchanges = count("Exchange")
    a.n_broadcast_joins = count("BroadcastHashJoin")
    a.n_sortmerge_joins = count("SortMergeJoin")
    a.n_shuffledhash_joins = count("ShuffledHashJoin")
    a.n_nestedloop_joins = count("BroadcastNestedLoopJoin") + count(
        "CartesianProduct"
    )
    a.n_codegen_spans = len(set(re.findall(r"\[codegen id : (\d+)\]", txt)))
    if not a.n_codegen_spans:
        # Non-AQE plans: the codegen mode reports its subtree count directly.
        cg = re.search(
            r"Found (\d+) WholeStageCodegen subtrees", explain_str(df, "codegen")
        )
        a.n_codegen_spans = int(cg.group(1)) if cg else 0
    a.n_python_evals = (
        count("ArrowEvalPython")
        + count("BatchEvalPython")
        + count("MapInPandas")
        + count("MapInArrow")
        + count("PythonMapInArrow")
    )
    a.reused_exchanges = count("ReusedExchange")
    a.pushed_filters = [
        m.strip()
        for m in re.findall(r"PushedFilters:\s*\[(.*?)\]", txt)
        if m.strip()
    ]
    a.read_schemas = re.findall(r"ReadSchema:\s*(\S+)", txt)
    return a


def assert_pruned(audit: PlanAudit, must_not_contain: list[str]) -> None:
    """Assert no scan reads any of the given column names (column pruning)."""
    for schema in audit.read_schemas:
        for colname in must_not_contain:
            if f"{colname}:" in schema:
                raise AssertionError(
                    f"column {colname!r} not pruned from scan schema {schema}"
                )


def assert_pushed(audit: PlanAudit, fragment: str) -> None:
    """Assert some scan has a pushed filter mentioning ``fragment``."""
    if not any(fragment in f for f in audit.pushed_filters):
        raise AssertionError(
            f"no pushed filter mentions {fragment!r}; pushed={audit.pushed_filters}"
        )
