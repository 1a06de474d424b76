"""Plan-level scale linting — the 100 TB pre-flight check as a library.

``audit_plan(df)`` inspects a DataFrame's PHYSICAL plan (what will
actually run, post-Catalyst) and flags the anti-patterns that are
harmless at fixture scale but fatal at cluster scale:

- ``CARTESIAN``        — CartesianProduct: |A|x|B| pair generation.
- ``NESTED_LOOP_JOIN`` — BroadcastNestedLoopJoin: every probe row scans
  the whole broadcast side; fine for tiny dims, quadratic otherwise.
- ``ROW_PYTHON_UDF``   — BatchEvalPython: row-at-a-time Python in the
  hot path (10-100x slower than Arrow-batched or JVM expressions).
- ``SINGLE_PARTITION_EXCHANGE`` — a global sort/window serializing the
  whole dataset through one task. Two reducing shapes are exempt
  because their exchange carries (at most) one row per upstream task,
  not the dataset: TakeOrderedAndProject top-k, and the
  partial->Exchange->final global-aggregate pattern
  (``HashAggregate(keys=[], ...)`` directly consuming the exchange) —
  the textbook distributed tree-reduce for scalar results.

The same checks back ``tools/plan_audit.py`` (the per-round registry
sweep) and ``MagicFrame.audit()`` (the user-facing pre-flight), so the
CI gate and the interactive check can never drift apart.

The reference has no analogue — it has no plan at all (eager Polars,
SURVEY §3); this is a Spark-first capability the rebuild adds.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    code: str
    severity: str  # "error" | "warn"
    detail: str
    suggestion: str

    def __str__(self) -> str:
        return f"[{self.severity}] {self.code}: {self.detail} — {self.suggestion}"


@dataclass
class PlanAudit:
    findings: list[Finding] = field(default_factory=list)
    shuffles: int = 0
    broadcasts: int = 0
    arrow_python: int = 0
    codegen_spans: int = 0
    plan: str = ""

    @property
    def ok(self) -> bool:
        return not self.findings

    def __str__(self) -> str:
        head = "ok" if self.ok else f"{len(self.findings)} finding(s)"
        lines = [
            f"PlanAudit: {head}  shuffles={self.shuffles} "
            f"broadcasts={self.broadcasts} arrow_python={self.arrow_python} "
            f"codegen_spans={self.codegen_spans}"
        ]
        lines += [f"  {f}" for f in self.findings]
        return "\n".join(lines)


def _physical_plan(df: DataFrame) -> str:
    """The executed-plan tree string: unlike ``explain('formatted')``
    under AQE (isFinalPlan=false hides codegen annotation), this
    carries every node marker the checks need — WholeStageCodegen
    spans, Exchange kinds, join strategies, Python evaluator nodes."""
    return df._jdf.queryExecution().executedPlan().toString()


def _has_unreduced_single_partition_exchange(plan: str) -> bool:
    """True iff some ``Exchange SinglePartition`` funnels REAL data
    volume through one task. Exempt occurrences whose direct consumer
    (the nearest plan node printed above, i.e. the exchange's parent in
    the tree string) is a global final aggregate — ``*Aggregate`` with
    ``keys=[]`` — because that exchange ships one partial-agg row per
    upstream task, which is the correct distributed scalar reduce, not
    a serialization point. TakeOrderedAndProject plans reduce before
    exchanging and never print ``Exchange SinglePartition`` at all."""
    def depth(ln: str) -> int:
        # tree-connector prefix is spaces/':'/'+-'; the node text starts
        # after it (a WholeStageCodegen '*(n) ' star counts as node text,
        # so codegen'd and plain nodes at one level share a depth)
        m = re.search(r"[^\s:+\-]", ln)
        return m.start() if m else 10**9

    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        # parent = nearest line above printed shallower in the tree
        parent = ""
        for j in range(i - 1, -1, -1):
            if depth(lines[j]) < depth(line):
                parent = lines[j]
                break
        if re.search(r"Aggregate(\(\d+\))?\(keys?=\[\]", parent):
            continue  # partial -> 1-row-per-task exchange -> final agg
        return True
    return False


def audit_plan(df: DataFrame) -> PlanAudit:
    """Lint ``df``'s physical plan for scale anti-patterns. Pure
    plan-text analysis — never executes the query."""
    plan = _physical_plan(df)
    out = PlanAudit(plan=plan)

    if "CartesianProduct" in plan:
        out.findings.append(
            Finding(
                "CARTESIAN",
                "error",
                "CartesianProduct generates |left| x |right| rows",
                "add an equi-join key, or block with LSH/bucketing first",
            )
        )
    if "BroadcastNestedLoopJoin" in plan:
        out.findings.append(
            Finding(
                "NESTED_LOOP_JOIN",
                "warn",
                "BroadcastNestedLoopJoin scans the broadcast side per probe row",
                "bucketize the inequality (range join) or add an equi-key",
            )
        )
    if "BatchEvalPython" in plan:
        out.findings.append(
            Finding(
                "ROW_PYTHON_UDF",
                "error",
                "row-at-a-time Python UDF in the plan",
                "use pyspark.sql.functions, or a pandas_udf (Arrow-batched)",
            )
        )
    if _has_unreduced_single_partition_exchange(plan):
        out.findings.append(
            Finding(
                "SINGLE_PARTITION_EXCHANGE",
                "warn",
                "a global sort/window funnels all rows through one task",
                "add PARTITION BY / use repartitionByRange, or a per-key window",
            )
        )

    # \bExchange\b does not match inside BroadcastExchange ("tE" has no
    # word boundary), so this counts shuffle exchanges alone
    out.shuffles = len(re.findall(r"\bExchange\b", plan))
    out.broadcasts = len(re.findall(r"BroadcastExchange", plan))
    out.arrow_python = len(
        re.findall(r"ArrowEvalPython|MapInPandas|FlatMapGroupsInPandas", plan)
    )
    out.codegen_spans = len(re.findall(r"WholeStageCodegen", plan))
    return out
