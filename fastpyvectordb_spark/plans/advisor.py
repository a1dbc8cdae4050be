"""Physical-plan advisor: inspect Catalyst's executed plan for the
scale hazards that matter at 100 TB.

The reference has no optimizer to audit; in a Spark engine the
physical plan *is* the performance contract, so the suite's hot plans
are checked mechanically (tests/test_plans.py):

- filters that should reach the parquet scan (``PushedFilters``)
- partition pruning on partitioned tables (``PartitionFilters``)
- broadcast joins where a small side exists (no accidental
  ``SortMergeJoin`` of dim tables, no ``CartesianProduct`` without an
  explicit broadcast)
- whole-stage codegen coverage of expression-heavy stages
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """Executed-plan text with the metadata truncation raised: the
    default ``spark.sql.maxMetadataStringLength`` (100) cuts long
    ``PushedFilters: [...]`` lists mid-bracket, which would make the
    report's regex silently DROP that scan — a false pushdown-missing
    signal on exactly the filter-rich scans the audit cares about."""
    spark = df.sparkSession
    key = "spark.sql.maxMetadataStringLength"
    old = spark.conf.get(key, None)
    spark.conf.set(key, "2000")
    try:
        return df._jdf.queryExecution().executedPlan().toString()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


@dataclass
class PlanReport:
    pushed_filters: list[str] = field(default_factory=list)
    partition_filters: list[str] = field(default_factory=list)
    broadcast_joins: int = 0
    sortmerge_joins: int = 0
    cartesian_products: int = 0
    broadcast_nested_loop: int = 0
    codegen_stages: int = 0
    exchanges: int = 0

    def summary(self) -> str:
        return (
            f"pushdown={len(self.pushed_filters)} "
            f"partition_pruning={len(self.partition_filters)} "
            f"bhj={self.broadcast_joins} smj={self.sortmerge_joins} "
            f"cartesian={self.cartesian_products} "
            f"bnlj={self.broadcast_nested_loop} "
            f"codegen={self.codegen_stages} exchanges={self.exchanges}"
        )


def plan_report(df: DataFrame) -> PlanReport:
    plan = physical_plan(df)
    rep = PlanReport()
    rep.pushed_filters = [
        m for m in re.findall(r"PushedFilters: \[([^\]]+)\]", plan) if m.strip()
    ]
    rep.partition_filters = [
        m for m in re.findall(r"PartitionFilters: \[([^\]]+)\]", plan) if m.strip()
    ]
    rep.broadcast_joins = plan.count("BroadcastHashJoin")
    rep.sortmerge_joins = plan.count("SortMergeJoin")
    rep.cartesian_products = plan.count("CartesianProduct")
    rep.broadcast_nested_loop = plan.count("BroadcastNestedLoopJoin")
    # codegen prints as "WholeStageCodegen (n)" in formatted explain and
    # as "*(n) Operator" markers in plan toString (incl. AQE plans)
    rep.codegen_stages = len(
        set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        | set(re.findall(r"\*\((\d+)\)", plan))
    )
    rep.exchanges = plan.count("Exchange ")
    return rep


def assert_scale_safe(
    df: DataFrame,
    expect_pushdown: bool = False,
    max_shuffles: int | None = None,
    forbid_cartesian: bool = True,
) -> PlanReport:
    """Raise AssertionError when the plan violates the stated scale
    expectations; returns the report for further checks."""
    rep = plan_report(df)
    if forbid_cartesian and rep.cartesian_products > 0:
        raise AssertionError(
            f"CartesianProduct in plan (unbroadcast cross join): {rep.summary()}"
        )
    if expect_pushdown and not rep.pushed_filters:
        raise AssertionError(f"no PushedFilters reached the scan: {rep.summary()}")
    if max_shuffles is not None and rep.exchanges > max_shuffles:
        raise AssertionError(
            f"{rep.exchanges} exchanges > allowed {max_shuffles}: {rep.summary()}"
        )
    return rep
