"""Declarative data-quality expectations in ONE distributed pass.

The reference hard-codes its quality predicate inline
(transformToSilver.py:66: baseFare <= totalFare AND seatsRemaining >= 0);
this generalizes it to a rule list evaluated as a single conditional
aggregate — the expectations-engine pattern (dbt tests /
Great Expectations) at lake scale, where each rule must NOT cost its
own table scan.

Row-local rules (not_null, accepted_values, in_range, custom predicate)
compile to ``SUM(CASE WHEN violated THEN 1 END)`` branches of one agg:
N rules = one scan, no shuffle beyond the final single-row reduce.
``unique`` needs a per-key count, so it adds one hash-shuffle keyed on
the checked column — still one job, and the key cardinality bounds the
exchange.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    name: str
    kind: str  # not_null | accepted_values | in_range | predicate | unique
    column: str | None = None
    values: tuple = ()
    lo: float | None = None
    hi: float | None = None
    predicate: Column | None = None


def not_null(column: str) -> Rule:
    return Rule(f"not_null:{column}", "not_null", column)


def accepted_values(column: str, values: tuple) -> Rule:
    return Rule(
        f"accepted_values:{column}", "accepted_values", column, tuple(values)
    )


def in_range(column: str, lo: float, hi: float) -> Rule:
    return Rule(f"in_range:{column}", "in_range", column, lo=lo, hi=hi)


def predicate(name: str, cond: Column) -> Rule:
    """cond must be TRUE for a row to pass."""
    return Rule(f"predicate:{name}", "predicate", predicate=cond)


def unique(column: str) -> Rule:
    return Rule(f"unique:{column}", "unique", column)


def _violation(rule: Rule) -> Column:
    c = F.col(rule.column) if rule.column else None
    if rule.kind == "not_null":
        return c.isNull()
    if rule.kind == "accepted_values":
        return c.isNull() | ~c.isin(list(rule.values))
    if rule.kind == "in_range":
        return c.isNull() | (c < rule.lo) | (c > rule.hi)
    if rule.kind == "predicate":
        return ~F.coalesce(rule.predicate, F.lit(False))
    raise ValueError(rule.kind)


def validate(df: DataFrame, rules: list[Rule]) -> dict[str, int]:
    """Evaluate all rules; returns {rule_name: violation_count}.

    All row-local rules share one aggregate pass; each ``unique`` rule
    adds one grouped count (rows whose key occurs more than once all
    count as violations). NULL keys are exempt from ``unique`` — the
    dbt / Great Expectations convention: uniqueness is asserted over
    present keys, missing keys are ``not_null``'s job.
    """
    out: dict[str, int] = {}
    rowlocal = [r for r in rules if r.kind != "unique"]
    if rowlocal:
        aggs = [
            F.sum(
                F.when(_violation(r), 1).otherwise(0)
            ).alias(r.name)
            for r in rowlocal
        ]
        row = df.agg(*aggs).first()
        for r in rowlocal:
            out[r.name] = int(row[r.name] or 0)
    for r in rules:
        if r.kind != "unique":
            continue
        dup = (
            df.filter(F.col(r.column).isNotNull())
            .groupBy(r.column)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n"))
            .first()
        )
        out[r.name] = int(dup["n"])
    return out


def validate_df(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Lazy twin of :func:`validate`: returns a (rule, violations)
    DataFrame instead of a driver-side dict — composable into pipelines
    and sinks (write the quality report next to the data it describes).
    Row-local rules still share one aggregate pass; the per-rule rows
    come from ONE agg followed by a stack (unpivot), not N scans."""
    if not rules:
        raise ValueError("validate_df: empty rule list")
    rowlocal = [r for r in rules if r.kind != "unique"]
    uniques = [r for r in rules if r.kind == "unique"]
    parts = []
    if rowlocal:
        aggs = [
            F.sum(F.when(_violation(r), 1).otherwise(0))
            .cast("bigint")
            .alias(f"c{i}")
            for i, r in enumerate(rowlocal)
        ]
        stack = ", ".join(
            f"'{r.name}', c{i}" for i, r in enumerate(rowlocal)
        )
        parts.append(
            df.agg(*aggs).selectExpr(
                f"stack({len(rowlocal)}, {stack}) AS (rule, violations)"
            )
        )
    for r in uniques:
        parts.append(
            df.filter(F.col(r.column).isNotNull())
            .groupBy(r.column)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .agg(
                F.lit(r.name).alias("rule"),
                F.coalesce(F.sum("n"), F.lit(0))
                .cast("bigint")
                .alias("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
