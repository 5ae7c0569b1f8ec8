"""Data-quality profiling queries: per-column table statistics.

The reference has no data-profiling surface; its data-quality logic is a
single conjunctive filter (transformToSilver.py:53). A training-data
pipeline needs table-level profiling before that filter can even be
written -- null rates, cardinalities, value ranges per column -- so this
module adds it as a first-class, oracle-checked operator.

Scale: one full-scan aggregate with map-side partial aggregation; the
only multi-pass cost is exact COUNT(DISTINCT) over several columns,
which Spark plans as a single Expand + two-stage aggregate (rows x
n_profiled_cols intermediate). At 100 TB swap the exact distincts for
``approx_count_distinct`` (HLL, one pass, no expand) -- the plan keeps
the same shape; exact is kept here for oracle parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.registry import load, register

# (column, normalized-string expression for min/max) -- doubles are
# quantized to integer cents so min/max render identically in Spark and
# DuckDB (double->string formatting differs between engines).
_PROFILE_COLS: tuple[tuple[str, str], ...] = (
    ("o_orderkey", "plain"),
    ("o_custkey", "plain"),
    ("o_orderstatus", "plain"),
    ("o_totalprice", "cents"),
    ("o_orderdate", "plain"),
    ("o_orderpriority", "plain"),
)


def _norm(col: str, kind: str) -> Column:
    if kind == "cents":
        # floor(x*100+0.5) is monotone, so min/max commute with it
        return (
            F.floor(F.col(col) * 100 + F.lit(0.5)).cast("bigint").cast("string")
        )
    return F.col(col).cast("string")


def _norm_sql(col: str, kind: str) -> str:
    if kind == "cents":
        return f"CAST(CAST(FLOOR({col} * 100 + 0.5) AS BIGINT) AS VARCHAR)"
    return f"CAST({col} AS VARCHAR)"


TABLE_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
SELECT '{c}' AS col_name,
       COUNT(*) - COUNT({c}) AS n_nulls,
       COUNT(DISTINCT {c}) AS n_distinct,
       CAST(MIN({_norm_sql(c, k)}) AS VARCHAR) AS min_val,
       CAST(MAX({_norm_sql(c, k)}) AS VARCHAR) AS max_val
FROM orders"""
    for c, k in _PROFILE_COLS
)


@register(
    "table_profile",
    oracle=TABLE_PROFILE_SQL,
    survey=["profiling", "data-quality", "G1", "G5"],
    bench=True,
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of ``orders``: null count, exact cardinality,
    normalized min/max.

    One independent aggregate branch per column, unioned (the same
    shape as the oracle): each branch reads ONLY its column from
    parquet and plans as a partial hash aggregate + one exchange.
    A single multi-`countDistinct` aggregate looks tidier but plans as
    an Expand x(k+1) feeding a SortAggregate keyed on all k columns --
    measured 4.6 s vs 0.4 s for this formulation at sf0.1. Branches
    share nothing, so Spark runs them as parallel stages.

    The min/max of the double column are compared on quantized integer
    cents (monotone transform) because double->string formatting is not
    engine-portable; every other type renders identically.
    """
    df = load(spark, sf_dir, "orders")
    parts = []
    for c, kind in _PROFILE_COLS:
        n = _norm(c, kind)
        parts.append(
            df.select(F.col(c))
            .agg(
                (F.count(F.lit(1)) - F.count(c)).alias("n_nulls"),
                F.countDistinct(c).alias("n_distinct"),
                F.min(n).alias("min_val"),
                F.max(n).alias("max_val"),
            )
            .select(
                F.lit(c).alias("col_name"),
                "n_nulls",
                "n_distinct",
                "min_val",
                "max_val",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out
