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
from pyspark.sql.window import Window

from flights_etl_pipeline_spark.functions.scalar import dround
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


# ---------------------------------------------------------------------------
# Chi-square independence test over a contingency table (log-free statistic)
# ---------------------------------------------------------------------------

CHI2_SQL = """
WITH joined AS (
  SELECT c.c_mktsegment AS seg, o.o_orderpriority AS prio
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
cells AS (SELECT seg, prio, COUNT(*) AS obs FROM joined GROUP BY seg, prio),
rows_m AS (SELECT seg, SUM(obs) AS row_n FROM cells GROUP BY seg),
cols_m AS (SELECT prio, SUM(obs) AS col_n FROM cells GROUP BY prio),
tot AS (SELECT SUM(obs) AS n FROM cells),
terms AS (
  SELECT CAST(FLOOR(
           POWER(obs - CAST(row_n * col_n AS DOUBLE) / n, 2)
             / (CAST(row_n * col_n AS DOUBLE) / n) * 100000000 + 0.5
         ) AS DECIMAL(18,0)) AS t8
  FROM cells
  JOIN rows_m USING (seg)
  JOIN cols_m USING (prio)
  CROSS JOIN tot
)
SELECT CAST(SUM(t8) AS DOUBLE) / 100000000 AS chi2,
       CAST(COUNT(*) AS BIGINT) AS n_cells
FROM terms
"""


@register(
    "segment_priority_chi2",
    oracle=CHI2_SQL,
    survey=["chi-square", "statistics", "contingency", "data-quality"],
)
def segment_priority_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence statistic for (market segment × order
    priority) — the data-quality / drift test for categorical columns.
    Log-free, so it is exactly portable across engines: each cell's
    (obs − exp)²/exp term is a deterministic IEEE sequence on integer
    margins, quantized to 1e-8 and summed EXACTLY as integers (the sum
    is order-independent — no float accumulation drift at any
    partitioning).

    Scale shape: one shuffle for the contingency cells (bounded:
    |segments| × |priorities|); margins derive from the cells (never a
    second scan); everything after the cell aggregate is dim-sized.
    The customer join carries no hint — AQE broadcasts it
    at bench scale and shuffles at 100 TB."""
    orders = load(spark, sf_dir, "orders").select("o_custkey", "o_orderpriority")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cells = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("prio"),
        )
        .agg(F.count(F.lit(1)).alias("obs"))
    )
    rows_m = cells.groupBy("seg").agg(F.sum("obs").alias("row_n"))
    cols_m = cells.groupBy("prio").agg(F.sum("obs").alias("col_n"))
    tot = cells.agg(F.sum("obs").alias("n"))
    exp = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("n")
    term = F.pow(F.col("obs") - exp, F.lit(2)) / exp
    t8 = F.floor(term * 100000000 + F.lit(0.5)).cast("decimal(18,0)")
    return (
        cells.join(F.broadcast(rows_m), "seg")
        .join(F.broadcast(cols_m), "prio")
        .crossJoin(F.broadcast(tot))
        .select(t8.alias("t8"))
        .agg(
            (F.sum("t8").cast("double") / 100000000).alias("chi2"),
            F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        )
    )


# ---------------------------------------------------------------------------
# Declarative expectations as a query (the dbt-test / GE shape, one pass)
# ---------------------------------------------------------------------------


@register(
    "orders_expectations",
    oracle="""
SELECT 'not_null:o_custkey' AS rule,
       CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS violations
FROM orders
UNION ALL
SELECT 'accepted_values:o_orderstatus',
       CAST(SUM(CASE WHEN o_orderstatus IS NULL
                       OR o_orderstatus NOT IN ('F', 'O', 'P')
                THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'in_range:o_totalprice',
       CAST(SUM(CASE WHEN o_totalprice IS NULL
                       OR o_totalprice < 0.0 OR o_totalprice > 1000000000.0
                THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'predicate:order_in_epoch',
       CAST(SUM(CASE WHEN NOT COALESCE(YEAR(o_orderdate) >= 1990, FALSE)
                THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique:o_orderkey',
       CAST(COALESCE((
         SELECT SUM(n) FROM (
           SELECT COUNT(*) AS n FROM orders
           GROUP BY o_orderkey HAVING COUNT(*) > 1
         )
       ), 0) AS BIGINT)
""",
    survey=["expectations", "data-quality", "P4", "validation"],
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's hard-coded quality predicate
    (transformToSilver.py:66) generalized to a DECLARATIVE rule list
    evaluated in one pass (functions/validate.py): N row-local rules
    compile to branches of a single conditional aggregate + stack
    (unpivot), uniqueness adds one keyed count — rule count never adds
    scans. Returns the (rule, violations) report as a DataFrame, so the
    quality gate composes into pipelines and writes like any dataset."""
    from flights_etl_pipeline_spark.functions.validate import (
        accepted_values,
        in_range,
        not_null,
        predicate,
        unique,
        validate_df,
    )

    orders = load(spark, sf_dir, "orders")
    return validate_df(
        orders,
        [
            not_null("o_custkey"),
            accepted_values("o_orderstatus", ("F", "O", "P")),
            in_range("o_totalprice", 0.0, 1e9),
            predicate("order_in_epoch", F.year("o_orderdate") >= 1990),
            unique("o_orderkey"),
        ],
    )


# ---------------------------------------------------------------------------
# k-anonymity audit over quasi-identifiers (privacy gate for releases)
# ---------------------------------------------------------------------------

_KANON_K = 5


@register(
    "kanonymity_report",
    oracle=f"""
WITH qid AS (
  SELECT c_nationkey,
         c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_band,
         COUNT(*) AS n
  FROM customer
  GROUP BY c_nationkey, c_mktsegment, CAST(FLOOR(c_acctbal / 1000) AS BIGINT)
)
SELECT c_nationkey, c_mktsegment, bal_band, n
FROM qid
WHERE n < {_KANON_K}
""",
    survey=["k-anonymity", "privacy", "audit", "data-quality"],
)
def kanonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: quasi-identifier combinations (nation, market
    segment, coarse balance band) whose group size is below k={k} — the
    rows a privacy-preserving release must suppress or generalize,
    because an attacker joining on those attributes pins them to fewer
    than k candidates. The audit half of the PII story (doc_pii_scrub
    redacts direct identifiers; this finds *indirect* identification).

    Scale shape: one hash aggregate over the quasi-identifier tuple
    (map-side combinable), then a size filter — the report is
    small-cell-sized by definition. Generalization search (coarsening
    bands until all cells pass) iterates this same aggregate over a
    band-width ladder, each pass independent and parallel."""
    cust = load(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000).cast("bigint")
    return (
        cust.groupBy(
            "c_nationkey",
            "c_mktsegment",
            band.alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") < _KANON_K)
    )


kanonymity_report.__doc__ = kanonymity_report.__doc__.format(k=_KANON_K)


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration index per nation (log-free statistic)
# ---------------------------------------------------------------------------

HHI_SQL = """
WITH rev AS (
  SELECT c.c_nationkey AS nationkey, o.o_custkey,
         CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS r
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY c.c_nationkey, o.o_custkey
),
tot AS (
  SELECT nationkey,
         CAST(SUM(CAST(r AS DECIMAL(18,2))) AS DOUBLE) AS t,
         COUNT(*) AS n_sellers
  FROM rev GROUP BY nationkey
),
terms AS (
  SELECT rev.nationkey, tot.n_sellers,
         CAST(FLOOR(POWER(rev.r / tot.t, 2) * 1000000000000 + 0.5)
              AS DECIMAL(18,0)) AS t12
  FROM rev JOIN tot ON rev.nationkey = tot.nationkey
)
SELECT nationkey,
       CAST(MAX(n_sellers) AS BIGINT) AS n_sellers,
       CAST(SUM(t12) AS DOUBLE) / 1000000000000 AS hhi
FROM terms GROUP BY nationkey
"""


@register(
    "nation_revenue_hhi",
    oracle=HHI_SQL,
    survey=["hhi", "concentration", "statistics", "ratio"],
)
def nation_revenue_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-concentration audit: the Herfindahl–Hirschman index of
    customer revenue shares within each nation (Σ shareᵢ² — 1/N for
    perfect competition, 1.0 for monopoly) — the dataset-balance twin
    of source_mixture_sample: the same statistic over training-data
    source shares tells you when one source dominates a mixture.

    Log-free and engine-exact: shares divide exact decimal sums, each
    squared share is one deterministic IEEE sequence quantized to
    1e-12, and the per-nation total sums those as integers — order
    independent under any partitioning.

    Scale shape: two chained hash aggregates (custkey then nationkey)
    plus a broadcast-back of the per-nation totals; no windows, no
    sorts. Skew-safe: the per-customer pre-aggregate bounds any hot
    nation's fan-in to its customer count."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    rev = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.col("c_nationkey").alias("nationkey"), F.col("o_custkey")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("r")
        )
    )
    tot = rev.groupBy("nationkey").agg(
        F.sum(F.col("r").cast("decimal(18,2)")).cast("double").alias("t"),
        F.count(F.lit(1)).alias("n_sellers"),
    )
    t12 = F.floor(
        F.pow(F.col("r") / F.col("t"), F.lit(2)) * 1000000000000 + F.lit(0.5)
    ).cast("decimal(18,0)")
    return (
        rev.join(F.broadcast(tot), "nationkey")
        .select("nationkey", "n_sellers", t12.alias("t12"))
        .groupBy("nationkey")
        .agg(
            F.max("n_sellers").cast("bigint").alias("n_sellers"),
            (F.sum("t12").cast("double") / 1000000000000).alias("hhi"),
        )
    )


# ---------------------------------------------------------------------------
# Two-feature OLS via normal equations on exact decimal moments
# ---------------------------------------------------------------------------

_OLS2_MOM = """
  SELECT l_returnflag,
         CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(l_quantity AS DECIMAL(38,4))) AS DOUBLE) AS sx1,
         CAST(SUM(CAST(l_discount AS DECIMAL(38,6))) AS DOUBLE) AS sx2,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,4))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,6))) AS DOUBLE)
           AS s11,
         CAST(SUM(CAST(l_discount * l_discount AS DECIMAL(38,8))) AS DOUBLE)
           AS s22,
         CAST(SUM(CAST(l_quantity * l_discount AS DECIMAL(38,8))) AS DOUBLE)
           AS s12,
         CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,6)))
              AS DOUBLE) AS s1y,
         CAST(SUM(CAST(l_discount * l_extendedprice AS DECIMAL(38,8)))
              AS DOUBLE) AS s2y
  FROM lineitem GROUP BY l_returnflag
"""

OLS2_SQL = f"""
WITH mom AS ({_OLS2_MOM}),
cent AS (
  SELECT l_returnflag, n, sx1, sx2, sy,
         (s11 - sx1 * sx1 / n) AS c11,
         (s22 - sx2 * sx2 / n) AS c22,
         (s12 - sx1 * sx2 / n) AS c12,
         (s1y - sx1 * sy / n) AS c1y,
         (s2y - sx2 * sy / n) AS c2y
  FROM mom
),
beta AS (
  SELECT l_returnflag, n, sx1, sx2, sy,
         (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) AS b1,
         (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) AS b2
  FROM cent
)
SELECT l_returnflag,
       CAST(n AS BIGINT) AS n_rows,
       (FLOOR(((sy - b1 * sx1 - b2 * sx2) / n) * 1000000 + 0.5) / 1000000)
         AS intercept,
       (FLOOR(b1 * 1000000 + 0.5) / 1000000) AS beta_quantity,
       (FLOOR(b2 * 1000000 + 0.5) / 1000000) AS beta_discount
FROM beta
"""


@register(
    "price_ols2_normal_equations",
    oracle=OLS2_SQL,
    survey=["ols", "multivariate", "normal-equations", "statistics", "ml"],
)
def price_ols2_normal_equations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multivariate least squares, distributed: regress extendedprice on
    (quantity, discount) per returnflag by solving the 2-feature NORMAL
    EQUATIONS in closed form from nine decimal-exact raw moments — the
    k²-moments generalization nation_revenue_trend_ols promises. One
    partial+final hash aggregate is the only data pass; the 2×2 solve
    is a fixed IEEE op sequence on the aggregated scalars, identical in
    both engines (same centering, same determinant expression, same
    quantization), so coefficients match bit-for-bit.

    Scale shape: moments are map-side combinable; nothing after the agg
    touches more than |groups| rows. At k features this is the k×k
    Gram-matrix pattern every distributed linear solver (and the
    closed-form ridge variant) reduces to; iterative GD would instead
    need one pass per step — moments win whenever k² fits in a row."""
    li = load(spark, sf_dir, "lineitem")
    x1, x2, y = F.col("l_quantity"), F.col("l_discount"), F.col("l_extendedprice")

    def dm(expr, scale):
        return F.sum(expr.cast(f"decimal(38,{scale})")).cast("double")

    mom = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        dm(x1, 4).alias("sx1"),
        dm(x2, 6).alias("sx2"),
        dm(y, 4).alias("sy"),
        dm(x1 * x1, 6).alias("s11"),
        dm(x2 * x2, 8).alias("s22"),
        dm(x1 * x2, 8).alias("s12"),
        dm(x1 * y, 6).alias("s1y"),
        dm(x2 * y, 8).alias("s2y"),
    )
    n = F.col("n")
    c11 = F.col("s11") - F.col("sx1") * F.col("sx1") / n
    c22 = F.col("s22") - F.col("sx2") * F.col("sx2") / n
    c12 = F.col("s12") - F.col("sx1") * F.col("sx2") / n
    c1y = F.col("s1y") - F.col("sx1") * F.col("sy") / n
    c2y = F.col("s2y") - F.col("sx2") * F.col("sy") / n
    cent = mom.select(
        "l_returnflag", "n", "sx1", "sx2", "sy",
        c11.alias("c11"), c22.alias("c22"), c12.alias("c12"),
        c1y.alias("c1y"), c2y.alias("c2y"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    beta = cent.select(
        "l_returnflag", "n", "sx1", "sx2", "sy",
        b1.alias("b1"), b2.alias("b2"),
    )
    intercept = (
        F.col("sy") - F.col("b1") * F.col("sx1") - F.col("b2") * F.col("sx2")
    ) / F.col("n")
    return beta.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n_rows"),
        dround(intercept, 6).alias("intercept"),
        dround(F.col("b1"), 6).alias("beta_quantity"),
        dround(F.col("b2"), 6).alias("beta_discount"),
    )


# ---------------------------------------------------------------------------
# Cross-modal referential-integrity audit (documents <-> embeddings)
# ---------------------------------------------------------------------------

# Orphan ids must live outside any plausible doc_id domain: +1e8 per
# the repo-wide injection discipline (_RELEASE_COPY_OFFSET in
# queries_ml.py), so fixtures up to 1e8 docs can't collide a planted
# orphan with a real doc_id and silently reclassify it as ok
# (ADVICE r5: the old +10000 broke at ~10k docs).
_ORPHAN_OFFSET = 100_000_000

CORPUS_INTEGRITY_SQL = f"""
WITH snap AS (
  SELECT vec_id,
         CASE WHEN vec_id % 17 = 5 THEN embedding[1:32]
              ELSE embedding END AS embedding
  FROM embeddings WHERE vec_id % 7 <> 3
),
orphans AS (
  SELECT vec_id + {_ORPHAN_OFFSET} AS vec_id, embedding
  FROM embeddings WHERE vec_id % 11 = 0
),
snap_all AS (
  SELECT * FROM snap UNION ALL SELECT * FROM orphans
),
audit AS (
  SELECT CASE
           WHEN e.vec_id IS NULL THEN 'missing_embedding'
           WHEN d.doc_id IS NULL THEN 'orphan_embedding'
           WHEN LEN(e.embedding) <> 64 THEN 'dim_mismatch'
           ELSE 'ok'
         END AS status,
         COALESCE(d.source, 'unknown') AS source
  FROM documents d FULL OUTER JOIN snap_all e ON d.doc_id = e.vec_id
),
tot AS (SELECT COUNT(*) AS n_total FROM audit)
SELECT status, source,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000 // t.n_total AS BIGINT) AS share_milli
FROM audit, tot t
GROUP BY status, source, t.n_total
"""


@register(
    "corpus_integrity_audit",
    oracle=CORPUS_INTEGRITY_SQL,
    survey=["data-quality", "integrity", "cross-modal", "audit"],
)
def corpus_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the text/vector modalities:
    full-outer join documents to an embedding-index snapshot and
    classify every row as ok / missing_embedding (doc never indexed) /
    orphan_embedding (index entry whose doc was deleted) /
    dim_mismatch (truncated vector from a partial write) — the health
    check a multimodal corpus needs before any retrieval or dedup job
    trusts the doc_id==vec_id contract. The snapshot deterministically
    simulates a stale index (drop vec_id%7==3, orphan +1e8 copies of
    vec_id%11==0 — outside the doc_id domain per the repo's injection
    discipline, see _ORPHAN_OFFSET — halve the dimension of
    vec_id%17==5), the same injected-defect discipline as
    ``semantic_dedup``'s planted copies.

    Scale shape: one key-partitioned full-outer join (both sides
    shuffle on the id — at 100 TB both are bucketed by id and the join
    is Exchange-free); status is a row-local CASE; output is bounded by
    statuses × sources, and the grand total arrives as a broadcast
    1-row aggregate, never a driver round-trip. Shares are integer
    milli via integer division — engine-exact.
    """
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    snap = emb.filter(F.col("vec_id") % 7 != 3).select(
        "vec_id",
        F.when(
            F.col("vec_id") % 17 == 5, F.slice(F.col("embedding"), 1, 32)
        )
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    orphans = emb.filter(F.col("vec_id") % 11 == 0).select(
        (F.col("vec_id") + _ORPHAN_OFFSET).alias("vec_id"), "embedding"
    )
    snap_all = snap.unionAll(orphans)
    audit = docs.join(
        snap_all, docs.doc_id == snap_all.vec_id, "full_outer"
    ).select(
        F.when(F.col("vec_id").isNull(), "missing_embedding")
        .when(F.col("doc_id").isNull(), "orphan_embedding")
        .when(F.size("embedding") != 64, "dim_mismatch")
        .otherwise("ok")
        .alias("status"),
        F.coalesce(F.col("source"), F.lit("unknown")).alias("source"),
    )
    counts = audit.groupBy("status", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    total = audit.agg(F.count(F.lit(1)).alias("n_total"))
    return counts.crossJoin(F.broadcast(total)).select(
        "status",
        "source",
        "n",
        F.expr("(n * 1000) div n_total").alias("share_milli"),
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier customer-retention curve (round 9)
# ---------------------------------------------------------------------------

_KM_CENSOR_DAYS = 90  # active within 90d of the dataset horizon => censored

# Spine: one row per distinct lifetime (months from first to last order)
# carrying churn/censor counts — runs VERBATIM on both engines; Spark
# materializes it via _rec_spine_view so the recursion re-reads memory.
KM_SPINE_SQL = f"""
WITH horizon AS (SELECT MAX(o_orderdate) AS hmax FROM orders),
life AS (
  SELECT o_custkey,
         (YEAR(MAX(o_orderdate)) - YEAR(MIN(o_orderdate))) * 12
           + MONTH(MAX(o_orderdate)) - MONTH(MIN(o_orderdate)) AS dur,
         CASE WHEN MAX(o_orderdate)
                   < (SELECT hmax FROM horizon) - INTERVAL {_KM_CENSOR_DAYS} DAY
              THEN 1 ELSE 0 END AS ev
  FROM orders GROUP BY o_custkey
),
counts AS (
  SELECT dur AS t,
         CAST(SUM(ev) AS BIGINT) AS d,
         CAST(SUM(1 - ev) AS BIGINT) AS c
  FROM life GROUP BY dur
),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n0 FROM life)
SELECT t, d, c, n0, ROW_NUMBER() OVER (ORDER BY t) AS rn
FROM counts, tot
"""

KM_REC_SQL = """
WITH RECURSIVE km(rn, t, d, c, n, s) AS (
  SELECT rn, t, d, c, n0,
         FLOOR((1 - d / n0) * 1000000000 + 0.5) / 1000000000
  FROM {spine} WHERE rn = 1
  UNION ALL
  SELECT s2.rn, s2.t, s2.d, s2.c,
         km.n - km.d - km.c,
         FLOOR(km.s * (1 - s2.d / (km.n - km.d - km.c))
               * 1000000000 + 0.5) / 1000000000
  FROM km JOIN {spine} s2 ON s2.rn = km.rn + 1
)
SELECT CAST(t AS BIGINT) AS months,
       CAST(d AS BIGINT) AS n_churned,
       CAST(c AS BIGINT) AS n_censored,
       CAST(n AS BIGINT) AS at_risk,
       s AS survival
FROM km
"""


@register(
    "customer_km_survival",
    oracle=None,  # attached below: spine inlined + MATERIALIZED hint
    survey=["survival-analysis", "kaplan-meier", "recursive", "statistics"],
)
def customer_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier retention curve over customer lifetimes: lifetime =
    months between a customer's first and last order; churn event if
    the last order precedes the dataset horizon by more than
    {censor} days, otherwise right-CENSORED (still active when
    observation ended — the thing naive retention averages get wrong).
    S(t_i) = S(t_(i-1)) * (1 - d_i / n_i) with n_i the at-risk count
    just before t_i; censored customers leave the risk set without
    registering an event.

    Determinism and shape follow revenue_ewma_recursive: the only
    corpus-sized work is the per-customer min/max aggregate; the spine
    is one row per DISTINCT lifetime (gaps need no densification — S
    only changes at event times, the textbook KM product), and the
    recursion carries the at-risk count itself (n_(i+1) = n_i - d_i -
    c_i), so there is no suffix-sum window anywhere. Each step's
    survival is floor-quantized at 1e-9, making the chained product
    bit-identical across engines; d/n divisions are single IEEE ops on
    exactly-represented counts. Spine length <= months-in-dataset
    (~80), independent of table size.
    """
    from flights_etl_pipeline_spark.plans.queries_core import _rec_spine_view

    _rec_spine_view(spark, sf_dir, KM_SPINE_SQL, "rec_km")
    return spark.sql(KM_REC_SQL.format(spine="rec_km"))


customer_km_survival.__doc__ = customer_km_survival.__doc__.format(
    censor=_KM_CENSOR_DAYS
)


def _attach_km_oracle() -> None:
    """Oracle = spine inlined as a CTE (MATERIALIZED so DuckDB does not
    re-evaluate the corpus aggregate per recursion step — the _duck_mat
    rule) + the same recursion text."""
    from dataclasses import replace

    from flights_etl_pipeline_spark.plans.registry import REGISTRY

    spine_body = KM_SPINE_SQL.strip().removeprefix("WITH").strip()
    oracle = (
        "WITH RECURSIVE "
        + spine_body.replace(
            "horizon AS (", "horizon AS MATERIALIZED (", 1
        ).rsplit("SELECT t, d, c, n0", 1)[0]
        + ",\nspine AS MATERIALIZED (\nSELECT t, d, c, n0, "
        "ROW_NUMBER() OVER (ORDER BY t) AS rn\nFROM counts, tot\n),\n"
        + KM_REC_SQL.format(spine="spine").strip().removeprefix(
            "WITH RECURSIVE"
        ).strip()
    )
    spec = REGISTRY["customer_km_survival"]
    if spec.oracle is None:
        REGISTRY["customer_km_survival"] = replace(spec, oracle=oracle)


_attach_km_oracle()


# ---------------------------------------------------------------------------
# Poisson-bootstrap confidence interval (single-pass resampling)
# ---------------------------------------------------------------------------

_BOOT_B = 40  # replicates; 95% CI = rank-picked 2nd / 39th replicate
_BOOT_SEED = "boot-r9"
_BOOT_TWO52 = float(1 << 52)
# Poisson(1) inverse CDF thresholds (exact double literals, identical
# comparisons in both engines); draws past 6 are capped at 7 -- a
# ~1e-5-probability truncation that is part of the mechanism's
# definition, not a stats approximation claim.
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238463,
    0.9963401531726563,
    0.9994058151824183,
    0.999916758850712,
)


def _boot_u_sql(b: str) -> str:
    return (
        f"CAST(CAST(concat('0x', substr(md5(CAST({b} AS VARCHAR) || '|' || "
        f"CAST(o_orderkey AS VARCHAR) || '|{_BOOT_SEED}'), 1, 15)) AS BIGINT)"
        f" % {1 << 52} AS DOUBLE) / {_BOOT_TWO52!r}"
    )


def _pois_case_sql(u: str) -> str:
    branches = "".join(
        f" WHEN {u} < {t!r} THEN {k}" for k, t in enumerate(_POIS_CDF)
    )
    return f"CASE{branches} ELSE 7 END"


BOOTSTRAP_SQL = f"""
WITH draws AS (
  SELECT b, o_orderkey,
         {_pois_case_sql(_boot_u_sql('b'))} AS w,
         CAST(o_totalprice AS DECIMAL(18,2)) AS price
  FROM orders CROSS JOIN (SELECT UNNEST(range(1, {_BOOT_B + 1})) AS b)
),
reps AS (
  SELECT b,
         CAST(SUM(w * price) AS DOUBLE) / CAST(SUM(w) AS DOUBLE) AS mean_b
  FROM draws GROUP BY b
),
ranked AS (
  SELECT mean_b, ROW_NUMBER() OVER (ORDER BY mean_b, b) AS rn FROM reps
),
pt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
           / COUNT(*) AS est
  FROM orders
)
SELECT pt.n_orders,
       FLOOR(pt.est * 10000 + 0.5) / 10000 AS est_mean,
       FLOOR(MAX(CASE WHEN rn = 2 THEN mean_b END) * 10000 + 0.5) / 10000
         AS ci_lo,
       FLOOR(MAX(CASE WHEN rn = {_BOOT_B - 1} THEN mean_b END) * 10000 + 0.5)
         / 10000 AS ci_hi
FROM ranked CROSS JOIN pt
GROUP BY pt.n_orders, pt.est
"""


@register(
    "revenue_bootstrap_ci",
    oracle=BOOTSTRAP_SQL,
    survey=["bootstrap", "confidence-interval", "resampling", "statistics"],
)
def revenue_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """95% bootstrap CI for mean order value via the POISSON bootstrap
    -- the resampling scheme that distributes: a classical bootstrap
    draws n-out-of-n WITH replacement (requires global coordination);
    Poisson(1) per-row replicate weights approximate it with no
    coordination at all, so all {b} replicates ride ONE scan as a
    generate + partial aggregate (the scheme production systems use
    for CIs over sharded data).

    Determinism: the per-(replicate, row) uniform is a seeded md5
    (train_test_split trick); the Poisson inverse-CDF thresholds are
    exact double literals compared identically in both engines; draws
    past 6 cap at 7 (~1e-5 of draws -- a defined part of the
    mechanism). Replicate means are exact-decimal sums divided once;
    CI bounds are RANK-PICKED replicates (never percentile
    interpolation, theilsen discipline), quantized at 1e-4.

    Scale shape: one Generate (x{b} rows) feeding a map-side-combinable
    (b)-keyed aggregate -- the exploded stream never shuffles at full
    width, only {b} partials per task do; the replicate table is
    {b} rows, its ranking window trivially small. Total cost ~{b}x one
    scan's arithmetic but only ONE pass over storage."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    b = F.explode(F.sequence(F.lit(1), F.lit(_BOOT_B))).alias("b")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("b").cast("string"),
                        F.col("o_orderkey").cast("string"),
                        F.lit(_BOOT_SEED),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % F.lit(1 << 52)
    ).cast("double") / F.lit(_BOOT_TWO52)
    w = F.lit(7)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        w = F.when(u < F.lit(_POIS_CDF[k]), F.lit(k)).otherwise(w)
    draws = orders.select(
        b, "o_orderkey", F.col("o_totalprice").cast("decimal(18,2)").alias("price")
    ).select("b", w.alias("w"), "price")
    reps = draws.groupBy("b").agg(
        (
            F.sum(F.col("w") * F.col("price")).cast("double")
            / F.sum("w").cast("double")
        ).alias("mean_b")
    )
    from pyspark.sql import Window

    rn = F.row_number().over(Window.partitionBy().orderBy("mean_b", "b"))
    ranked = reps.select("mean_b", "b", rn.alias("rn"))
    pt = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        (
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("est"),
    )
    q = F.lit(10000)
    return (
        ranked.crossJoin(F.broadcast(pt))
        .groupBy("n_orders", "est")
        .agg(
            F.max(F.when(F.col("rn") == 2, F.col("mean_b"))).alias("lo"),
            F.max(F.when(F.col("rn") == _BOOT_B - 1, F.col("mean_b"))).alias(
                "hi"
            ),
        )
        .select(
            "n_orders",
            (F.floor(F.col("est") * q + 0.5) / q).alias("est_mean"),
            (F.floor(F.col("lo") * q + 0.5) / q).alias("ci_lo"),
            (F.floor(F.col("hi") * q + 0.5) / q).alias("ci_hi"),
        )
    )


revenue_bootstrap_ci.__doc__ = revenue_bootstrap_ci.__doc__.format(b=_BOOT_B)


# ---------------------------------------------------------------------------
# AGMS (tug-of-war) second-moment sketch: self-join size estimation
# ---------------------------------------------------------------------------

_AGMS_REPS = 16
_AGMS_SEED = "agms-r9"


def _agms_sign_sql(h: str, key: str) -> str:
    return (
        f"CASE WHEN CAST(concat('0x', substr(md5(CAST({h} AS VARCHAR) || '|' "
        f"|| CAST({key} AS VARCHAR) || '|{_AGMS_SEED}'), 1, 15)) AS BIGINT)"
        f" % 2 = 0 THEN 1 ELSE -1 END"
    )


AGMS_SQL = f"""
WITH cnt AS (
  SELECT l_suppkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_suppkey
),
f2 AS (SELECT SUM(c * c) AS f2 FROM cnt),
z AS (
  SELECT h, SUM({_agms_sign_sql('h', 'k')} * c) AS zval
  FROM cnt CROSS JOIN (SELECT UNNEST(range({_AGMS_REPS})) AS h)
  GROUP BY h
),
est AS (SELECT SUM(zval * zval) AS sq FROM z)
SELECT CAST(f2.f2 AS BIGINT) AS exact_f2,
       CAST(est.sq AS DOUBLE) / {_AGMS_REPS} AS est_f2,
       FLOOR(ABS(CAST(est.sq AS DOUBLE) / {_AGMS_REPS}
                 - CAST(f2.f2 AS DOUBLE))
             / CAST(f2.f2 AS DOUBLE) * 1000000 + 0.5) / 1000000 AS rel_err
FROM f2 CROSS JOIN est
"""


@register(
    "lineitem_f2_agms",
    oracle=AGMS_SQL,
    survey=["agms-sketch", "second-moment", "join-size-estimation", "sketch"],
)
def lineitem_f2_agms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AGMS (Alon-Gilbert-Matias-Szegedy "tug-of-war") sketch of the
    second frequency moment of l_suppkey -- F2 = sum c_k^2 IS the
    self-equijoin size, the quantity a cost-based optimizer estimates
    before picking a join strategy. {r} independent +-1 hash signs give
    Z_i = sum sign_i(k)*c_k; mean(Z_i^2) is an unbiased F2 estimator
    with relative error ~1/sqrt({r}). The exact F2 is computed
    alongside so the output carries the realized relative error.

    Determinism: signs are md5-parity (engine-portable); every Z and
    Z^2 is exact integer arithmetic; the only doubles are the final
    mean and error, fixed IEEE ops quantized at 1e-6.

    Scale shape: ONE map-combinable count aggregate ends the
    corpus-sized work; the sketch is a {r}-way explode over the
    KEY-cardinality table (suppliers, not lineitems) into {r} exact
    sums -- mergeable partials, one pass, the sketch property that
    matters at 100 TB (the exact-F2 side is itself one aggregate)."""
    li = load(spark, sf_dir, "lineitem")
    cnt = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    f2 = cnt.agg(F.sum(F.col("c") * F.col("c")).alias("f2"))
    h = F.explode(F.sequence(F.lit(0), F.lit(_AGMS_REPS - 1))).alias("h")
    sign = F.when(
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|",
                        F.col("h").cast("string"),
                        F.col("k").cast("string"),
                        F.lit(_AGMS_SEED),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % 2
        == 0,
        1,
    ).otherwise(-1)
    z = (
        cnt.select("k", "c", h)
        .groupBy("h")
        .agg(F.sum(sign * F.col("c")).alias("zval"))
    )
    est = z.agg(F.sum(F.col("zval") * F.col("zval")).alias("sq"))
    est_f2 = F.col("sq").cast("double") / _AGMS_REPS
    rel = (
        F.floor(
            F.abs(est_f2 - F.col("f2").cast("double"))
            / F.col("f2").cast("double")
            * 1000000
            + F.lit(0.5)
        )
        / 1000000
    )
    return (
        f2.crossJoin(est)
        .select(
            F.col("f2").cast("bigint").alias("exact_f2"),
            est_f2.alias("est_f2"),
            rel.alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (heavy-tail diagnostics)
# ---------------------------------------------------------------------------

_HILL_K = 100

HILL_SQL = f"""
WITH top AS MATERIALIZED (
  SELECT o_totalprice AS x,
         ROW_NUMBER() OVER (ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
  ORDER BY o_totalprice DESC, o_orderkey LIMIT {_HILL_K + 1}
),
xm AS (SELECT x AS xmin FROM top WHERE rn = {_HILL_K + 1}),
terms AS (
  SELECT CAST(FLOOR(LN(t.x / xm.xmin) * 1000000000 + 0.5) AS BIGINT)
           AS ln_nano
  FROM top t CROSS JOIN xm WHERE t.rn <= {_HILL_K}
)
SELECT {_HILL_K} AS k,
       FLOOR(xm.xmin * 100 + 0.5) / 100 AS x_min,
       FLOOR({_HILL_K}.0 * 1000000000 / SUM(terms.ln_nano) * 1000000 + 0.5)
         / 1000000 AS hill_alpha
FROM terms CROSS JOIN xm
GROUP BY xm.xmin
"""


@register(
    "order_value_hill_tail",
    oracle=HILL_SQL,
    survey=["hill-estimator", "heavy-tail", "statistics", "top-k"],
)
def order_value_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill tail-index estimate over the top-{k} order values:
    alpha = k / sum ln(x_i / x_(k+1)) -- the heavy-tail diagnostic that
    decides whether means/variances are even meaningful for a metric
    (alpha <= 2: infinite variance; alpha <= 1: infinite mean). The
    power-law sibling of copurchase_degree_powerlaw, applied to a value
    column instead of degrees.

    Determinism: the top-(k+1) set is a TakeOrdered heap with full
    (value, orderkey) tie-break; each ln term is quantized to 1e-9
    integer units before the sum (BM25 ln discipline), so alpha is two
    exact integers through one IEEE division, quantized at 1e-6.

    Scale shape: ONE global top-(k+1) heap (per-task heaps merged at
    the driver -- no global sort); the rank window and the term sum run
    over the 101-row heap output, bounded by construction at any SF
    (hybrid_retrieval_rrf precedent)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    top = (
        orders.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(_HILL_K + 1)
        .select(
            F.col("o_totalprice").alias("x"),
            F.row_number()
            .over(
                Window.partitionBy().orderBy(
                    F.col("o_totalprice").desc(), "o_orderkey"
                )
            )
            .alias("rn"),
        )
    )
    xm = top.filter(F.col("rn") == _HILL_K + 1).select(
        F.col("x").alias("xmin")
    )
    terms = (
        top.filter(F.col("rn") <= _HILL_K)
        .crossJoin(F.broadcast(xm))
        .select(
            F.floor(
                F.log(F.col("x") / F.col("xmin")) * 1000000000 + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ln_nano"),
            "xmin",
        )
    )
    return terms.groupBy("xmin").agg(
        F.lit(_HILL_K).alias("k"),
        (F.floor(F.max("xmin") * 100 + F.lit(0.5)) / 100).alias("x_min"),
        (
            F.floor(
                F.lit(float(_HILL_K))
                * 1000000000
                / F.sum("ln_nano")
                * 1000000
                + F.lit(0.5)
            )
            / 1000000
        ).alias("hill_alpha"),
    ).select("k", "x_min", "hill_alpha")


# ---------------------------------------------------------------------------
# Distribution-free median confidence interval (order-statistic ranks)
# ---------------------------------------------------------------------------

MEDIAN_CI_SQL = """
WITH r AS (
  SELECT c.c_mktsegment AS seg,
         CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
         ROW_NUMBER() OVER (
           PARTITION BY c.c_mktsegment
           ORDER BY CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT),
                    o.o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY c.c_mktsegment) AS n
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
k AS (
  SELECT seg, rn, cents, n,
         GREATEST(CAST(FLOOR((n - 1.96 * SQRT(CAST(n AS DOUBLE))) / 2)
                  AS BIGINT), 1) AS r_lo,
         LEAST(CAST(CEIL((n + 1.96 * SQRT(CAST(n AS DOUBLE))) / 2 + 1)
               AS BIGINT), n) AS r_hi
  FROM r
)
SELECT seg,
       CAST(MAX(n) AS BIGINT) AS n,
       0.5 * (MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
              + MAX(CASE WHEN rn = n // 2 + 1 THEN cents END)) / 100
         AS median,
       CAST(MAX(CASE WHEN rn = r_lo THEN cents END) AS DOUBLE) / 100
         AS ci_lo,
       CAST(MAX(CASE WHEN rn = r_hi THEN cents END) AS DOUBLE) / 100
         AS ci_hi
FROM k GROUP BY seg
"""


@register(
    "segment_median_rank_ci",
    oracle=MEDIAN_CI_SQL,
    survey=["median-ci", "order-statistics", "distribution-free",
            "statistics"],
)
def segment_median_rank_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-free 95% confidence interval for the median order
    value per segment, via ORDER STATISTICS: the CI endpoints are the
    values at ranks n/2 -+ 1.96*sqrt(n)/2 (the binomial/sign-test
    interval -- valid for ANY continuous distribution, no normality or
    bootstrap needed; revenue_bootstrap_ci is the resampling sibling
    for the mean).

    Determinism: values are integer cents; the median averages the two
    middle RANKS explicitly (theilsen discipline, no engine percentile
    interpolation); the CI ranks come from one fixed IEEE formula on n,
    clamped into [1, n]; all picks are MAX(CASE WHEN rn = ...) over a
    (cents, orderkey)-tie-broken rank.

    Scale note: the rank window partitions on the 5-value segment key,
    so per-partition sort length grows with the corpus -- acceptable at
    bench scale, and the documented 100 TB swap is the
    exact_percentiles_two_pass bucket-spine (same rank-pick semantics,
    histogram-bounded memory), which this query intentionally mirrors
    in output shape."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    base = orders.join(cust, F.col("o_custkey") == F.col("c_custkey")).select(
        F.col("c_mktsegment").alias("seg"),
        cents.alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("seg").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("seg")
    r = base.select(
        "seg",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    nd = F.col("n").cast("double")
    r_lo = F.greatest(
        F.floor((F.col("n") - 1.96 * F.sqrt(nd)) / 2).cast("bigint"),
        F.lit(1).cast("bigint"),
    )
    r_hi = F.least(
        F.ceil((F.col("n") + 1.96 * F.sqrt(nd)) / 2 + 1).cast("bigint"),
        F.col("n").cast("bigint"),
    )
    k = r.select("seg", "rn", "cents", "n", r_lo.alias("r_lo"), r_hi.alias("r_hi"))
    pick = lambda cond: F.max(F.when(cond, F.col("cents")))  # noqa: E731
    return k.groupBy("seg").agg(
        F.max("n").cast("bigint").alias("n"),
        (
            0.5
            * (
                pick(F.col("rn") == F.floor((F.col("n") + 1) / 2))
                + pick(F.col("rn") == F.floor(F.col("n") / 2) + 1)
            )
            / 100
        ).alias("median"),
        (pick(F.col("rn") == F.col("r_lo")).cast("double") / 100).alias(
            "ci_lo"
        ),
        (pick(F.col("rn") == F.col("r_hi")).cast("double") / 100).alias(
            "ci_hi"
        ),
    )
