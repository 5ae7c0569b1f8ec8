"""Incremental warehouse maintenance: MERGE/upsert expressed as joins and
an SCD Type-2 dimension merge.

The reference's only incremental pattern is append-new-rows (left-anti,
loadToWarehouse.py:31-32, rebuilt as ``incremental_new_rows``). A real
warehouse also needs *updates*: this module adds the two standard shapes
on the driver's customer table, with a deterministic in-query "updates
batch" (derived from the same table, so both engines construct identical
inputs and the result is exactly oracle-comparable).

Scale design: the updates batch in a daily pipeline is orders of
magnitude smaller than the dimension, so both merge shapes are
broadcast-hash joins on the dim side with zero wide shuffles; the
dimension itself is never collected or recomputed — each run touches
only (dim ⋈ updates). Without a transactional table format this is the
full-outer-join MERGE; on Delta/Iceberg the same plan feeds MERGE INTO.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.registry import load, register

# Deterministic updates batch: every 7th customer gets a new balance and
# segment; every 97th key also appears shifted by _INSERT_OFFSET as an
# insert. The offset sits far above any generated corpus's customer keys
# (sf10 ~ 1.5M customers; 10M is safe at any plausible SF) so synthetic
# inserts can never collide with real keys — the same id-collision trap
# round-3 ADVICE flagged on the dedup delta corpus.
_INSERT_OFFSET = 10_000_000
_UPDATES_SQL = f"""
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
         'UPDATED' AS c_mktsegment
  FROM customer WHERE c_custkey % 7 = 0
  UNION ALL
  SELECT c_custkey + {_INSERT_OFFSET} AS c_custkey, 0.0 AS c_acctbal,
         'NEW' AS c_mktsegment
  FROM customer WHERE c_custkey % 97 = 0
"""


def _updates(cust: DataFrame) -> DataFrame:
    upd = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
    )
    ins = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + _INSERT_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
    )
    return upd.unionAll(ins)


@register(
    "merge_upsert_customers",
    oracle=f"""
WITH upd AS ({_UPDATES_SQL}),
dim AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
SELECT COALESCE(u.c_custkey, d.c_custkey) AS c_custkey,
       COALESCE(u.c_acctbal, d.c_acctbal) AS c_acctbal,
       COALESCE(u.c_mktsegment, d.c_mktsegment) AS c_mktsegment,
       (u.c_custkey IS NOT NULL AND d.c_custkey IS NOT NULL) AS was_updated,
       (d.c_custkey IS NULL) AS was_inserted
FROM dim d FULL OUTER JOIN upd u USING (c_custkey)
""",
    survey=["merge-upsert", "J1-family", "incremental"],
)
def merge_upsert_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE (upsert) as a full-outer join: matched rows take the update's
    values, unmatched-source rows insert, unmatched-target rows pass
    through. One join, no driver round-trip; the updates side is the
    small one and broadcasts."""
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    upd = _updates(dim)
    d, u = dim.alias("d"), upd.alias("u")
    return d.join(u, "c_custkey", "full_outer").select(
        F.col("c_custkey"),
        F.coalesce(F.col("u.c_acctbal"), F.col("d.c_acctbal")).alias(
            "c_acctbal"
        ),
        F.coalesce(F.col("u.c_mktsegment"), F.col("d.c_mktsegment")).alias(
            "c_mktsegment"
        ),
        (
            F.col("u.c_acctbal").isNotNull()
            & F.col("d.c_acctbal").isNotNull()
        ).alias("was_updated"),
        F.col("d.c_acctbal").isNull().alias("was_inserted"),
    )


@register(
    "scd2_customer_merge",
    oracle=f"""
WITH upd AS ({_UPDATES_SQL}),
dim AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment,
       1 AS version,
       (u.c_custkey IS NULL) AS is_current
FROM dim d LEFT JOIN upd u
  ON d.c_custkey = u.c_custkey AND u.c_mktsegment = 'UPDATED'
UNION ALL
SELECT u.c_custkey, u.c_acctbal, u.c_mktsegment,
       CASE WHEN d.c_custkey IS NULL THEN 1 ELSE 2 END AS version,
       TRUE AS is_current
FROM upd u LEFT JOIN dim d ON u.c_custkey = d.c_custkey
""",
    survey=["scd2", "merge-upsert", "incremental"],
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension Type 2 merge: updated keys keep their old
    row (closed, ``is_current = false``) and gain a new versioned row;
    inserts arrive at version 1; untouched rows stay current.

    Two joins against the small updates batch (both broadcast); the
    version column is derived from match status, not a window over the
    whole dimension — at scale an SCD2 table keys versions by effective
    date, which is this same plan with the batch date as a literal.
    """
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    upd = _updates(dim)
    upd_keys = upd.filter(F.col("c_mktsegment") == "UPDATED").select(
        "c_custkey"
    )
    history = (
        dim.join(upd_keys.withColumn("_hit", F.lit(1)), "c_custkey", "left")
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            F.lit(1).alias("version"),
            F.col("_hit").isNull().alias("is_current"),
        )
    )
    current = (
        upd.alias("u")
        .join(
            dim.select("c_custkey").withColumn("_hit", F.lit(1)).alias("d"),
            "c_custkey",
            "left",
        )
        .select(
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            F.when(F.col("_hit").isNull(), F.lit(1))
            .otherwise(F.lit(2))
            .alias("version"),
            F.lit(True).alias("is_current"),
        )
    )
    return history.unionAll(current)


# ---------------------------------------------------------------------------
# Snapshot diff: derive a CDC changefeed from two table versions
# ---------------------------------------------------------------------------

SNAPSHOT_DIFF_SQL = """
WITH old AS (
  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
),
new AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 101 = 0
              THEN CAST(FLOOR(o_totalprice * 110 + 0.5) AS DOUBLE) / 100
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderkey % 97 <> 0
  UNION ALL
  SELECT o_orderkey + 3000000 AS o_orderkey, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 103 = 0
)
SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
       CASE WHEN o.o_orderkey IS NULL THEN 'insert'
            WHEN n.o_orderkey IS NULL THEN 'delete'
            ELSE 'update' END AS op,
       o.o_totalprice AS old_price,
       n.o_totalprice AS new_price
FROM old o FULL JOIN new n ON o.o_orderkey = n.o_orderkey
WHERE o.o_orderkey IS NULL OR n.o_orderkey IS NULL
   OR o.o_totalprice <> n.o_totalprice
"""


@register(
    "snapshot_diff",
    oracle=SNAPSHOT_DIFF_SQL,
    survey=["cdc", "snapshot-diff", "incremental"],
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing: derive an insert/update/delete changefeed
    by comparing two versions of a table -- the CDC generator for
    sources that only hand you full snapshots (the inverse of
    cdc_latest_state, which compacts a feed back into a snapshot). The
    new version is derived deterministically in-query (price bumps,
    row drops, key-shifted inserts) so both engines diff identical
    inputs.

    Scale shape: one full outer join on the primary key -- co-
    partitioned if both snapshots are bucketed/clustered on that key, a
    plain hash shuffle otherwise -- followed by a row-local classify +
    changed-only filter; unchanged rows (the overwhelming majority of a
    daily diff) never leave the join stage. The deterministic 10% price
    bump uses integer-cent arithmetic so both engines compare the same
    doubles."""
    orders = load(spark, sf_dir, "orders")
    old = orders.select("o_orderkey", "o_totalprice", "o_orderstatus")
    bumped = (
        F.floor(F.col("o_totalprice") * 110 + 0.5).cast("double") / 100
    )
    new = (
        orders.filter(F.col("o_orderkey") % 97 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 101 == 0, bumped)
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionAll(
            orders.filter(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 3000000).alias("o_orderkey"),
                "o_totalprice",
                "o_orderstatus",
            )
        )
    )
    o = old.alias("o")
    n = new.alias("n")
    diff = o.join(n, F.col("o.o_orderkey") == F.col("n.o_orderkey"), "full")
    return diff.filter(
        F.col("o.o_orderkey").isNull()
        | F.col("n.o_orderkey").isNull()
        | (F.col("o.o_totalprice") != F.col("n.o_totalprice"))
    ).select(
        F.coalesce(F.col("o.o_orderkey"), F.col("n.o_orderkey")).alias(
            "o_orderkey"
        ),
        F.when(F.col("o.o_orderkey").isNull(), "insert")
        .when(F.col("n.o_orderkey").isNull(), "delete")
        .otherwise("update")
        .alias("op"),
        F.col("o.o_totalprice").alias("old_price"),
        F.col("n.o_totalprice").alias("new_price"),
    )


# ---------------------------------------------------------------------------
# Incremental view maintenance: merged partial aggregates == recompute
# ---------------------------------------------------------------------------

IVM_SQL = """
SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS month_start,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS rev_cents
FROM orders
GROUP BY 1
"""


@register(
    "ivm_revenue_by_month",
    oracle=IVM_SQL,
    survey=["incremental-view-maintenance", "merge", "G3-family"],
)
def ivm_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance of a monthly revenue aggregate: the
    standing view is built from the base partition (90% of orders), a
    delta batch (the remaining 10%) is aggregated separately, and the
    two PARTIAL aggregates merge with a full-outer coalescing sum --
    never rescanning the base. The oracle recomputes from scratch, so
    the hash check IS the IVM correctness theorem (merge(partials) ==
    recompute) for this query family; count and exact-integer sum are
    self-maintainable aggregates.

    Scale: this is how a 100 TB nightly rollup absorbs a daily delta --
    the merge join is aggregate-sized (months), not fact-sized; at
    higher key cardinality both sides are bucketed on the group key."""
    orders = load(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    month = F.to_date(F.date_trunc("month", "o_orderdate")).alias("month_start")

    def agg(df):
        return df.groupBy(month).agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).alias("rev_cents"),
        )

    base = agg(orders.filter(F.col("o_orderkey") % 10 != 0))
    delta = agg(orders.filter(F.col("o_orderkey") % 10 == 0))
    b, d = base.alias("b"), delta.alias("d")
    return (
        b.join(d, F.col("b.month_start") == F.col("d.month_start"), "full_outer")
        .select(
            F.coalesce(F.col("b.month_start"), F.col("d.month_start")).alias(
                "month_start"
            ),
            (
                F.coalesce(F.col("b.n_orders"), F.lit(0))
                + F.coalesce(F.col("d.n_orders"), F.lit(0))
            ).alias("n_orders"),
            (
                F.coalesce(F.col("b.rev_cents"), F.lit(0))
                + F.coalesce(F.col("d.rev_cents"), F.lit(0))
            ).alias("rev_cents"),
        )
    )


# ---------------------------------------------------------------------------
# Point-in-time join against a validity-windowed (SCD2-style) dimension
# ---------------------------------------------------------------------------

PIT_SQL = """
WITH v1 AS (
  SELECT c_custkey, c_mktsegment AS segment,
         DATE '1992-01-01' AS valid_from
  FROM customer
),
v2 AS (
  SELECT c_custkey, 'MIGRATED' AS segment,
         DATE '1996-01-01' AS valid_from
  FROM customer WHERE c_custkey % 3 = 0
),
dim AS (
  SELECT c_custkey, segment, valid_from,
         COALESCE(LEAD(valid_from) OVER (
           PARTITION BY c_custkey ORDER BY valid_from),
           DATE '9999-12-31') AS valid_to
  FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
)
SELECT d.segment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS rev_cents
FROM orders o
JOIN dim d ON o.o_custkey = d.c_custkey
          AND CAST(o.o_orderdate AS DATE) >= d.valid_from
          AND CAST(o.o_orderdate AS DATE) < d.valid_to
GROUP BY d.segment
"""


@register(
    "orders_pit_segment",
    oracle=PIT_SQL,
    survey=["point-in-time-join", "scd2", "temporal", "range-join"],
)
def orders_pit_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time join: each order picks the customer-segment VERSION
    that was valid on its order date from an SCD2-style validity-
    windowed dimension (v1 from 1992, a deterministic v2 'MIGRATED'
    wave from 1996 for every third customer; valid_to = next version's
    valid_from). The fact-to-dim-as-of-date query every temporal
    warehouse must answer.

    Scale: versions-per-key is tiny, so the PIT join is an equi-join on
    custkey with the validity predicate as a residual filter -- no
    range-join machinery needed (Spark plans exactly this); the
    dimension broadcasts. The valid_to derivation is a per-key lead
    window (parallel)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    v1 = cust.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        F.lit("1992-01-01").cast("date").alias("valid_from"),
    )
    v2 = cust.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit("MIGRATED").alias("segment"),
        F.lit("1996-01-01").cast("date").alias("valid_from"),
    )
    w = Window.partitionBy("c_custkey").orderBy("valid_from")
    dim = (
        v1.unionAll(v2)
        .withColumn(
            "valid_to",
            F.coalesce(
                F.lead("valid_from").over(w),
                F.lit("9999-12-31").cast("date"),
            ),
        )
    )
    od = F.to_date("o_orderdate")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    return (
        orders.join(
            dim,
            (orders.o_custkey == dim.c_custkey)
            & (od >= dim.valid_from)
            & (od < dim.valid_to),
        )
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(cents).cast("bigint").alias("rev_cents"),
        )
    )


# ---------------------------------------------------------------------------
# MERGE with delete tombstones: the full U/I/D changelog apply
# ---------------------------------------------------------------------------

# Deterministic changelog with all three ops: every 7th key updates,
# every 97th key (shifted) inserts, every 13th key DELETES (tombstone).
# Keys divisible by both 7 and 13 resolve as delete (delete wins over
# update — the standard CDC compaction rule when a batch carries both).
_CHANGELOG_SQL = f"""
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal,
         'UPDATED' AS c_mktsegment, 'U' AS op
  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + {_INSERT_OFFSET} AS c_custkey, 0.0 AS c_acctbal,
         'NEW' AS c_mktsegment, 'I' AS op
  FROM customer WHERE c_custkey % 97 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS DOUBLE) AS c_acctbal,
         CAST(NULL AS VARCHAR) AS c_mktsegment, 'D' AS op
  FROM customer WHERE c_custkey % 13 = 0
"""


@register(
    "merge_apply_changelog",
    oracle=f"""
WITH chg AS ({_CHANGELOG_SQL}),
dim AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer),
merged AS (
  SELECT COALESCE(c.c_custkey, d.c_custkey) AS c_custkey,
         CASE WHEN c.op = 'U' THEN c.c_acctbal
              WHEN c.op = 'I' THEN c.c_acctbal
              ELSE d.c_acctbal END AS c_acctbal,
         CASE WHEN c.op = 'U' THEN c.c_mktsegment
              WHEN c.op = 'I' THEN c.c_mktsegment
              ELSE d.c_mktsegment END AS c_mktsegment,
         c.op
  FROM dim d FULL OUTER JOIN chg c USING (c_custkey)
)
SELECT c_custkey, c_acctbal, c_mktsegment,
       COALESCE(op, 'K') AS applied_op
FROM merged
WHERE op IS DISTINCT FROM 'D'
""",
    survey=["merge-delete", "cdc", "tombstone", "incremental"],
)
def merge_apply_changelog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE applying a full U/I/D changelog — upsert plus DELETE
    tombstones, the semantics merge_upsert_customers lacks and every
    CDC-fed warehouse needs (a GDPR erasure or a source-row delete
    must REMOVE the dim row, not overwrite it). One full-outer join;
    matched 'D' rows drop out, 'U' rows take the update's values, 'I'
    rows insert, untouched rows pass through tagged 'K' (kept). When a
    batch carries both an update and a delete for a key, delete wins —
    the changelog construction resolves that upstream (op priority),
    mirroring CDC compaction.

    Scale shape: the changelog side of a daily batch is delta-sized →
    broadcast; the dim is never rewritten except through this join. On
    a transactional format the same plan feeds MERGE INTO ... WHEN
    MATCHED AND op = 'D' THEN DELETE."""
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    cust = load(spark, sf_dir, "customer")
    upd = cust.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 13 != 0)
    ).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("U").alias("op"),
    )
    ins = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + _INSERT_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    dele = cust.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    chg = upd.unionAll(ins).unionAll(dele)
    d, c = dim.alias("d"), chg.alias("c")
    take_new = F.col("c.op").isin("U", "I")
    return (
        d.join(c, "c_custkey", "full_outer")
        .select(
            F.col("c_custkey"),
            F.when(take_new, F.col("c.c_acctbal"))
            .otherwise(F.col("d.c_acctbal"))
            .alias("c_acctbal"),
            F.when(take_new, F.col("c.c_mktsegment"))
            .otherwise(F.col("d.c_mktsegment"))
            .alias("c_mktsegment"),
            F.coalesce(F.col("c.op"), F.lit("K")).alias("applied_op"),
            F.col("c.op").alias("_op"),
        )
        .filter(
            F.col("_op").isNull() | (F.col("_op") != "D")
        )
        .drop("_op")
    )


@register(
    "scd2_with_deletes",
    oracle=f"""
WITH chg AS ({_CHANGELOG_SQL}),
dim AS (SELECT c_custkey, c_acctbal, c_mktsegment FROM customer)
SELECT d.c_custkey, d.c_acctbal, d.c_mktsegment,
       1 AS version,
       (c.op IS NULL) AS is_current,
       CASE c.op WHEN 'U' THEN 'updated'
                 WHEN 'D' THEN 'deleted' END AS end_reason
FROM dim d LEFT JOIN chg c
  ON d.c_custkey = c.c_custkey AND c.op IN ('U', 'D')
UNION ALL
SELECT c.c_custkey, c.c_acctbal, c.c_mktsegment,
       CASE WHEN c.op = 'I' THEN 1 ELSE 2 END AS version,
       TRUE AS is_current,
       CAST(NULL AS VARCHAR) AS end_reason
FROM chg c WHERE c.op IN ('U', 'I')
""",
    survey=["scd2", "merge-delete", "tombstone", "incremental"],
)
def scd2_with_deletes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history under a full U/I/D changelog: updates CLOSE
    the current version (is_current=false, end_reason='updated') and
    open version 2; deletes close it with end_reason='deleted' and
    open NOTHING — the tombstone leaves only closed history, which is
    what distinguishes an SCD2 delete from a hard delete (the audit
    trail survives; merge_apply_changelog is the hard-delete twin).
    Inserts open version 1 directly.

    Scale shape: identical to scd2_customer_merge — the changelog side
    broadcasts, the dimension is touched once per branch of the union
    and both branches share the one scan; history grows by exactly the
    changelog's U+I row count per run."""
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    cust = load(spark, sf_dir, "customer")
    upd = cust.filter(
        (F.col("c_custkey") % 7 == 0) & (F.col("c_custkey") % 13 != 0)
    ).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        F.lit("UPDATED").alias("c_mktsegment"),
        F.lit("U").alias("op"),
    )
    ins = cust.filter(F.col("c_custkey") % 97 == 0).select(
        (F.col("c_custkey") + _INSERT_OFFSET).alias("c_custkey"),
        F.lit(0.0).alias("c_acctbal"),
        F.lit("NEW").alias("c_mktsegment"),
        F.lit("I").alias("op"),
    )
    dele = cust.filter(F.col("c_custkey") % 13 == 0).select(
        "c_custkey",
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
        F.lit("D").alias("op"),
    )
    chg = upd.unionAll(ins).unionAll(dele)
    d = dim.alias("d")
    c = chg.filter(F.col("op").isin("U", "D")).alias("c")
    closed = d.join(
        c, F.col("d.c_custkey") == F.col("c.c_custkey"), "left"
    ).select(
        F.col("d.c_custkey").alias("c_custkey"),
        F.col("d.c_acctbal").alias("c_acctbal"),
        F.col("d.c_mktsegment").alias("c_mktsegment"),
        F.lit(1).alias("version"),
        F.col("c.op").isNull().alias("is_current"),
        F.when(F.col("c.op") == "U", F.lit("updated"))
        .when(F.col("c.op") == "D", F.lit("deleted"))
        .alias("end_reason"),
    )
    opened = chg.filter(F.col("op").isin("U", "I")).select(
        "c_custkey",
        "c_acctbal",
        "c_mktsegment",
        F.when(F.col("op") == "I", 1).otherwise(2).alias("version"),
        F.lit(True).alias("is_current"),
        F.lit(None).cast("string").alias("end_reason"),
    )
    return closed.unionAll(opened)


# ---------------------------------------------------------------------------
# Schema-evolution MERGE: a changelog generation adds a column mid-stream
# ---------------------------------------------------------------------------


@register(
    "merge_schema_evolution",
    oracle="""
WITH g1 AS (
  SELECT c_custkey, c_acctbal + 100.0 AS c_acctbal, c_mktsegment,
         CAST(NULL AS VARCHAR) AS loyalty_tier, 1 AS gen
  FROM customer WHERE c_custkey % 5 = 0
),
g2 AS (
  SELECT c_custkey, c_acctbal + 200.0 AS c_acctbal, c_mktsegment,
         CASE WHEN c_custkey % 14 = 0 THEN 'GOLD' ELSE 'SILVER' END
           AS loyalty_tier,
         2 AS gen
  FROM customer WHERE c_custkey % 7 = 0
),
latest AS (
  SELECT c_custkey, c_acctbal, c_mktsegment, loyalty_tier, gen
  FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey
                                 ORDER BY gen DESC) AS rn
    FROM (SELECT * FROM g1 UNION ALL SELECT * FROM g2)
  ) WHERE rn = 1
)
SELECT d.c_custkey,
       COALESCE(u.c_acctbal, d.c_acctbal) AS c_acctbal,
       d.c_mktsegment,
       u.loyalty_tier,
       CAST(COALESCE(u.gen, 0) AS BIGINT) AS src_gen
FROM customer d LEFT JOIN latest u USING (c_custkey)
""",
    survey=["merge-upsert", "schema-evolution", "cdc", "incremental"],
)
def merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE where the changelog's schema EVOLVES between generations:
    generation 1 (a legacy producer) carries (key, acctbal, segment);
    generation 2 adds a ``loyalty_tier`` column. The write-side twin of
    ``read_with_evolution`` (sources/readers.py:114): the generations
    combine via ``unionByName(allowMissingColumns=True)`` — Spark's
    schema-evolution union, backfilling the missing column with NULL —
    then latest-generation-wins per key (a key-partitioned window, the
    CDC compaction shape), then one left merge join into the dim. The
    target schema gains the new column; rows last touched by a
    generation that predates it hold NULL, exactly Delta/Iceberg
    ``mergeSchema`` semantics rebuilt on the plain-parquet engine.

    Scale shape: each changelog generation is delta-sized; the window
    partitions by key over the UNION OF DELTAS (never the dim); the
    final join is dim x latest on the key — broadcast when deltas are
    daily-sized, AQE-shuffled otherwise. The dim is read once, never
    windowed."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    g1 = cust.filter(F.col("c_custkey") % 5 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 100.0).alias("c_acctbal"),
        "c_mktsegment",
        F.lit(1).alias("gen"),
    )
    g2 = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey",
        (F.col("c_acctbal") + 200.0).alias("c_acctbal"),
        "c_mktsegment",
        F.when(F.col("c_custkey") % 14 == 0, F.lit("GOLD"))
        .otherwise(F.lit("SILVER"))
        .alias("loyalty_tier"),
        F.lit(2).alias("gen"),
    )
    chg = g1.unionByName(g2, allowMissingColumns=True)
    w = Window.partitionBy("c_custkey").orderBy(F.col("gen").desc())
    latest = (
        chg.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_custkey",
            F.col("c_acctbal").alias("u_acctbal"),
            "loyalty_tier",
            F.col("gen").alias("u_gen"),
        )
    )
    return cust.join(latest, "c_custkey", "left").select(
        "c_custkey",
        F.coalesce(F.col("u_acctbal"), F.col("c_acctbal")).alias("c_acctbal"),
        "c_mktsegment",
        "loyalty_tier",
        F.coalesce(F.col("u_gen"), F.lit(0)).cast("long").alias("src_gen"),
    )


# ---------------------------------------------------------------------------
# Partition-level reconcile: manifest diff between a table and its replica
# ---------------------------------------------------------------------------

_RECON_MOD = 1_000_000_007

RECONCILE_SQL = f"""
WITH src AS (
  SELECT CAST(YEAR(o_orderdate) * 100 + MONTH(o_orderdate) AS BIGINT) AS ym,
         o_orderkey,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders
),
dst AS (
  SELECT * FROM src
  WHERE ym % 7 <> 3
    AND NOT (ym % 7 = 5 AND o_orderkey % 97 = 0)
),
sm AS (
  SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_src,
         CAST(SUM(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
           || ':' || CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_RECON_MOD}) AS BIGINT) AS sum_src
  FROM src GROUP BY ym
),
dm AS (
  SELECT ym, CAST(COUNT(*) AS BIGINT) AS n_dst,
         CAST(SUM(CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
           || ':' || CAST(cents AS VARCHAR)), 1, 15)) AS BIGINT)
           % {_RECON_MOD}) AS BIGINT) AS sum_dst
  FROM dst GROUP BY ym
)
SELECT s.ym,
       s.n_src,
       COALESCE(d.n_dst, 0) AS n_dst,
       s.sum_src,
       COALESCE(d.sum_dst, 0) AS sum_dst,
       CASE WHEN d.ym IS NULL THEN 'copy'
            WHEN s.n_src <> d.n_dst OR s.sum_src <> d.sum_dst THEN 'repair'
            ELSE 'ok' END AS action
FROM sm s LEFT JOIN dm d USING (ym)
"""


@register(
    "partition_reconcile_repair",
    oracle=RECONCILE_SQL,
    survey=[
        "partition-reconcile", "replication-audit", "checksum-manifest",
        "incremental", "repair-plan",
    ],
)
def partition_reconcile_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Replication audit at partition granularity: build a per-partition
    manifest (row count + order-insensitive content checksum) for a
    table and its replica, diff the manifests, and emit the repair plan
    — 'copy' for partitions missing from the replica, 'repair' where
    count or checksum diverge, 'ok' otherwise. The replica is derived
    deterministically in-query (every 7th month-partition missing, rows
    dropped from every 7th-offset-5 partition) so both engines audit
    identical inputs. This is the scalable FIRST pass of replica
    repair: row-level diffing (snapshot_diff above) then runs only
    inside the partitions this query flags, never across the full
    table.

    Scale shape: each side is one scan + one map-side-combinable
    aggregate keyed by partition (the manifest is |partitions| rows —
    metadata-sized); the diff joins two manifest tables, so the
    expensive compare never shuffles data rows. The checksum sums
    per-row bounded hashes (md5 head mod 1e9+7, each < 2^30), keeping
    the BIGINT sum exact on both engines to ~9e9 rows per partition."""
    orders = load(spark, sf_dir, "orders")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast("long")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
    src = orders.select(
        ym.alias("ym"), "o_orderkey", cents.alias("cents")
    )
    dst = src.filter(
        (F.col("ym") % 7 != 3)
        & ~((F.col("ym") % 7 == 5) & (F.col("o_orderkey") % 97 == 0))
    )
    row_h = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("o_orderkey").cast("string"),
                        F.col("cents").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        % _RECON_MOD
    )

    def manifest(side: DataFrame, n: str, s: str) -> DataFrame:
        return side.groupBy("ym").agg(
            F.count(F.lit(1)).alias(n), F.sum(row_h).alias(s)
        )

    sm = manifest(src, "n_src", "sum_src")
    dm = manifest(dst, "n_dst", "sum_dst")
    diverged = (F.col("n_src") != F.col("n_dst")) | (
        F.col("sum_src") != F.col("sum_dst")
    )
    return sm.join(dm.alias("d"), "ym", "left").select(
        "ym",
        "n_src",
        F.coalesce(F.col("n_dst"), F.lit(0)).alias("n_dst"),
        "sum_src",
        F.coalesce(F.col("sum_dst"), F.lit(0)).alias("sum_dst"),
        F.when(F.col("d.ym").isNull(), "copy")
        .when(diverged, "repair")
        .otherwise("ok")
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# GDPR forget pipeline: deletion-list propagation with a per-table audit
# ---------------------------------------------------------------------------

FORGET_SQL = """
WITH forget AS (
  SELECT c_custkey FROM customer WHERE c_custkey % 13 = 0
),
ev AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(SUM(CASE WHEN f.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS rows_affected,
         CAST(COUNT(DISTINCT f.c_custkey) AS BIGINT) AS n_users_affected
  FROM events e LEFT JOIN forget f ON e.user_id = f.c_custkey
),
od AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(SUM(CASE WHEN f.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
           AS BIGINT) AS rows_affected,
         CAST(COUNT(DISTINCT f.c_custkey) AS BIGINT) AS n_users_affected
  FROM orders o LEFT JOIN forget f ON o.o_custkey = f.c_custkey
),
cu AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS rows_before,
         CAST(SUM(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS rows_affected,
         CAST(SUM(CASE WHEN c_custkey % 13 = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_users_affected
  FROM customer
)
SELECT 'events' AS table_name, 'delete' AS policy, rows_before,
       rows_affected, rows_before - rows_affected AS rows_after,
       n_users_affected
FROM ev
UNION ALL
SELECT 'orders', 'anonymize', rows_before, rows_affected,
       rows_before, n_users_affected
FROM od
UNION ALL
SELECT 'customer', 'delete', rows_before, rows_affected,
       rows_before - rows_affected, n_users_affected
FROM cu
"""


@register(
    "forget_user_pipeline",
    oracle=FORGET_SQL,
    survey=[
        "gdpr-forget", "deletion-propagation", "anti-join", "audit",
        "incremental",
    ],
)
def forget_user_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten propagation: a deletion list (every 13th
    customer) fans out across every table that references the subject,
    each with its own policy — events rows are DELETED (anti-join
    rewrite), orders are ANONYMIZED in place (the fact rows survive for
    accounting, the subject key is scrubbed), the customer dim row is
    deleted. The query returns the audit record a compliance pipeline
    must durably log: per table, rows before / affected / after plus
    the count of distinct subjects touched.

    Scale shape: each table is scanned once and joined against the
    deletion list on its subject key (the list is dim-derived —
    unhinted, AQE broadcasts a daily-sized list and shuffles a backfill
    -sized one); every audit row is a scalar aggregate, so nothing
    wider than the join's key shuffle ever moves. The actual purge
    write is the same anti-join/scrub projection streamed to a new
    partition generation — the audit and the rewrite share one plan."""
    forget = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 13 == 0)
        .select("c_custkey")
    )

    def audit(df: DataFrame, key: str) -> DataFrame:
        hit = F.col("c_custkey").isNotNull()
        return df.join(
            forget, df[key] == forget.c_custkey, "left"
        ).agg(
            F.count(F.lit(1)).alias("rows_before"),
            F.sum(F.when(hit, 1).otherwise(0)).alias("rows_affected"),
            F.countDistinct("c_custkey").alias("n_users_affected"),
        )

    ev = audit(load(spark, sf_dir, "events"), "user_id").select(
        F.lit("events").alias("table_name"),
        F.lit("delete").alias("policy"),
        "rows_before",
        "rows_affected",
        (F.col("rows_before") - F.col("rows_affected")).alias("rows_after"),
        "n_users_affected",
    )
    od = audit(load(spark, sf_dir, "orders"), "o_custkey").select(
        F.lit("orders").alias("table_name"),
        F.lit("anonymize").alias("policy"),
        "rows_before",
        "rows_affected",
        F.col("rows_before").alias("rows_after"),
        "n_users_affected",
    )
    affected = F.sum(
        F.when(F.col("c_custkey") % 13 == 0, 1).otherwise(0)
    )
    cu = (
        load(spark, sf_dir, "customer")
        .agg(
            F.count(F.lit(1)).alias("rows_before"),
            affected.alias("rows_affected"),
        )
        .select(
            F.lit("customer").alias("table_name"),
            F.lit("delete").alias("policy"),
            "rows_before",
            "rows_affected",
            (F.col("rows_before") - F.col("rows_affected")).alias(
                "rows_after"
            ),
            F.col("rows_affected").alias("n_users_affected"),
        )
    )
    return ev.unionAll(od).unionAll(cu)


# ---------------------------------------------------------------------------
# Iceberg-style snapshot-isolation read (round 11)
# ---------------------------------------------------------------------------

# Three deterministic commit generations over the customer dimension,
# every row derived from the base table so both engines construct the
# identical log. Each generation touches each key at most once (the
# moduli are made disjoint within a generation), so "latest wins" is a
# total order on (key, gen):
#   gen 0  the initial commit: every base row as an insert
#   gen 1  the _CHANGELOG_SQL batch (update %7, delete %13, insert %97)
#   gen 2  update-after-update (%5, minus the %11/%13 keys this gen
#          deletes/skips), delete-after-update (%11), and
#          insert-after-delete (%13 keys divisible by 3 come BACK)
_SNAPSHOT_IDS = (1, 2)

def _snapshot_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The deterministic 7-commit CDC log over the customer dimension
    (see the generation map above), shared by snapshot_isolation_read
    and snapshot_expire — the Spark twin of _SNAPSHOT_LOG_SQL."""
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    k = F.col("c_custkey")

    def _commit(rows: DataFrame, bal, seg, gen: int, op: str) -> DataFrame:
        return rows.select(
            "c_custkey",
            bal.alias("c_acctbal"),
            seg.alias("c_mktsegment"),
            F.lit(gen).alias("gen"),
            F.lit(op).alias("op"),
        )

    null_bal = F.lit(None).cast("double")
    null_seg = F.lit(None).cast("string")
    return (
        _commit(cust, F.col("c_acctbal"), F.col("c_mktsegment"), 0, "I")
        .unionAll(_commit(
            cust.filter((k % 7 == 0) & (k % 13 != 0)),
            F.col("c_acctbal") + 100.0, F.lit("UPDATED"), 1, "U",
        ))
        .unionAll(
            cust.filter(k % 97 == 0).select(
                (k + _INSERT_OFFSET).alias("c_custkey"),
                F.lit(0.0).alias("c_acctbal"),
                F.lit("NEW").alias("c_mktsegment"),
                F.lit(1).alias("gen"),
                F.lit("I").alias("op"),
            )
        )
        .unionAll(_commit(
            cust.filter(k % 13 == 0), null_bal, null_seg, 1, "D",
        ))
        .unionAll(_commit(
            cust.filter((k % 5 == 0) & (k % 11 != 0) & (k % 13 != 0)),
            F.col("c_acctbal") + 200.0, F.lit("UPDATED2"), 2, "U",
        ))
        .unionAll(_commit(
            cust.filter((k % 11 == 0) & (k % 13 != 0)),
            null_bal, null_seg, 2, "D",
        ))
        .unionAll(_commit(
            cust.filter((k % 13 == 0) & (k % 3 == 0)),
            F.lit(50.0), F.lit("RESTORED"), 2, "I",
        ))
    )


# The commit log as a standalone SQL fragment so the expire/compaction
# twin (snapshot_expire, r12) composes the SAME log; the interpolation
# keeps SNAPSHOT_ISOLATION_SQL byte-identical to its r11 form.
_SNAPSHOT_LOG_SQL = f"""
  SELECT c_custkey, c_acctbal, c_mktsegment, 0 AS gen, 'I' AS op
  FROM customer
  UNION ALL
  SELECT c_custkey, c_acctbal + 100.0, 'UPDATED', 1, 'U'
  FROM customer WHERE c_custkey % 7 = 0 AND c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey + {_INSERT_OFFSET}, 0.0, 'NEW', 1, 'I'
  FROM customer WHERE c_custkey % 97 = 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), 1, 'D'
  FROM customer WHERE c_custkey % 13 = 0
  UNION ALL
  SELECT c_custkey, c_acctbal + 200.0, 'UPDATED2', 2, 'U'
  FROM customer
  WHERE c_custkey % 5 = 0 AND c_custkey % 11 <> 0 AND c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey, CAST(NULL AS DOUBLE), CAST(NULL AS VARCHAR), 2, 'D'
  FROM customer WHERE c_custkey % 11 = 0 AND c_custkey % 13 <> 0
  UNION ALL
  SELECT c_custkey, 50.0, 'RESTORED', 2, 'I'
  FROM customer WHERE c_custkey % 13 = 0 AND c_custkey % 3 = 0
"""

SNAPSHOT_ISOLATION_SQL = f"""
WITH log AS ({_SNAPSHOT_LOG_SQL}),
snaps AS (SELECT UNNEST([{", ".join(str(s) for s in _SNAPSHOT_IDS)}])
          AS snapshot_id),
pinned AS (
  SELECT s.snapshot_id, l.c_custkey, l.c_acctbal, l.c_mktsegment,
         l.gen, l.op,
         ROW_NUMBER() OVER (PARTITION BY s.snapshot_id, l.c_custkey
                            ORDER BY l.gen DESC) AS rn
  FROM log l CROSS JOIN snaps s
  WHERE l.gen <= s.snapshot_id
)
SELECT snapshot_id, c_custkey, c_acctbal, c_mktsegment,
       gen AS version, op AS last_op
FROM pinned WHERE rn = 1 AND op <> 'D'
"""


@register(
    "snapshot_isolation_read",
    oracle=SNAPSHOT_ISOLATION_SQL,
    survey=["snapshot-isolation", "time-travel", "cdc-log", "incremental"],
    bench=True,  # r12: promoted into the headline + _SF1_SPOT sets
)
def snapshot_isolation_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg/Delta-style snapshot-isolation read over a multi-commit
    CDC log: two readers pinned at snapshot 1 and snapshot 2 each see
    the EXACT table state their snapshot committed — latest row image
    per key with generation <= snapshot, delete tombstones excluded.
    One result, tagged by snapshot_id, covers the isolation guarantee
    (the same key shows different values/absence across snapshots) and
    all four CDC shapes: update-after-update (gen-2 'UPDATED2'
    overrides gen-1 'UPDATED'), delete-after-update, insert-after-
    delete (a %39 key deleted at snapshot 1 is 'RESTORED' at 2), and
    plain pass-through ('I' from the initial commit).

    The merge family (merge_apply_changelog, scd2_with_deletes) applies
    ONE batch against the current state; this is the read-side
    complement — reconstructing ANY committed state from the immutable
    log, Iceberg's `VERSION AS OF` on public-API Spark.

    Scale shape: each commit's delta is delta-sized and appended, never
    rewritten; the reconstruction is one hash shuffle keyed on
    (snapshot, key) with a per-key rank over at most gen-many rows (a
    real table format prunes by manifest first — the latest-wins rank
    is what MERGE-on-read does per file group). The snapshot spine is
    a {n}-row broadcast constant side; output partitions by the same
    key the shuffle already produced."""
    log = _snapshot_log(spark, sf_dir)
    snaps = spark.range(_SNAPSHOT_IDS[0], _SNAPSHOT_IDS[-1] + 1).select(
        F.col("id").cast("int").alias("snapshot_id")
    )
    pinned = log.crossJoin(F.broadcast(snaps)).filter(
        F.col("gen") <= F.col("snapshot_id")
    )
    w = Window.partitionBy("snapshot_id", "c_custkey").orderBy(
        F.col("gen").desc()
    )
    return (
        pinned.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "snapshot_id",
            "c_custkey",
            "c_acctbal",
            "c_mktsegment",
            F.col("gen").alias("version"),
            F.col("op").alias("last_op"),
        )
    )


snapshot_isolation_read.__doc__ = snapshot_isolation_read.__doc__.format(
    n=len(_SNAPSHOT_IDS)
)


# ---------------------------------------------------------------------------
# Iceberg-style snapshot expiry + manifest compaction (round 12)
# ---------------------------------------------------------------------------

# Oldest snapshot still retained after expiry. Snapshots below it (the
# implicit snapshot 0 = the initial commit) are expired: history that
# only those snapshots could see is reclaimable. Time travel to
# snapshots >= the floor must keep working, so entries with
# gen > floor are never touched.
_EXPIRE_FLOOR = 1

SNAPSHOT_EXPIRE_SQL = f"""
WITH log AS ({_SNAPSHOT_LOG_SQL}),
manifest AS (
  SELECT c_custkey,
         CAST(COUNT(*) AS BIGINT) AS versions_total,
         CAST(SUM(CASE WHEN gen <= {_EXPIRE_FLOOR} THEN 1 ELSE 0 END)
              AS BIGINT) AS base_versions,
         MAX(CASE WHEN gen <= {_EXPIRE_FLOOR} THEN gen END) AS base_gen,
         CAST(SUM(CASE WHEN gen > {_EXPIRE_FLOOR} THEN 1 ELSE 0 END)
              AS BIGINT) AS tail_versions
  FROM log
  GROUP BY c_custkey
)
SELECT m.c_custkey,
       m.versions_total,
       CAST(CASE WHEN m.base_versions = 0 THEN 0
                 WHEN l.op = 'D' THEN m.base_versions
                 ELSE m.base_versions - 1 END AS BIGINT)
         AS versions_reclaimed,
       (m.base_versions > 0 AND l.op <> 'D') AS base_live,
       m.base_gen,
       l.c_acctbal AS base_acctbal,
       l.c_mktsegment AS base_mktsegment,
       m.tail_versions
FROM manifest m
LEFT JOIN log l
  ON l.c_custkey = m.c_custkey AND l.gen = m.base_gen
"""


@register(
    "snapshot_expire",
    oracle=SNAPSHOT_EXPIRE_SQL,
    survey=[
        "snapshot-expire", "manifest-compaction", "cdc-log", "incremental",
    ],
    bench=True,  # r13: promoted into headline + _SF1_SPOT (VERDICT item 5)
)
def snapshot_expire(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style `expire_snapshots` + manifest compaction over the
    same multi-commit CDC log as snapshot_isolation_read (its write-
    side twin): snapshots below generation {floor} are expired, so per
    key everything at gen <= {floor} squashes to its single latest
    entry (the compacted base — exactly the state snapshot {floor}
    committed) and the shadowed older entries are RECLAIMED. A base
    tombstone reclaims itself too (a deleted key simply isn't in the
    compacted base); entries newer than the floor are untouched — time
    travel to every retained snapshot still works. The output is the
    per-key compaction ledger: total log entries, entries reclaimed,
    the surviving base image (gen/op/values; absent for keys born
    after the floor), and the retained tail length.

    Where snapshot_isolation_read reconstructs state with a per-key
    rank WINDOW, the compaction ledger needs no sort at all: one
    map-side-combinable aggregate (COUNT + conditional SUM/MAX over
    the bounded gen domain) elects the base generation, and one
    join-back on (key, base_gen) fetches its image — the join reuses
    the aggregate's hash partitioning, so the whole plan is ONE
    key-keyed exchange plus an AQE-reused join. That is the manifest
    pattern: stats first, then touch only elected entries.

    Scale shape: at 100 TB each commit's delta is delta-sized; the
    ledger aggregate partial-combines per map task (gen domain is
    O(commits), values are counters), and the reclaim decision is
    per-key local — no global sort, no window, no skew (keys are
    unique per log entry per generation by construction). A real
    table format runs exactly this per file group and deletes the
    reclaimed data files; the ledger is the audit record it emits.

    Reference parity: the reference has no table-format maintenance
    at all (its warehouse is overwrite-only hive tables,
    loadToWarehouse.py) — this extends the incremental family the
    same way snapshot_isolation_read did on the read side."""
    log = _snapshot_log(spark, sf_dir)
    floor = F.lit(_EXPIRE_FLOOR)
    manifest = log.groupBy("c_custkey").agg(
        F.count(F.lit(1)).alias("versions_total"),
        F.sum(
            F.when(F.col("gen") <= floor, 1).otherwise(0)
        ).alias("base_versions"),
        F.max(F.when(F.col("gen") <= floor, F.col("gen"))).alias(
            "base_gen"
        ),
        F.sum(
            F.when(F.col("gen") > floor, 1).otherwise(0)
        ).alias("tail_versions"),
    )
    # base_gen <= floor by construction, so the explicit filter is a
    # no-op semantically but lets Catalyst drop the post-floor commit
    # branches from the join side's union before they are ever scanned
    base = log.filter(F.col("gen") <= floor).select(
        "c_custkey",
        F.col("gen").alias("base_gen"),
        F.col("c_acctbal").alias("base_acctbal"),
        F.col("c_mktsegment").alias("base_mktsegment"),
        "op",
    )
    reclaimed = (
        F.when(F.col("base_versions") == 0, F.lit(0))
        .when(F.col("op") == "D", F.col("base_versions"))
        .otherwise(F.col("base_versions") - 1)
        .cast("long")
    )
    return (
        manifest.join(base, ["c_custkey", "base_gen"], "left")
        .select(
            "c_custkey",
            "versions_total",
            reclaimed.alias("versions_reclaimed"),
            (
                (F.col("base_versions") > 0) & (F.col("op") != "D")
            ).alias("base_live"),
            "base_gen",
            "base_acctbal",
            "base_mktsegment",
            "tail_versions",
        )
    )


snapshot_expire.__doc__ = snapshot_expire.__doc__.format(
    floor=_EXPIRE_FLOOR
)


# ---------------------------------------------------------------------------
# Snapshot-to-snapshot changefeed (round 12): Iceberg table_changes /
# Delta CDF between two committed versions of the same CDC log
# ---------------------------------------------------------------------------

_CHANGES_FROM = 1  # changefeed window: (from, to] over committed snapshots
_CHANGES_TO = 2

SNAPSHOT_CHANGES_SQL = f"""
WITH log AS ({_SNAPSHOT_LOG_SQL}),
latest AS (
  SELECT c_custkey,
         MAX(CASE WHEN gen <= {_CHANGES_FROM} THEN gen END) AS gen_from,
         MAX(CASE WHEN gen <= {_CHANGES_TO} THEN gen END) AS gen_to
  FROM log
  GROUP BY c_custkey
),
states AS (
  SELECT l.c_custkey,
         (f.gen IS NOT NULL AND f.op <> 'D') AS live_from,
         (t.op <> 'D') AS live_to,
         l.gen_from, l.gen_to,
         f.c_acctbal AS old_acctbal, f.c_mktsegment AS old_mktsegment,
         t.c_acctbal AS new_acctbal, t.c_mktsegment AS new_mktsegment
  FROM latest l
  LEFT JOIN log f
    ON f.c_custkey = l.c_custkey AND f.gen = l.gen_from
  JOIN log t
    ON t.c_custkey = l.c_custkey AND t.gen = l.gen_to
)
SELECT c_custkey,
       CASE WHEN NOT live_from THEN 'insert'
            WHEN NOT live_to THEN 'delete'
            ELSE 'update' END AS change_op,
       CASE WHEN live_from THEN old_acctbal END AS old_acctbal,
       CASE WHEN live_from THEN old_mktsegment END AS old_mktsegment,
       CASE WHEN live_to THEN new_acctbal END AS new_acctbal,
       CASE WHEN live_to THEN new_mktsegment END AS new_mktsegment,
       gen_from, gen_to
FROM states
WHERE gen_to > COALESCE(gen_from, -1)
  AND (live_from OR live_to)
"""


@register(
    "snapshot_changes",
    oracle=SNAPSHOT_CHANGES_SQL,
    survey=["changefeed", "cdf", "table-changes", "cdc-log", "incremental"],
    bench=True,  # r13: promoted into headline + _SF1_SPOT (VERDICT item 5)
)
def snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg `table_changes` / Delta Change Data Feed between two
    committed snapshots of the same CDC log the read/expire twins use:
    the NET per-key change over the window (snapshot {f}, snapshot
    {t}] — a key deleted-then-restored inside the window nets to an
    update, one born inside it to an insert, one whose latest entry
    precedes the window to nothing. Emits the classified change_op
    with both row images (old absent for inserts, new absent for
    deletes) and the generation endpoints.

    One pass elects BOTH endpoint generations per key (two conditional
    MAXes in the same map-side-combinable aggregate — the
    snapshot_expire pattern, doubled), then two join-backs on
    (key, gen) fetch the endpoint images; keys with no entry inside
    the window (gen_to == gen_from) and dead-to-dead keys drop out.
    Completes the snapshot family: read (state AT a version), expire
    (history BELOW a floor), changes (delta BETWEEN versions).

    Scale shape: at 100 TB a changefeed consumer reads only the
    window's delta files after manifest pruning; this plan's aggregate
    partial-combines per map task over O(commits)-sized per-key
    groups, both join-backs reuse the aggregate's key partitioning,
    and nothing sorts or windows — the same no-sort compaction shape
    as snapshot_expire, applied to the read side of downstream
    incremental sync (the consumer of merge_apply_changelog's
    write side)."""
    return _changes_between(_snapshot_log(spark, sf_dir), _CHANGES_FROM,
                            _CHANGES_TO)


def _changes_between(log: DataFrame, gen_from: int, gen_to: int) -> DataFrame:
    """The changefeed algebra over ANY CDC log with columns
    (c_custkey, c_acctbal, c_mktsegment, gen, op) — the library form
    snapshot_changes applies to the shared fixture log. Net per-key
    change over the half-open snapshot window (gen_from, gen_to]:
    elect both endpoint generations in one aggregate, fetch both
    endpoint images by (key, gen) join-back, classify. Keys whose
    latest entry precedes the window, keys with no entry at or below
    gen_to, and dead-to-dead keys emit nothing. Property-tested
    against a pure-Python reference on randomized logs
    (tests/test_r12_ops.py)."""
    latest = log.groupBy("c_custkey").agg(
        F.max(
            F.when(F.col("gen") <= gen_from, F.col("gen"))
        ).alias("gen_from"),
        F.max(
            F.when(F.col("gen") <= gen_to, F.col("gen"))
        ).alias("gen_to"),
    )
    f_img = log.select(
        "c_custkey",
        F.col("gen").alias("gen_from"),
        F.col("c_acctbal").alias("old_acctbal"),
        F.col("c_mktsegment").alias("old_mktsegment"),
        F.col("op").alias("op_from"),
    ).filter(F.col("gen_from") <= gen_from)
    t_img = log.select(
        "c_custkey",
        F.col("gen").alias("gen_to"),
        F.col("c_acctbal").alias("new_acctbal"),
        F.col("c_mktsegment").alias("new_mktsegment"),
        F.col("op").alias("op_to"),
    )
    live_from = F.col("gen_from").isNotNull() & (F.col("op_from") != "D")
    live_to = F.col("op_to") != "D"
    change = (
        F.when(~live_from, F.lit("insert"))
        .when(~live_to, F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    return (
        latest.join(f_img, ["c_custkey", "gen_from"], "left")
        .join(t_img, ["c_custkey", "gen_to"])
        .filter(
            (F.col("gen_to") > F.coalesce(F.col("gen_from"), F.lit(-1)))
            & (live_from | live_to)
        )
        .select(
            "c_custkey",
            change.alias("change_op"),
            F.when(live_from, F.col("old_acctbal")).alias("old_acctbal"),
            F.when(live_from, F.col("old_mktsegment")).alias(
                "old_mktsegment"
            ),
            F.when(live_to, F.col("new_acctbal")).alias("new_acctbal"),
            F.when(live_to, F.col("new_mktsegment")).alias(
                "new_mktsegment"
            ),
            "gen_from",
            "gen_to",
        )
    )


snapshot_changes.__doc__ = snapshot_changes.__doc__.format(
    f=_CHANGES_FROM, t=_CHANGES_TO
)


# ---------------------------------------------------------------------------
# Retraction-aware incremental view maintenance from the changefeed
# (round 12): the downstream consumer of snapshot_changes
# ---------------------------------------------------------------------------

IVM_CHANGEFEED_SQL = f"""
WITH log AS ({_SNAPSHOT_LOG_SQL}),
s2 AS (
  SELECT c_custkey, c_acctbal, c_mktsegment, op,
         ROW_NUMBER() OVER (PARTITION BY c_custkey
                            ORDER BY gen DESC) AS rn
  FROM log
  WHERE gen <= {_CHANGES_TO}
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents
FROM s2
WHERE rn = 1 AND op <> 'D'
GROUP BY 1
"""


@register(
    "ivm_maintain_changefeed",
    oracle=IVM_CHANGEFEED_SQL,
    survey=[
        "incremental-view-maintenance", "changefeed", "retraction",
        "G3-family", "incremental",
    ],
    bench=True,  # r13: promoted into headline + _SF1_SPOT (VERDICT item 5)
)
def ivm_maintain_changefeed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retraction-aware incremental view maintenance: a standing
    per-segment aggregate (customer count + exact balance cents) is
    DELTA-MAINTAINED from snapshot {f} to snapshot {t} by applying the
    net changefeed — never recomputed. `ivm_revenue_by_month` merges
    append-only partials; this handles the full CDC delta algebra:
    an update RETRACTS the old image from its (possibly different)
    segment group and inserts the new one, a delete retracts only, an
    insert adds only, and a group whose maintained count nets to zero
    leaves the view (the GROUP-delete rule). The oracle recomputes the
    snapshot-{t} state from scratch, so the hash check is the
    maintenance theorem: view(s{f}) + delta(changefeed) == view(s{t}).

    Composition: the standing view is the latest-wins aggregate at
    snapshot {f}, built with the expire ledger's no-sort shape (plain
    MAX elects the base generation per key, a keyed join-back fetches
    the image; Catalyst prunes the post-{f} union branches before
    they are scanned) — in a real deployment this side is the STORED
    materialized view, read not computed. The delta side reuses the
    snapshot_changes plan ONCE: each change row explodes row-locally
    into its retract (old image, count/cents negated) and insert (new
    image) contributions, so one segment-keyed aggregate absorbs both
    signs; a coalescing sum then merges standing + delta partials on
    the group key.

    Scale shape: at 100 TB the maintained side is view-sized (group
    cardinality, not corpus), the delta side is changefeed-sized and
    scanned exactly once, and the signed-contribution aggregate
    partial-combines map-side before the tiny group-key exchange —
    the nightly-rollup absorb pattern with deletes and group
    migrations, which the append-only IVM cannot express. COUNT and
    exact-integer SUM are self-maintainable under retraction; no sort,
    window, or object aggregate appears anywhere on the maintain
    path."""

    def cents(col):
        return F.floor(col * 100 + F.lit(0.5)).cast("bigint")

    log = _snapshot_log(spark, sf_dir)
    base = log.filter(F.col("gen") <= _CHANGES_FROM)
    elect = base.groupBy("c_custkey").agg(F.max("gen").alias("gen"))
    standing = (
        elect.join(base, ["c_custkey", "gen"])
        .filter(F.col("op") != "D")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(cents(F.col("c_acctbal"))).alias("bal_cents"),
        )
    )
    feed = snapshot_changes(spark, sf_dir)
    contrib = F.array(
        F.when(
            F.col("change_op").isin("update", "delete"),
            F.struct(
                F.col("old_mktsegment").alias("segment"),
                F.lit(-1).cast("bigint").alias("dn"),
                (-cents(F.col("old_acctbal"))).alias("dc"),
            ),
        ),
        F.when(
            F.col("change_op").isin("update", "insert"),
            F.struct(
                F.col("new_mktsegment").alias("segment"),
                F.lit(1).cast("bigint").alias("dn"),
                cents(F.col("new_acctbal")).alias("dc"),
            ),
        ),
    )
    delta = (
        feed.select(F.explode(contrib).alias("c"))
        .filter(F.col("c").isNotNull())
        .groupBy(F.col("c.segment").alias("segment"))
        .agg(
            F.sum("c.dn").alias("n_customers"),
            F.sum("c.dc").alias("bal_cents"),
        )
    )
    return (
        standing.unionAll(delta)
        .groupBy("segment")
        .agg(
            F.sum("n_customers").alias("n_customers"),
            F.sum("bal_cents").alias("bal_cents"),
        )
        .filter(F.col("n_customers") > 0)
    )


ivm_maintain_changefeed.__doc__ = ivm_maintain_changefeed.__doc__.format(
    f=_CHANGES_FROM, t=_CHANGES_TO
)


# ---------------------------------------------------------------------------
# OPTIMIZE-style compaction planning: bin-pack small files into
# target-sized rewrite tasks (round 12)
# ---------------------------------------------------------------------------

# Target rewrite-task size in manifest "bytes". The synthetic manifest
# derives one file per order (size = totalprice cents, ~1e3..5e7), so
# 1e9 packs tens of files per task at every SF while every file stays
# far below the target — the small-files regime OPTIMIZE exists for.
_COMPACT_TARGET = 1_000_000_000

COMPACTION_PLAN_SQL = f"""
WITH files AS (
  SELECT CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS part_month,
         o_orderkey AS file_id,
         CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS size_bytes
  FROM orders
),
packed AS (
  SELECT part_month, file_id, size_bytes,
         CAST(FLOOR(COALESCE(SUM(size_bytes) OVER (
                PARTITION BY part_month ORDER BY file_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
              ), 0) / {_COMPACT_TARGET}.0) AS BIGINT) AS task_id
  FROM files
)
SELECT part_month, task_id,
       CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(SUM(size_bytes) AS BIGINT) AS task_bytes,
       MIN(file_id) AS first_file,
       MAX(file_id) AS last_file,
       (COUNT(*) > 1) AS needs_compaction
FROM packed
GROUP BY 1, 2
"""


@register(
    "compaction_plan_binpack",
    oracle=COMPACTION_PLAN_SQL,
    survey=[
        "compaction-plan", "bin-packing", "small-files", "optimize",
        "manifest", "incremental",
    ],
)
def compaction_plan_binpack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE/rewrite_data_files-style compaction planning: bin-pack
    a partition's small files into target-sized rewrite tasks. The
    deterministic manifest derives one "file" per order (partition =
    order month, size = totalprice cents — every file far below the
    target, the small-files regime compaction exists for); within each
    partition, files pack in file_id order and a file's task is
    FLOOR(exclusive-prefix-sum / target) — the streaming first-fit
    approximation every SQL-planned compactor uses, which keeps each
    task a CONTIGUOUS file range at least target-full before spilling
    to the next. Emits per task the file count, byte total, covered
    file-id range, and whether the task actually compacts (>1 file).

    The metadata-plane twin of snapshot_expire: expire decides which
    VERSIONS to drop, this decides which FILES to rewrite together —
    together they are the table-maintenance loop.

    Scale shape: the plan operates on the MANIFEST (one row per file),
    which at 100 TB is metadata-sized — ~1e5-1e6 rows for million-file
    tables, orders of magnitude under the data plane. The prefix-sum
    window partitions by the table partition (bounded per-partition
    sort of file entries, the same order OPTIMIZE scans a manifest),
    the task aggregate reuses per-partition locality map-side, and
    nothing in the plan touches data-plane rows at all — the planner's
    output IS the rewrite job list."""
    month = F.to_date(F.date_trunc("month", "o_orderdate")).alias(
        "part_month"
    )
    files = load(spark, sf_dir, "orders").select(
        month,
        F.col("o_orderkey").alias("file_id"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("size_bytes"),
    )
    w = (
        Window.partitionBy("part_month")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = files.withColumn(
        "task_id",
        F.floor(
            F.coalesce(F.sum("size_bytes").over(w), F.lit(0))
            / F.lit(float(_COMPACT_TARGET))
        ),
    )
    return packed.groupBy("part_month", "task_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").alias("task_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
        (F.count(F.lit(1)) > 1).alias("needs_compaction"),
    )


# ---------------------------------------------------------------------------
# Iceberg-v2 merge-on-read: sequence-scoped equality deletes +
# positional deletes (round 12)
# ---------------------------------------------------------------------------

# Deterministic v2 layout derived from the customer table so both
# engines construct identical inputs:
#   data files   file_id = key % 8, row pos = key div 8 (unique per
#                file), data sequence 1 for files 0-3 and 2 for 4-7
#   eq-deletes   seq 2 deletes key % 7 == 0 (applies ONLY to rows with
#                data_seq < 2, Iceberg's strictly-less scoping), seq 3
#                deletes key % 13 == 0 (applies to every data row)
#   pos-deletes  (file_id, pos) for files 1 and 5 where pos % 10 == 0
#                (position-targeted, sequence-independent)
_MOR_FILES = 8

MOR_EQUALITY_DELETES_SQL = f"""
WITH data AS (
  SELECT c_custkey, c_acctbal, c_mktsegment,
         c_custkey % {_MOR_FILES} AS file_id,
         c_custkey // {_MOR_FILES} AS pos,
         CASE WHEN c_custkey % {_MOR_FILES} >= {_MOR_FILES // 2}
              THEN 2 ELSE 1 END AS data_seq
  FROM customer
),
live AS (
  SELECT * FROM data d
  WHERE NOT (d.c_custkey % 7 = 0 AND d.data_seq < 2)
    AND NOT (d.c_custkey % 13 = 0)
    AND NOT (d.file_id IN (1, 5) AND d.pos % 10 = 0)
)
SELECT c_mktsegment AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)) AS BIGINT)
         AS bal_cents,
       CAST(COUNT(DISTINCT file_id) AS BIGINT) AS n_files
FROM live
GROUP BY 1
"""


@register(
    "mor_equality_deletes_read",
    oracle=MOR_EQUALITY_DELETES_SQL,
    survey=[
        "merge-on-read", "equality-delete", "positional-delete",
        "iceberg-v2", "incremental",
    ],
)
def mor_equality_deletes_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-v2 merge-on-read: reconstruct the live table by applying
    EQUALITY-delete files (key predicates scoped to data rows whose
    data sequence is STRICTLY LESS than the delete's sequence — a
    later rewrite of the same key survives an older delete) and
    POSITIONAL-delete files ((file, pos) pairs, sequence-independent)
    to the data-file scan. This is the v2 delete mechanism proper,
    distinct from the v1 latest-wins rank snapshot_isolation_read
    models: no per-key history exists — deletes are separate small
    files the reader anti-joins at scan time. Emits the per-segment
    live aggregate plus the surviving file spread.

    The delete sets are constructed as DataFrames and applied as
    ANTI-JOINS (not inlined predicates), because that is the plan a
    real v2 reader must run: delete files arrive as data, unknown at
    planning time. The eq-delete join carries the sequence-scoping as
    a join condition; the pos-delete join keys on (file_id, pos).

    Scale shape: delete files are deltas — orders of magnitude smaller
    than the data plane — so both anti-joins BROADCAST the delete side
    and the scan never shuffles; at 100 TB this is exactly how Spark's
    Iceberg reader executes MOR (broadcast the delete file contents,
    stream the data files), with the final segment aggregate
    partial-combining map-side. cite: reference has no table-format
    layer; modeled on the public Iceberg v2 spec semantics."""
    k = F.col("c_custkey")
    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment",
        (k % _MOR_FILES).alias("file_id"),
        F.expr(f"c_custkey div {_MOR_FILES}").alias("pos"),
        F.when(k % _MOR_FILES >= _MOR_FILES // 2, F.lit(2))
        .otherwise(F.lit(1))
        .alias("data_seq"),
    )
    eq_deletes = (
        cust.filter(k % 7 == 0)
        .select("c_custkey", F.lit(2).alias("del_seq"))
        .unionAll(
            cust.filter(k % 13 == 0).select(
                "c_custkey", F.lit(3).alias("del_seq")
            )
        )
    )
    pos_deletes = cust.filter(
        F.col("file_id").isin(1, 5) & (F.col("pos") % 10 == 0)
    ).select("file_id", "pos")
    d, e = cust.alias("d"), eq_deletes.alias("e")
    live = d.join(
        F.broadcast(e),
        (F.col("d.c_custkey") == F.col("e.c_custkey"))
        & (F.col("d.data_seq") < F.col("e.del_seq")),
        "left_anti",
    ).join(F.broadcast(pos_deletes), ["file_id", "pos"], "left_anti")
    return live.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_live"),
        F.sum(
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
        ).alias("bal_cents"),
        F.countDistinct("file_id").alias("n_files"),
    )


# ---------------------------------------------------------------------------
# Iceberg-style partition evolution: one table, two partition specs,
# one pruning pass (round 12)
# ---------------------------------------------------------------------------

# Files written before the spec change (keys % 10 < 7) are partitioned
# by MONTH (spec 1); files written after are partitioned by DAY
# (spec 2). The scan predicate is a literal date range; pruning uses
# each file's own TRANSFORM bounds, so old coarse files over-select
# while new fine files prune exactly — Iceberg's contract that
# evolution never rewrites old files.
_EVO_FROM = "1995-06-01"
_EVO_TO = "1995-08-15"  # half-open [from, to)

PARTITION_EVOLUTION_SQL = f"""
WITH manifest AS (
  SELECT CASE WHEN o_orderkey % 10 < 7 THEN 1 ELSE 2 END AS spec_id,
         CASE WHEN o_orderkey % 10 < 7
              THEN CAST(DATE_TRUNC('month', o_orderdate) AS DATE)
              ELSE CAST(o_orderdate AS DATE) END AS part_value,
         CAST(o_orderdate AS DATE) AS od
  FROM orders
),
files AS (
  SELECT spec_id, part_value,
         MIN(od) AS min_date, MAX(od) AS max_date,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN od >= DATE '{_EVO_FROM}'
                        AND od <  DATE '{_EVO_TO}'
                       THEN 1 ELSE 0 END) AS BIGINT) AS rows_in_range
  FROM manifest
  GROUP BY 1, 2
)
SELECT spec_id, part_value, min_date, max_date, n_rows, rows_in_range,
       (part_value < DATE '{_EVO_TO}'
        AND (CASE WHEN spec_id = 1
                  THEN part_value + INTERVAL 1 MONTH
                  ELSE part_value + INTERVAL 1 DAY END)
            > TIMESTAMP '{_EVO_FROM} 00:00:00') AS selected
FROM files
"""


@register(
    "partition_evolution_scan",
    oracle=PARTITION_EVOLUTION_SQL,
    survey=[
        "partition-evolution", "partition-pruning", "manifest",
        "iceberg-spec", "incremental",
    ],
)
def partition_evolution_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style partition evolution: ONE table whose older files
    were written under a month-partitioned spec and whose newer files
    under a day-partitioned spec, planned in ONE pruning pass. Each
    manifest entry keeps the spec it was written under; the scan
    predicate (a literal date range) is evaluated against each file's
    own TRANSFORM bounds — [month, month+1) for spec-1 files,
    [day, day+1) for spec-2 — so coarse old files over-select
    (rows_in_range < n_rows on the range-edge months) while fine new
    files prune exactly. This is the evolution contract: changing the
    spec never rewrites old files, the planner just prunes each file
    under its own spec. Emits the full manifest with bounds, row
    counts, in-range counts, and the pruning verdict.

    Scale shape: the pruning decision is manifest-plane — a row-local
    predicate against per-file transform bounds, no join, no window;
    the single exchange is the (spec, partition-value)-keyed manifest
    aggregate (metadata-sized: one row per file), partial-combined
    map-side. At 100 TB this is the planning step every evolved table
    pays on every query, which is why it must never touch data-plane
    rows; rows_in_range here exists only to make the over-selection
    measurable in-test."""
    k = F.col("o_orderkey")
    od = F.to_date("o_orderdate")
    spec = F.when(k % 10 < 7, F.lit(1)).otherwise(F.lit(2))
    part = F.when(
        k % 10 < 7, F.to_date(F.date_trunc("month", "o_orderdate"))
    ).otherwise(od)
    files = (
        load(spark, sf_dir, "orders")
        .select(
            spec.alias("spec_id"), part.alias("part_value"), od.alias("od")
        )
        .groupBy("spec_id", "part_value")
        .agg(
            F.min("od").alias("min_date"),
            F.max("od").alias("max_date"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(
                    (F.col("od") >= F.lit(_EVO_FROM).cast("date"))
                    & (F.col("od") < F.lit(_EVO_TO).cast("date")),
                    1,
                ).otherwise(0)
            ).alias("rows_in_range"),
        )
    )
    upper = F.when(
        F.col("spec_id") == 1, F.add_months(F.col("part_value"), 1)
    ).otherwise(F.date_add(F.col("part_value"), 1))
    return files.withColumn(
        "selected",
        (F.col("part_value") < F.lit(_EVO_TO).cast("date"))
        & (upper > F.lit(_EVO_FROM).cast("date")),
    )


# ---------------------------------------------------------------------------
# Write-audit-publish gate over a staged commit (round 12)
# ---------------------------------------------------------------------------

# Audit bounds (exact-integer milli units where ratios are involved).
# The staged gen-2 batch deliberately trips two of them on the driver
# corpus (tombstone ratio ~285 milli, net row delta ~58 milli), so the
# gate demonstrably REFUSES publication — an audit that always passes
# audits nothing.
_WAP_TOMBSTONE_BOUND_MILLI = 250
_WAP_ROW_DELTA_BOUND_MILLI = 50

WAP_AUDIT_SQL = f"""
WITH log AS ({_SNAPSHOT_LOG_SQL}),
staged AS (SELECT * FROM log WHERE gen = 2),
state1 AS (
  SELECT c_custkey FROM (
    SELECT c_custkey, op,
           ROW_NUMBER() OVER (PARTITION BY c_custkey
                              ORDER BY gen DESC) AS rn
    FROM log WHERE gen <= 1
  ) WHERE rn = 1 AND op <> 'D'
),
b AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_batch,
         CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS n_keys,
         CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_del,
         CAST(SUM(CASE WHEN op = 'I' THEN 1 ELSE 0 END) AS BIGINT) AS n_ins
  FROM staged
),
o AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans
  FROM staged s
  WHERE s.op IN ('U', 'D')
    AND NOT EXISTS (SELECT 1 FROM state1 t
                    WHERE t.c_custkey = s.c_custkey)
),
st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_state FROM state1),
m AS (
  SELECT b.n_batch - b.n_keys AS dup_keys,
         CAST(FLOOR(1000.0 * b.n_del / b.n_batch) AS BIGINT)
           AS tombstone_milli,
         o.n_orphans,
         CAST(FLOOR(1000.0 * ABS(b.n_ins - b.n_del) / st.n_state)
              AS BIGINT) AS row_delta_milli
  FROM b, o, st
)
SELECT * FROM (
  SELECT 'batch_keys_unique' AS check_name,
         dup_keys AS observed, CAST(0 AS BIGINT) AS bound,
         dup_keys <= 0 AS passed
  FROM m
  UNION ALL
  SELECT 'tombstone_ratio_milli', tombstone_milli,
         CAST({_WAP_TOMBSTONE_BOUND_MILLI} AS BIGINT),
         tombstone_milli <= {_WAP_TOMBSTONE_BOUND_MILLI}
  FROM m
  UNION ALL
  SELECT 'mutation_targets_live', n_orphans, CAST(0 AS BIGINT),
         n_orphans <= 0
  FROM m
  UNION ALL
  SELECT 'row_delta_milli', row_delta_milli,
         CAST({_WAP_ROW_DELTA_BOUND_MILLI} AS BIGINT),
         row_delta_milli <= {_WAP_ROW_DELTA_BOUND_MILLI}
  FROM m
  UNION ALL
  SELECT 'publish',
         CAST((CASE WHEN dup_keys > 0 THEN 1 ELSE 0 END
             + CASE WHEN tombstone_milli > {_WAP_TOMBSTONE_BOUND_MILLI}
                    THEN 1 ELSE 0 END
             + CASE WHEN n_orphans > 0 THEN 1 ELSE 0 END
             + CASE WHEN row_delta_milli > {_WAP_ROW_DELTA_BOUND_MILLI}
                    THEN 1 ELSE 0 END) AS BIGINT),
         CAST(0 AS BIGINT),
         (dup_keys <= 0
          AND tombstone_milli <= {_WAP_TOMBSTONE_BOUND_MILLI}
          AND n_orphans <= 0
          AND row_delta_milli <= {_WAP_ROW_DELTA_BOUND_MILLI})
  FROM m
)
"""


@register(
    "wap_audit_publish",
    oracle=WAP_AUDIT_SQL,
    survey=[
        "write-audit-publish", "data-quality-gate", "staged-commit",
        "cdc-log", "incremental",
    ],
)
def wap_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-audit-publish: the staged gen-2 commit batch is AUDITED
    against the live table (snapshot-1 state) before it may publish —
    Iceberg's WAP / branch-audit pattern. Four gates: batch key
    uniqueness, tombstone ratio (share of deletes in the batch),
    mutation-target liveness (every staged update/delete must hit a
    live key — inserts are exempt), and net row delta vs the current
    table size; a fifth row is the publish verdict (count of failed
    gates, publishable only at zero). On the driver corpus the batch
    deliberately trips the tombstone and row-delta bounds, so the
    result exhibits BOTH outcomes — refusal included.

    All ratio gates are exact-integer milli units (FLOOR(1000*x/y))
    so the verdict is engine-portable; completes the maintenance
    loop: stage (merge family) -> audit (this) -> publish/rollback
    (snapshot family).

    Scale shape: the audit is two bounded aggregates over ONE pass
    each — the staged batch is delta-sized, and the state side elects
    liveness in a single key-keyed aggregate with NO image join-back
    (live iff max(gen) == max(gen | op != 'D'), since a key whose
    latest entry is a tombstone has the filtered max strictly lower),
    then folds BOTH the live count and the orphan count into one
    scalar aggregate via a broadcast marker join of the delta-sized
    mutation-key set (every batch mutation key exists in the log by
    construction, so the marker join is exact); the five verdict rows
    are a constant-width projection of the joined scalar metrics."""
    log = _snapshot_log(spark, sf_dir)
    staged = log.filter(F.col("gen") == 2)
    pre = log.filter(F.col("gen") <= 1)
    elected = pre.groupBy("c_custkey").agg(
        (
            F.max("gen")
            == F.max(F.when(F.col("op") != "D", F.col("gen")))
        ).alias("live")
    )
    mut = (
        staged.filter(F.col("op").isin("U", "D"))
        .select("c_custkey", F.lit(True).alias("is_mut"))
    )
    b = staged.agg(
        F.count(F.lit(1)).alias("n_batch"),
        F.countDistinct("c_custkey").alias("n_keys"),
        F.sum(F.when(F.col("op") == "D", 1).otherwise(0)).alias("n_del"),
        F.sum(F.when(F.col("op") == "I", 1).otherwise(0)).alias("n_ins"),
    )
    ost = (
        elected.join(F.broadcast(mut), "c_custkey", "left")
        .agg(
            F.sum(F.when(F.col("live"), 1).otherwise(0)).alias("n_state"),
            F.sum(
                F.when(
                    F.coalesce(F.col("is_mut"), F.lit(False))
                    & ~F.col("live"),
                    1,
                ).otherwise(0)
            ).alias("n_orphans"),
        )
    )
    m = b.crossJoin(ost).select(
        (F.col("n_batch") - F.col("n_keys")).alias("dup_keys"),
        F.floor(1000.0 * F.col("n_del") / F.col("n_batch"))
        .cast("bigint")
        .alias("tombstone_milli"),
        "n_orphans",
        F.floor(
            1000.0
            * F.abs(F.col("n_ins") - F.col("n_del"))
            / F.col("n_state")
        )
        .cast("bigint")
        .alias("row_delta_milli"),
    )
    tb = F.lit(_WAP_TOMBSTONE_BOUND_MILLI).cast("bigint")
    rb = F.lit(_WAP_ROW_DELTA_BOUND_MILLI).cast("bigint")
    zero = F.lit(0).cast("bigint")
    checks = F.array(
        F.struct(
            F.lit("batch_keys_unique").alias("check_name"),
            F.col("dup_keys").alias("observed"),
            zero.alias("bound"),
            (F.col("dup_keys") <= 0).alias("passed"),
        ),
        F.struct(
            F.lit("tombstone_ratio_milli").alias("check_name"),
            F.col("tombstone_milli").alias("observed"),
            tb.alias("bound"),
            (F.col("tombstone_milli") <= tb).alias("passed"),
        ),
        F.struct(
            F.lit("mutation_targets_live").alias("check_name"),
            F.col("n_orphans").alias("observed"),
            zero.alias("bound"),
            (F.col("n_orphans") <= 0).alias("passed"),
        ),
        F.struct(
            F.lit("row_delta_milli").alias("check_name"),
            F.col("row_delta_milli").alias("observed"),
            rb.alias("bound"),
            (F.col("row_delta_milli") <= rb).alias("passed"),
        ),
    )
    n_failed = (
        F.when(F.col("dup_keys") > 0, 1).otherwise(0)
        + F.when(F.col("tombstone_milli") > tb, 1).otherwise(0)
        + F.when(F.col("n_orphans") > 0, 1).otherwise(0)
        + F.when(F.col("row_delta_milli") > rb, 1).otherwise(0)
    ).cast("bigint")
    publish = F.struct(
        F.lit("publish").alias("check_name"),
        n_failed.alias("observed"),
        zero.alias("bound"),
        (n_failed == 0).alias("passed"),
    )
    return m.select(
        F.inline(F.concat(checks, F.array(publish)))
    )
