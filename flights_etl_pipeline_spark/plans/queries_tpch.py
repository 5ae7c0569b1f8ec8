"""TPC-H decision-support query shapes (SURVEY.md section 2.6 family).

The reference's analytics surface is a medallion ETL (four jobs over one
flights table); its *query semantics* — filtered joins, grouped
aggregates, existence tests — generalize to the canonical TPC-H
decision-support shapes. This module re-expresses all of them
(Q1/Q6/Q7/Q17/Q19 shapes already exist as ``pricing_summary``,
``filtered_revenue``, ``nation_trade_flows``, ``smallqty_part_revenue``,
``disjunctive_promo_revenue``) with the correlation patterns Catalyst
must decorrelate: EXISTS / NOT EXISTS semi- and anti-joins (Q4, Q21,
Q22), scalar subqueries (Q11, Q15, Q22), correlated MIN (Q2),
HAVING-subquery IN (Q18), outer-join aggregate distributions (Q13),
conditional-sum ratios (Q8, Q12, Q14), multi-dim profit rollups
(Q5, Q9), and nested semi-join chains (Q20) — all 22 TPC-H queries
have their shape covered between this module and the core set. The
schema ships no partsupp table, but lineitem carries (l_partkey,
l_suppkey), so Q2/Q11/Q16/Q20 run over the derived part-supplier
relation (distinct observed pairs with per-pair cost/quantity
aggregates standing in for ps_supplycost / ps_availqty).

Scale notes (100 TB): every existence test is expressed as a left-semi /
left-anti join (no decorrelation left to chance). Only genuinely
bounded tables carry an explicit broadcast hint (nation, region, 1-row
scalar aggregates); SF-linear dims (customer, supplier, part and their
filtered derivatives) carry NO hint — AQE's size check broadcasts them
at bench scale and falls back to a shuffled join past the 8 GB limit,
which a forced hint would override into a job failure. The only
wide shuffles key on l_orderkey / o_orderkey / o_custkey, which are
uniform. Top-k outputs go through TakeOrderedAndProject (no global
sort). Q21's double self-reference scans lineitem twice but both sides
reduce to distinct (orderkey, suppkey) pairs *before* the non-equi
semi/anti conditions, so the join inputs are order-sized, not
line-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flights_etl_pipeline_spark.functions.scalar import davg, dsum
from flights_etl_pipeline_spark.plans.registry import load, register
from flights_etl_pipeline_spark.plans.sqlfrag import sql_davg as _sql_davg
from flights_etl_pipeline_spark.plans.sqlfrag import sql_dsum as _sql_dsum

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_col() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# Q3: shipping priority — segment filter, date-split join, top-10 revenue
# ---------------------------------------------------------------------------


@register(
    "q3_shipping_priority",
    oracle=f"""
SELECT o.o_orderkey,
       {_sql_dsum(_REV, 4)} AS revenue,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_orderpriority
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND CAST(o.o_orderdate AS DATE) < DATE '1998-07-01'
  AND CAST(l.l_shipdate AS DATE) > DATE '1998-07-01'
GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
ORDER BY revenue DESC, o.o_orderkey
LIMIT 10
""",
    survey=["tpch-q3", "topk", "join", "G3"],
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: unshipped-revenue shipping priority. Customer segment
    filter (AQE-broadcast at bench scale), date-disjoint orders/lineitem
    join, grouped
    revenue, global top-10.

    Scale shape: both date filters push to the parquet scans; customer
    joins without a hint (AQE broadcasts it at bench scale, shuffles at
    100 TB) so the wide shuffle keys on o_orderkey for the group;
    the final top-10 is TakeOrderedAndProject (per-partition heaps +
    driver merge), never a full sort."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.to_date("o_orderdate") < F.lit("1998-07-01")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.to_date("l_shipdate") > F.lit("1998-07-01")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_orderpriority",
        )
        .agg(dsum(_rev_col(), 4).alias("revenue"))
        .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "o_orderkey")
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4: order priority checking — EXISTS decorrelated to a left-semi join
# ---------------------------------------------------------------------------


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'
  )
GROUP BY o_orderpriority
""",
    survey=["tpch-q4", "exists", "semi-join"],
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: orders in a window that have at least one returned
    line, counted per priority. The correlated EXISTS is expressed
    directly as a left-semi join (the decorrelation Catalyst would have
    to find), so no per-order subquery ever executes.

    (Q4's original predicate is l_commitdate < l_receiptdate; the
    driver's lineitem carries neither, so the existence predicate is
    l_returnflag = 'R' — same shape, same selectivity class.)

    Scale shape: the date filter pushes to the orders scan; the semi
    join shuffles only (l_orderkey) pairs after a distinct-free semi
    (semi join needs no dedup — first match wins); the final agg is a
    5-group hash agg with map-side combine."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    returned = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        orders.join(
            returned, F.col("o_orderkey") == F.col("l_orderkey"), "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q5: local supplier volume — 6-table join with a cross-table key equality
# ---------------------------------------------------------------------------


@register(
    "q5_local_supplier_volume",
    oracle=f"""
SELECT n.n_name, {_sql_dsum(_REV, 4)} AS revenue
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE s.s_nationkey = c.c_nationkey
  AND r.r_name = 'ASIA'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
GROUP BY n.n_name
""",
    survey=["tpch-q5", "multi-join", "broadcast", "G3"],
    bench=True,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: revenue by nation where the supplier and the customer
    share a nation, restricted to one region and one year.

    Scale shape: at TPC-H ratios supplier (SF*10k), nation and region
    are broadcast; customer (SF*150k) is broadcast at bench scale and
    becomes a shuffled hash join at 100 TB — the plan keys that join on
    o_custkey which is uniform. The cross-table equality
    (s_nationkey = c_nationkey) rides as a post-join filter on
    broadcast rows, never a shuffle key, so no skew surface. The only
    wide exchange is lineitem→orders on l_orderkey."""
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_rev_col(), 4).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Q10: returned-item reporting — top-20 customers by returned revenue
# ---------------------------------------------------------------------------


@register(
    "q10_returned_items",
    oracle=f"""
SELECT c.c_custkey, c.c_name,
       {_sql_dsum(_REV, 4)} AS revenue,
       c.c_acctbal, n.n_name
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE l.l_returnflag = 'R'
  AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
  AND CAST(o.o_orderdate AS DATE) < DATE '1996-07-01'
GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
ORDER BY revenue DESC, c.c_custkey
LIMIT 20
""",
    survey=["tpch-q10", "topk", "join", "G3"],
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: customers who returned the most revenue in a
    two-quarter window.

    Scale shape: returnflag + date filters push to the scans; the
    group keys on c_custkey (uniform); nation broadcast; top-20 via
    TakeOrderedAndProject."""
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").filter(
        (F.to_date("o_orderdate") >= F.lit("1996-01-01"))
        & (F.to_date("o_orderdate") < F.lit("1996-07-01"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_rev_col(), 4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Q13: customer order-count distribution — outer join under an ON-filter
# ---------------------------------------------------------------------------


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT OUTER JOIN orders o
    ON c.c_custkey = o.o_custkey
   AND o.o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY c.c_custkey
)
GROUP BY c_count
""",
    survey=["tpch-q13", "outer-join", "distribution"],
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: how many customers placed 0, 1, 2, ... qualifying
    orders. The filter lives in the join's ON clause (not WHERE), so
    customers with only disqualified orders still appear with count 0 —
    the semantic trap Q13 exists to test.

    Scale shape: the filter is applied to orders *before* the join
    (equivalent to the ON-clause placement for a left join, and
    pushable); the outer join and first agg share the custkey
    partitioning so AQE coalesces to one exchange; the second agg is a
    tiny distribution (≤ max order count groups)."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    qual = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        cust.join(qual, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# ---------------------------------------------------------------------------
# Q18: large-volume customers — HAVING-subquery IN as a semi join
# ---------------------------------------------------------------------------

_Q18_QTY = 250


@register(
    "q18_large_volume_customers",
    oracle=f"""
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS DATE) AS o_orderdate,
       o.o_totalprice,
       SUM(l.l_quantity) AS sum_qty
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey
  HAVING SUM(l_quantity) > {_Q18_QTY}
)
GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
         CAST(o.o_orderdate AS DATE), o.o_totalprice
""",
    survey=["tpch-q18", "having-subquery", "semi-join"],
    bench=True,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: orders whose total quantity exceeds a threshold, with
    their customer. The IN-subquery over a grouped HAVING is computed
    once as an aggregate and semi-joined — and because the outer query
    re-aggregates the same table on the same key, the plan *reuses* the
    per-order quantity aggregate for both roles instead of scanning
    lineitem twice.

    Scale shape: one lineitem scan → per-orderkey partial+final agg →
    filter (the HAVING) → join to orders on orderkey → broadcast
    customer. sum_qty is a sum of small integral doubles, exact in IEEE
    on both engines."""
    li = load(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sum_qty")
    )
    big = per_order.filter(F.col("sum_qty") > _Q18_QTY)
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
    )


# ---------------------------------------------------------------------------
# Q21: suppliers who kept orders waiting — EXISTS + NOT EXISTS on self
# ---------------------------------------------------------------------------


@register(
    "q21_single_return_supplier",
    oracle="""
WITH pairs AS (
  SELECT DISTINCT l1.l_orderkey, l1.l_suppkey
  FROM lineitem l1
  JOIN orders o ON o.o_orderkey = l1.l_orderkey
  WHERE o.o_orderstatus = 'F'
    AND l1.l_returnflag = 'R'
    AND EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = l1.l_orderkey
        AND l2.l_suppkey <> l1.l_suppkey
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l3
      WHERE l3.l_orderkey = l1.l_orderkey
        AND l3.l_suppkey <> l1.l_suppkey
        AND l3.l_returnflag = 'R'
    )
)
SELECT s.s_name, COUNT(*) AS numwait
FROM pairs p
JOIN supplier s ON s.s_suppkey = p.l_suppkey
GROUP BY s.s_name
""",
    survey=["tpch-q21", "exists", "not-exists", "anti-join", "semi-join"],
    bench=True,
)
def q21_single_return_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21: per supplier, the finalized multi-supplier orders
    where that supplier's lines were the *only* returned ones — EXISTS
    (another supplier participated) plus NOT EXISTS (another supplier
    also returned), both correlated on the outer row's orderkey AND
    suppkey.

    (Q21's original lateness predicate uses l_receiptdate >
    l_commitdate; the driver's lineitem carries neither, so
    l_returnflag = 'R' stands in — identical correlation structure.)

    Scale shape: both correlated subqueries DECORRELATE TO COUNTS —
    "another supplier participated" is per-order supplier count >= 2,
    "no other supplier returned" is per-order returning-supplier count
    = 1 — so the whole double-EXISTS collapses into one aggregation
    chain: lineitem → per-(orderkey, suppkey) has_r flag (one shuffle,
    keyed on orderkey) → per-order counts via a window over the SAME
    orderkey partitioning (no second exchange) → filter. No self-join
    exists in the plan at all, which beats the literal semi+anti form
    that ships order-sized pair sets through two more shuffles.
    Orders('F') rides as a semi join (no payload), supplier broadcasts
    for the name lookup, and the final agg has one group per supplier."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    ord_f = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    per_pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(
            F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
        ).alias("has_r")
    )
    w = Window.partitionBy("l_orderkey")
    qualified = (
        per_pair.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_r_supp", F.sum("has_r").over(w))
        .filter(
            (F.col("has_r") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_r_supp") == 1)
        )
        .join(ord_f, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        qualified.join(
            supp, F.col("l_suppkey") == F.col("s_suppkey")
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


# ---------------------------------------------------------------------------
# Q22: global sales opportunity — scalar subquery + NOT EXISTS anti join
# ---------------------------------------------------------------------------

_Q22_SEGMENTS = ("AUTOMOBILE", "HOUSEHOLD", "BUILDING")
_Q22_SEG_SQL = ", ".join(f"'{s}'" for s in _Q22_SEGMENTS)


@register(
    "q22_idle_customers",
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS numcust,
       {_sql_dsum('c.c_acctbal')} AS totacctbal
FROM customer c
WHERE c.c_mktsegment IN ({_Q22_SEG_SQL})
  AND c.c_acctbal > (
    SELECT {_sql_davg('c2.c_acctbal')}
    FROM customer c2
    WHERE c2.c_acctbal > 0.0
      AND c2.c_mktsegment IN ({_Q22_SEG_SQL})
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND CAST(o.o_orderdate AS DATE) >= DATE '2000-01-01'
  )
GROUP BY c.c_mktsegment
""",
    survey=["tpch-q22", "scalar-subquery", "not-exists", "anti-join"],
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: well-funded customers (balance above the positive-
    balance average of their segment class) who never ordered — a
    scalar aggregate subquery gating a NOT EXISTS anti join.

    (Q22 classes customers by phone country code; the driver's customer
    has no phone, so c_mktsegment plays the class column. And because
    every synthetic customer has at least one order, "never ordered"
    is scoped to the trailing window from 2000-01-01 — the anti join
    gains a pushed-down date filter, same shape.)

    Scale shape: the scalar average is a one-row aggregate broadcast
    into the filter (a broadcast nested-loop join over a single row —
    constant cost); the NOT EXISTS is a left-anti join keyed on
    c_custkey against only orders' custkey column; the final agg has
    one group per segment. The average uses the exact decimal
    davg so the filter boundary is bit-identical across engines."""
    seg = list(_Q22_SEGMENTS)
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment").isin(seg)
    )
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("avg_bal")
    )
    orders_keys = (
        load(spark, sf_dir, "orders")
        .filter(F.to_date("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            orders_keys, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
        )
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


# ---------------------------------------------------------------------------
# Q8: national market share — conditional-sum ratio over a 6-table join
# ---------------------------------------------------------------------------

from flights_etl_pipeline_spark.functions.scalar import dround  # noqa: E402
from flights_etl_pipeline_spark.plans.sqlfrag import (  # noqa: E402
    sql_dround as _sql_dround,
)

_Q8_SUPP_NATION = "NATION_7"  # an ASIA nation (regionkey 2)
_Q8_RATIO = (
    f"CAST(SUM(CASE WHEN sn.n_name = '{_Q8_SUPP_NATION}' "
    f"THEN CAST({_REV} AS DECIMAL(18,4)) "
    f"ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / "
    f"CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE)"
)


@register(
    "q8_market_share",
    oracle=f"""
SELECT YEAR(o.o_orderdate) AS order_year,
       {_sql_dround(_Q8_RATIO, 6)} AS mkt_share
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation cn ON c.c_nationkey = cn.n_nationkey
JOIN region r ON cn.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE r.r_name = 'ASIA'
GROUP BY YEAR(o.o_orderdate)
""",
    survey=["tpch-q8", "conditional-agg", "ratio", "multi-join"],
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: one supplier nation's share of the revenue ASIA-region
    customers generated, per order year — a conditional-sum / total-sum
    ratio computed in one grouped pass (no self-join, no second scan).

    Scale shape: numerator and denominator are two branches of the same
    decimal hash aggregate, so the ratio costs one agg over the joined
    rows; nation is broadcast twice (in customer- and
    supplier-role); the only wide exchange is lineitem→orders on
    l_orderkey. The final division is one IEEE double op on exact
    decimal sums — bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    rev_dec = _rev_col().cast("decimal(18,4)")
    cn = nation.select("n_nationkey", "n_regionkey")
    sn = nation.select(
        F.col("n_nationkey").alias("sn_nationkey"),
        F.col("n_name").alias("sn_name"),
    )
    num = F.sum(
        F.when(F.col("sn_name") == _Q8_SUPP_NATION, rev_dec).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    den = F.sum(rev_dec).cast("double")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_nationkey"))
        .groupBy(F.year("o_orderdate").alias("order_year"))
        .agg(dround(num / den, 6).alias("mkt_share"))
    )


# ---------------------------------------------------------------------------
# Q9: product-type profit — profit decomposition by supplier nation / year
# ---------------------------------------------------------------------------


@register(
    "q9_profit_by_nation_year",
    oracle=f"""
SELECT sn.n_name AS nation_name,
       YEAR(o.o_orderdate) AS order_year,
       CAST(SUM(CAST({_REV} AS DECIMAL(18,4))
              - CAST(p.p_retailprice * l.l_quantity AS DECIMAL(18,4)))
            AS DOUBLE) AS profit
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation sn ON s.s_nationkey = sn.n_nationkey
WHERE p.p_type = 'PROMO'
GROUP BY sn.n_name, YEAR(o.o_orderdate)
""",
    survey=["tpch-q9", "multi-join", "profit", "G3"],
)
def q9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9: per supplier-nation, per year, the profit on one
    product line — revenue minus cost, where the driver's schema has no
    partsupp so p_retailprice * quantity stands in for
    ps_supplycost * quantity (same arithmetic shape).

    Scale shape: the p_type filter pushes to the part scan and prunes
    the join input ~6×; part and supplier join unhinted; one wide exchange
    (lineitem→orders on l_orderkey), then a small (nation × year) hash
    agg. Both product terms are IEEE doubles cast to exact decimal
    before the subtraction and sum, so totals are order-independent."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey", "p_retailprice")
    )
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev_col().cast("decimal(18,4)") - (
        F.col("p_retailprice") * F.col("l_quantity")
    ).cast("decimal(18,4)")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation_name"),
            F.year("o_orderdate").alias("order_year"),
        )
        .agg(F.sum(amount).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# Q12: shipping-mode priority classes — CASE-WHEN counts inside one agg
# ---------------------------------------------------------------------------

_Q12_HIGH = ("1-URGENT", "2-HIGH")
_Q12_HIGH_SQL = ", ".join(f"'{p}'" for p in _Q12_HIGH)


@register(
    "q12_priority_classes",
    oracle=f"""
SELECT l.l_returnflag,
       CAST(SUM(CASE WHEN o.o_orderpriority IN ({_Q12_HIGH_SQL})
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ({_Q12_HIGH_SQL})
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders o
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE l.l_returnflag IN ('A', 'N')
  AND CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
GROUP BY l.l_returnflag
""",
    survey=["tpch-q12", "conditional-agg", "join"],
)
def q12_priority_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12: lines shipped in a year, classed by returnflag (the
    schema's stand-in for l_shipmode, which the driver's lineitem does
    not carry), counting high- vs low-priority orders in one pass —
    the canonical CASE-WHEN-inside-SUM conditional aggregation.

    Scale shape: returnflag + shipdate filters push to the lineitem
    scan; the join keys on orderkey (uniform); both counters share one
    hash agg with map-side combine; 2 output rows."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag").isin(list(("A", "N"))))
        .filter(
            (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
            & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    is_high = F.col("o_orderpriority").isin(list(_Q12_HIGH))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q14: promotion effect — single-row conditional-sum percentage
# ---------------------------------------------------------------------------

_Q14_RATIO = (
    f"100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO' "
    f"THEN CAST({_REV} AS DECIMAL(18,4)) "
    f"ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) / "
    f"CAST(SUM(CAST({_REV} AS DECIMAL(18,4))) AS DOUBLE)"
)


@register(
    "q14_promo_effect",
    oracle=f"""
SELECT {_sql_dround(_Q14_RATIO, 4)} AS promo_revenue_pct,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-03-01'
  AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
""",
    survey=["tpch-q14", "conditional-agg", "ratio"],
)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: the percentage of one month's revenue that came from
    promotional parts — a global (ungrouped) conditional-sum ratio.

    Scale shape: the shipdate filter pushes to the lineitem scan and
    prunes ~98% of rows before the broadcast part join; the global agg
    is a partial+final reduce to a single row (no exchange wider than
    one row per task)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-03-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_dec = _rev_col().cast("decimal(18,4)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", rev_dec).otherwise(
            F.lit(0).cast("decimal(18,4)")
        )
    ).cast("double")
    total = F.sum(rev_dec).cast("double")
    return (
        li.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            dround(F.lit(100.0) * promo / total, 4).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Q15: top supplier — derived view + scalar-subquery max equality
# ---------------------------------------------------------------------------


@register(
    "q15_top_supplier",
    oracle=f"""
WITH revenue AS (
  SELECT l.l_suppkey AS supplier_no,
         {_sql_dsum(_REV, 4)} AS total_revenue
  FROM lineitem l
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) < DATE '1996-04-01'
  GROUP BY l.l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s
JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
""",
    survey=["tpch-q15", "scalar-subquery", "derived-view", "topk"],
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the quarter's top revenue supplier(s) — a derived
    revenue view referenced twice: once as the join input and once
    inside a scalar MAX subquery, with an equality filter between them
    (ties all surface, which is why this is not ORDER BY ... LIMIT 1).
    The equality is safe across engines because total_revenue is an
    exact decimal sum rendered to double — bit-identical on both sides.

    Scale shape: the view computes once (suppkey-keyed partial+final
    agg over the date-pruned scan) and AQE reuses the exchange for both
    references; the 1-row MAX broadcasts back as a nested-loop filter;
    supplier joins unhinted (AQE broadcasts at bench scale). No sort
    anywhere."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1996-04-01"))
    )
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(_rev_col(), 4).alias("total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(supp, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# ---------------------------------------------------------------------------
# Derived part-supplier relation: the star schema ships no partsupp
# table, but lineitem carries (l_partkey, l_suppkey), so the relation
# TPC-H Q2/Q11/Q16/Q20 aggregate over is derivable as the distinct
# part-supplier pairs observed in sales — with per-pair cost/quantity
# aggregates standing in for ps_supplycost / ps_availqty. This closes
# the four shapes the module header previously scoped out: all 22
# TPC-H query shapes are now covered.
# ---------------------------------------------------------------------------


_Q2_SIZE = 15
_Q2_REGION = "EUROPE"


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH ps AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         ({_sql_dsum('l_extendedprice', 4)}
          / {_sql_dsum('l_quantity', 2)}) AS ps_supplycost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = '{_Q2_REGION}'
),
costed AS (
  SELECT ps.ps_partkey, ps.ps_supplycost,
         eu.s_name, eu.s_acctbal, eu.n_name
  FROM ps JOIN eu ON ps.ps_suppkey = eu.s_suppkey
),
mins AS (
  SELECT ps_partkey, MIN(ps_supplycost) AS min_cost
  FROM costed GROUP BY ps_partkey
)
SELECT c.s_acctbal, c.s_name, c.n_name, p.p_partkey, p.p_name,
       c.ps_supplycost AS supply_cost
FROM costed c
JOIN mins m
  ON c.ps_partkey = m.ps_partkey AND c.ps_supplycost = m.min_cost
JOIN part p ON c.ps_partkey = p.p_partkey
WHERE p.p_size = {_Q2_SIZE}
ORDER BY c.s_acctbal DESC, c.n_name, c.s_name, p.p_partkey
LIMIT 100
""",
    survey=["tpch-q2", "correlated-min", "derived-partsupp", "topk"],
    bench=True,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2: for each part of one size, the minimum-cost supplier
    in one region — the correlated-MIN-subquery shape, decorrelated to
    a per-part MIN aggregate joined back on (part, cost) equality.
    ps_supplycost is derived as the supplier's quantity-weighted unit
    price for the part: two exact decimal sums and ONE final double
    division (no per-row double→decimal rounding, whose half-way ties
    Spark rounds HALF_UP and DuckDB half-even), so the equality
    join-back is bit-stable within and across engines. Ties (two
    suppliers at the same min cost) all surface, as in canonical Q2.

    Scale shape: the per-part MIN only matters for the size-filtered
    parts, so the part filter applies BEFORE the derived
    partsupp aggregate — the (partkey, suppkey) agg runs over the
    ~1-in-50 surviving lineitem rows, not the full table (pinned in
    tests/test_tpch_plans.py: the scan-side join precedes the agg).
    The agg itself is map-side-combinable with uniform keys; the
    region-filtered supplier dim joins unhinted (AQE-broadcast at bench
    scale); the per-part MIN
    is a second, narrower agg on partkey joined back
    partkey-to-partkey (no skew: parts have bounded supplier fan-in).
    The top-100 goes through TakeOrderedAndProject, never a global
    sort."""
    part = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") == _Q2_SIZE)
        .select("p_partkey", "p_name")
    )
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        (dsum("l_extendedprice", 4) / dsum("l_quantity", 2)).alias(
            "ps_supplycost"
        )
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q2_REGION
    )
    eu = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costed = ps.join(
        eu, F.col("ps_suppkey") == F.col("s_suppkey")
    ).select("ps_partkey", "ps_supplycost", "s_name", "s_acctbal", "n_name")
    mins = costed.groupBy("ps_partkey").agg(
        F.min("ps_supplycost").alias("min_cost")
    )
    mins = mins.withColumnRenamed("ps_partkey", "m_partkey")
    return (
        costed.join(
            mins,
            (F.col("ps_partkey") == F.col("m_partkey"))
            & (F.col("ps_supplycost") == F.col("min_cost")),
        )
        .join(part, F.col("ps_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("ps_supplycost").alias("supply_cost"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


_Q11_NATION = "NATION_3"
_Q11_FRACTION_DENOM = 2000  # value > total / 2000, compared in exact decimal


@register(
    "q11_important_parts",
    oracle=f"""
WITH natl AS (
  SELECT l.l_partkey, CAST(l.l_extendedprice AS DECIMAL(18,2)) AS v
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = '{_Q11_NATION}'
),
grouped AS (
  SELECT l_partkey AS ps_partkey, SUM(v) AS value_dec
  FROM natl GROUP BY l_partkey
),
total AS (SELECT SUM(v) AS total_dec FROM natl)
SELECT ps_partkey, CAST(value_dec AS DOUBLE) AS part_value
FROM grouped, total
WHERE value_dec * {_Q11_FRACTION_DENOM} > total_dec
""",
    survey=["tpch-q11", "scalar-subquery", "having-threshold"],
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11: parts whose sales value through one nation's
    suppliers exceeds a fixed fraction of that nation's total — the
    HAVING-against-global-scalar-subquery shape. The threshold compare
    runs entirely in exact decimal (value * 2000 > total), so no
    engine-float edge can flip a row.

    Scale shape: the nation filter broadcasts into lineitem (4-of-100
    suppliers at these ratios), then ONE partkey-keyed decimal agg;
    the global total is a 1-row re-aggregate of the grouped partials
    broadcast back as a nested-loop filter — the sanctioned scalar
    channel, same as q15's MAX. Nothing driver-side, no second scan
    of lineitem."""
    nation = load(spark, sf_dir, "nation").filter(
        F.col("n_name") == _Q11_NATION
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey")
    )
    natl = (
        load(spark, sf_dir, "lineitem")
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "l_partkey",
            F.col("l_extendedprice").cast("decimal(18,2)").alias("v"),
        )
    )
    grouped = natl.groupBy(F.col("l_partkey").alias("ps_partkey")).agg(
        F.sum("v").alias("value_dec")
    )
    total = grouped.agg(F.sum("value_dec").alias("total_dec"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.lit(_Q11_FRACTION_DENOM)
            > F.col("total_dec")
        )
        .select(
            "ps_partkey", F.col("value_dec").cast("double").alias("part_value")
        )
    )


_Q16_EXCL_BRAND = "Brand#45"
_Q16_EXCL_TYPE_PREFIX = "MEDIUM%"
_Q16_SIZES = (1, 4, 9, 14, 19, 23, 36, 45)


@register(
    "q16_part_supplier_counts",
    oracle=f"""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
excl AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
FROM ps
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_brand <> '{_Q16_EXCL_BRAND}'
  AND p.p_type NOT LIKE '{_Q16_EXCL_TYPE_PREFIX}'
  AND p.p_size IN {_Q16_SIZES}
  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM excl)
GROUP BY p.p_brand, p.p_type, p.p_size
""",
    survey=["tpch-q16", "anti-join", "count-distinct", "derived-partsupp"],
)
def q16_part_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16: how many distinct suppliers can supply each
    (brand, type, size) bucket, excluding flagged suppliers — the
    NOT-IN-subquery shape expressed as a left-anti join (safe: suppkey
    is non-null on both sides). Negative account balance stands in for
    the canonical complaint-comment flag (schema has no s_comment).

    Scale shape: the derived partsupp is DISTINCT (partkey, suppkey) —
    one exchange keyed on both columns with partial dedup map-side;
    the flagged-supplier exclusion and the part attribute filter both
    broadcast. COUNT(DISTINCT suppkey) per attribute bucket re-keys
    on the low-cardinality (brand, type, size) — Spark plans it as a
    two-phase expand+agg, no single hot reducer because the distinct
    pre-aggregates per bucket-and-supplier first."""
    ps = (
        load(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .distinct()
    )
    excl = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != _Q16_EXCL_BRAND)
        & (~F.col("p_type").like(_Q16_EXCL_TYPE_PREFIX))
        & (F.col("p_size").isin(*_Q16_SIZES))
    )
    return (
        ps.join(
            excl,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


_Q20_NAME_PREFIX = "small%"
_Q20_REGION = "EUROPE"


@register(
    "q20_excess_share_suppliers",
    oracle=f"""
WITH sp AS (
  SELECT p_partkey FROM part WHERE p_name LIKE '{_Q20_NAME_PREFIX}'
),
q AS (
  SELECT l.l_partkey, l.l_suppkey,
         SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem l
  JOIN sp ON l.l_partkey = sp.p_partkey
  WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-01-01'
    AND CAST(l.l_shipdate AS DATE) < DATE '1997-01-01'
  GROUP BY l.l_partkey, l.l_suppkey
),
tot AS (
  SELECT l_partkey AS t_partkey, SUM(qty) AS part_qty,
         COUNT(*) AS n_supp
  FROM q GROUP BY l_partkey
),
qual AS (
  SELECT DISTINCT q.l_suppkey
  FROM q JOIN tot ON q.l_partkey = tot.t_partkey
  WHERE q.qty * tot.n_supp * 2 > tot.part_qty * 3
)
SELECT s.s_suppkey, s.s_name, s.s_acctbal
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = '{_Q20_REGION}'
  AND s.s_suppkey IN (SELECT l_suppkey FROM qual)
""",
    survey=["tpch-q20", "nested-semi-join", "derived-partsupp"],
)
def q20_excess_share_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20: region suppliers holding an outsized share of a part
    family's flow — the nested semi-join chain (name-filtered parts →
    per-(part, supplier) quantity → threshold vs the part's average →
    semi-join into supplier). ps_availqty is not derivable from sales,
    so the canonical ``availqty > 0.5 * demand`` becomes ``supplier's
    year quantity > 1.5x the part's per-supplier average`` — the
    compare runs as cross-multiplied exact decimals/longs (qty *
    n_supp * 2 > part_qty * 3), so no float edge.

    Scale shape: the part-family filter broadcasts into the
    date-pruned lineitem scan; ONE (partkey, suppkey)-keyed decimal
    agg whose exchange feeds both the per-part totals and the
    join-back — AQE reuses it (ReusedExchange, pinned in
    tests/test_tpch_plans.py) instead of re-scanning lineitem; the
    qualifying suppkey set is DISTINCT-ed (bounded by supplier
    cardinality) and drives a left-semi join into supplier, dims
    broadcast."""
    sp = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_name").like(_Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        (F.to_date("l_shipdate") >= F.lit("1996-01-01"))
        & (F.to_date("l_shipdate") < F.lit("1997-01-01"))
    )
    q = (
        li.join(sp, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    tot = q.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty").alias("part_qty"), F.count("*").alias("n_supp")
    )
    qual = (
        q.join(tot, F.col("l_partkey") == F.col("t_partkey"))
        .filter(
            F.col("qty") * F.col("n_supp") * F.lit(2)
            > F.col("part_qty") * F.lit(3)
        )
        .select("l_suppkey")
        .distinct()
    )
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(
        F.col("r_name") == _Q20_REGION
    )
    return (
        load(spark, sf_dir, "supplier")
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal")
    )


# ---------------------------------------------------------------------------
# Supplier fulfillment SLA (round 10)
# ---------------------------------------------------------------------------

_SLA_LATE_DAYS = 90

SLA_SQL = f"""
WITH j AS (
  SELECT l.l_suppkey AS suppkey,
         DATE_DIFF('day', o.o_orderdate, l.l_shipdate) AS lead_days,
         l.l_orderkey, l.l_linenumber
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
),
r AS (
  SELECT suppkey, lead_days,
         ROW_NUMBER() OVER (PARTITION BY suppkey
           ORDER BY lead_days, l_orderkey, l_linenumber) AS rn,
         COUNT(*) OVER (PARTITION BY suppkey) AS n
  FROM j
)
SELECT suppkey, CAST(MAX(n) AS BIGINT) AS n_lines,
       CAST(SUM(CASE WHEN lead_days > {_SLA_LATE_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_late,
       FLOOR(CAST(SUM(CASE WHEN lead_days > {_SLA_LATE_DAYS}
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / MAX(n) * 1000000 + 0.5) / 1000000 AS late_rate,
       0.5 * CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN lead_days END)
                  + MAX(CASE WHEN rn = n // 2 + 1 THEN lead_days END)
                  AS DOUBLE) AS p50_lead_days,
       MAX(CASE WHEN rn = CAST(FLOOR(0.9 * (n - 1)) AS BIGINT) + 1
                THEN lead_days END) AS p90_lead_days
FROM r GROUP BY suppkey
"""


@register(
    "supplier_fulfillment_sla",
    oracle=SLA_SQL,
    survey=["sla", "lead-time", "supplier-scorecard", "rank-pick"],
)
def supplier_fulfillment_sla(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier fulfillment scorecard: per supplier, order->ship lead
    time p50/p90 (rank-picked) and the share of line items shipped
    more than {late} days after the order -- the SLA table a
    procurement dashboard keys on (q21 finds the single-supplier late
    ORDERS; this profiles every supplier's latency distribution).

    Determinism: lead times are exact day integers; median is the
    two-middle-rank average, p90 a single rank-pick at
    floor(0.9*(n-1))+1 with the full (lead, orderkey, linenumber)
    tie-break -- no engine percentile interpolation.

    Scale shape: one fact-fact join on the orderkey (AQE picks the
    strategy; both sides prune to three columns); the quantile windows
    partition by SUPPLIER (key-partitioned, never global); one
    map-combinable final rollup per supplier."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    j = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("l_suppkey").alias("suppkey"),
        F.datediff("l_shipdate", "o_orderdate").alias("lead_days"),
        "l_orderkey",
        "l_linenumber",
    )
    wr = Window.partitionBy("suppkey").orderBy(
        "lead_days", "l_orderkey", "l_linenumber"
    )
    wn = Window.partitionBy("suppkey")
    r = j.select(
        "suppkey",
        "lead_days",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    late = F.sum(
        F.when(F.col("lead_days") > _SLA_LATE_DAYS, 1).otherwise(0)
    )
    p50 = 0.5 * (
        F.max(
            F.when(
                F.col("rn") == F.floor((F.col("n") + 1) / 2),
                F.col("lead_days"),
            )
        )
        + F.max(
            F.when(
                F.col("rn") == F.floor(F.col("n") / 2) + 1,
                F.col("lead_days"),
            )
        )
    )
    p90 = F.max(
        F.when(
            F.col("rn")
            == F.floor(0.9 * (F.col("n") - 1)).cast("bigint") + 1,
            F.col("lead_days"),
        )
    )
    return r.groupBy("suppkey").agg(
        F.max("n").cast("bigint").alias("n_lines"),
        late.cast("bigint").alias("n_late"),
        dround(late.cast("double") / F.max("n"), 6).alias("late_rate"),
        p50.alias("p50_lead_days"),
        p90.alias("p90_lead_days"),
    )


supplier_fulfillment_sla.__doc__ = supplier_fulfillment_sla.__doc__.format(
    late=_SLA_LATE_DAYS
)
