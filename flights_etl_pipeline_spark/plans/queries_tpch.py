"""TPC-H decision-support query shapes (SURVEY.md section 2.6 family).

The reference's analytics surface is a medallion ETL (four jobs over one
flights table); its *query semantics* — filtered joins, grouped
aggregates, existence tests — generalize to the canonical TPC-H
decision-support shapes. This module re-expresses the ones the driver's
star schema supports (no partsupp table, so Q2/Q11/Q16/Q20 are out of
scope; Q1/Q6/Q7/Q17/Q19 shapes already exist as ``pricing_summary``,
``filtered_revenue``, ``nation_trade_flows``, ``smallqty_part_revenue``,
``disjunctive_promo_revenue``) with the correlation patterns Catalyst
must decorrelate: EXISTS / NOT EXISTS semi- and anti-joins (Q4, Q21,
Q22), scalar subqueries (Q15, Q22), HAVING-subquery IN (Q18),
outer-join aggregate distributions (Q13), conditional-sum ratios
(Q8, Q12, Q14), and multi-dim profit rollups (Q5, Q9) — 18 of the 22
TPC-H queries have their shape covered between this module and the
core set.

Scale notes (100 TB): every existence test is expressed as a left-semi /
left-anti join (no decorrelation left to chance); dims (customer,
supplier, nation, region at their TPC-H ratios) are broadcast; the only
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
    filter (broadcast), date-disjoint orders/lineitem join, grouped
    revenue, global top-10.

    Scale shape: both date filters push to the parquet scans; customer
    is broadcast so the only shuffle keys on o_orderkey for the group;
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
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
            F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey")
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
    rows; every dim is broadcast (nation twice, in customer- and
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
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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
    the join input ~6×; part and supplier broadcast; one wide exchange
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
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
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
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
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
    supplier is broadcast for the name lookup. No sort anywhere."""
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
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )
