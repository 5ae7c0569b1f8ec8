"""Array-layer queries (SURVEY.md sections 2.2-2.3: P5/P7/P8, A1-A9).

The driver's tables have no ``||``-delimited columns, so these queries
*synthesize* segments-shaped inputs deterministically from existing columns
(CASE over part/orders keys) and then apply the real operators -- the same
split/normalize/cast pipeline the reference's silver job runs
(transformToSilver.py:56-90). Oracle SQL mirrors each step with DuckDB list
functions (string_split / list_transform / unnest).

Outputs are scalars derived from the arrays (sizes, folds, elements,
joined strings) so the hash-compare never depends on array encoding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.arrays import (
    int_array_sum,
    normalize_int_array,
    split_segments,
    timestamp_array,
)
from flights_etl_pipeline_spark.functions.scalar import duration_to_minutes
from flights_etl_pipeline_spark.plans.registry import load, register

# ---------------------------------------------------------------------------
# A1/A2/A4/A5/A3: split, size, element_at, array_distinct, array_join
# ---------------------------------------------------------------------------


@register(
    "part_tokens",
    oracle="""
SELECT
  p_partkey,
  LEN(string_split(p_name, ' ')) AS n_tokens,
  string_split(p_name, ' ')[1] AS first_token,
  string_split(p_name, ' ')[-1] AS last_token,
  ARRAY_TO_STRING(string_split(p_name, ' '), ',') AS tokens_csv,
  LEN(LIST_DISTINCT(LIST_CONCAT(string_split(p_name, ' '),
                                string_split(LOWER(p_type), ' ')))) AS n_distinct
FROM part
""",
    survey=["A1", "A4", "A5", "A3", "P3"],
)
def part_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenize p_name: size / element_at (1-based and -1) / distinct-merge
    -- the airline-code array idiom (updateToGold.py:31,38)."""
    part = load(spark, sf_dir, "part")
    tokens = F.split(F.col("p_name"), " ")
    type_tokens = F.split(F.lower(F.col("p_type")), " ")
    return part.select(
        "p_partkey",
        F.size(tokens).alias("n_tokens"),
        F.element_at(tokens, 1).alias("first_token"),
        F.element_at(tokens, -1).alias("last_token"),
        F.array_join(tokens, ",").alias("tokens_csv"),
        F.size(F.array_distinct(F.concat(tokens, type_tokens))).alias("n_distinct"),
    )


# ---------------------------------------------------------------------------
# P5/P7: null-safe split + string-null normalization (the silver core)
# ---------------------------------------------------------------------------

SEGMENTS_NORMALIZE_SQL = """
WITH raw AS (
  SELECT p_partkey,
         CASE WHEN p_partkey % 13 = 0 THEN NULL
              ELSE CONCAT(CAST(p_size AS VARCHAR), '||',
                          CASE WHEN p_partkey % 5 = 0 THEN 'None'
                               WHEN p_partkey % 7 = 0 THEN 'null'
                               ELSE CAST(p_size * 2 AS VARCHAR) END,
                          '||', CAST(p_partkey % 100 AS VARCHAR))
         END AS seg_raw
  FROM part
), arr AS (
  SELECT p_partkey,
         CASE WHEN seg_raw IS NULL THEN []
              ELSE LIST_TRANSFORM(
                     string_split(seg_raw, '||'),
                     x -> CASE WHEN x IS NULL OR TRIM(x) IN ('None', 'null', '')
                               THEN 0
                               ELSE COALESCE(TRY_CAST(x AS INT), 0) END)
         END AS segs
  FROM raw
)
SELECT p_partkey,
       LEN(segs) AS n_segments,
       CAST(COALESCE(LIST_SUM(segs), 0) AS BIGINT) AS seg_sum,
       LEN(LIST_FILTER(segs, x -> x = 0)) AS n_zeros
FROM arr
"""


@register(
    "segments_normalize",
    oracle=SEGMENTS_NORMALIZE_SQL,
    survey=["P5", "P7", "A8", "A4"],
)
def segments_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The silver segments pipeline: NULL column -> empty array; 'None'/'null'
    elements -> 0; fold and count zeros (transformToSilver.py:56-90)."""
    part = load(spark, sf_dir, "part")
    seg_raw = F.when(
        F.col("p_partkey") % 13 == 0, F.lit(None).cast("string")
    ).otherwise(
        F.concat_ws(
            "||",
            F.col("p_size").cast("string"),
            F.when(F.col("p_partkey") % 5 == 0, F.lit("None"))
            .when(F.col("p_partkey") % 7 == 0, F.lit("null"))
            .otherwise((F.col("p_size") * 2).cast("string")),
            (F.col("p_partkey") % 100).cast("string"),
        )
    )
    segs = normalize_int_array(split_segments(seg_raw))
    return part.select(
        "p_partkey",
        F.size(segs).alias("n_segments"),
        int_array_sum(segs).alias("seg_sum"),
        F.size(F.filter(segs, lambda x: x == 0)).alias("n_zeros"),
    )


# ---------------------------------------------------------------------------
# P8/U2: per-element timestamp cast of ||-joined ISO-8601 strings
# ---------------------------------------------------------------------------

TS_SEGMENTS_SQL = """
WITH raw AS (
  SELECT o_orderkey,
         CONCAT(STRFTIME(o_orderdate, '%Y-%m-%dT%H:%M:%SZ'), '||',
                STRFTIME(o_orderdate + INTERVAL 90 MINUTE,
                         '%Y-%m-%dT%H:%M:%SZ'),
                CASE WHEN o_orderkey % 11 = 0 THEN '||not-a-time' ELSE '' END)
           AS ts_raw
  FROM orders
), arr AS (
  SELECT o_orderkey,
         LIST_TRANSFORM(string_split(ts_raw, '||'),
                        x -> TRY_CAST(x AS TIMESTAMP)) AS tss
  FROM raw
)
SELECT o_orderkey,
       LEN(tss) AS n_elems,
       LEN(LIST_FILTER(tss, x -> x IS NULL)) AS n_bad,
       LIST_MIN(tss) AS first_ts,
       LIST_MAX(tss) AS last_ts
FROM arr
"""


@register("ts_segments", oracle=TS_SEGMENTS_SQL, survey=["P8", "U2", "A8"])
def ts_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISO-8601 'Z' strings -> array<timestamp> with malformed -> null
    (the departure/arrival time arrays, transformToSilver.py:78-80)."""
    orders = load(spark, sf_dir, "orders")
    iso = "yyyy-MM-dd'T'HH:mm:ss'Z'"
    ts_raw = F.concat(
        F.date_format("o_orderdate", iso),
        F.lit("||"),
        F.date_format(
            F.col("o_orderdate") + F.expr("INTERVAL 90 MINUTE"), iso
        ),
        F.when(F.col("o_orderkey") % 11 == 0, F.lit("||not-a-time")).otherwise(
            F.lit("")
        ),
    )
    tss = timestamp_array(F.split(ts_raw, r"\|\|"))
    return orders.select(
        "o_orderkey",
        F.size(tss).alias("n_elems"),
        F.size(F.filter(tss, lambda x: x.isNull())).alias("n_bad"),
        F.array_min(tss).alias("first_ts"),
        F.array_max(tss).alias("last_ts"),
    )


# ---------------------------------------------------------------------------
# A7: explode -> rows (the dim-build lateral view, loadToWarehouse.py:49,62)
# ---------------------------------------------------------------------------


@register(
    "token_counts",
    oracle="""
SELECT tok, COUNT(*) AS n_rows, COUNT(DISTINCT p_partkey) AS n_parts
FROM (SELECT p_partkey, UNNEST(string_split(p_name, ' ')) AS tok FROM part)
GROUP BY tok
""",
    survey=["A7", "G3"],
)
def token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode + aggregate: the dim_airline/dim_airport build shape."""
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey", F.explode(F.split("p_name", " ")).alias("tok")
        )
        .groupBy("tok")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.countDistinct("p_partkey").alias("n_parts"),
        )
    )


@register(
    "token_positions",
    oracle="""
SELECT p_partkey,
       UNNEST(string_split(p_name, ' ')) AS tok,
       UNNEST(generate_series(1, LEN(string_split(p_name, ' ')))) AS pos
FROM part
""",
    survey=["A7-pos"],
)
def token_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element with 1-based ordinal."""
    part = load(spark, sf_dir, "part")
    return part.select(
        "p_partkey", F.posexplode(F.split("p_name", " ")).alias("pos0", "tok")
    ).select("p_partkey", "tok", (F.col("pos0") + 1).alias("pos"))


# ---------------------------------------------------------------------------
# A6/P12: arrays_zip -> explode -> struct field access
# ---------------------------------------------------------------------------


@register(
    "zip_token_lengths",
    oracle="""
SELECT p_partkey,
       UNNEST(string_split(p_name, ' ')) AS tok,
       UNNEST(LIST_TRANSFORM(string_split(p_name, ' '), x -> LENGTH(x)))
         AS tok_len
FROM part
""",
    survey=["A6", "P12", "A8"],
)
def zip_token_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """arrays_zip two parallel arrays, explode, access struct fields -- the
    airline code/name pairing (loadToWarehouse.py:48-53)."""
    part = load(spark, sf_dir, "part")
    df = part.select(
        "p_partkey",
        F.split("p_name", " ").alias("toks"),
    ).select(
        "p_partkey",
        F.explode(
            F.arrays_zip(
                F.col("toks"), F.transform("toks", F.length).alias("lens")
            )
        ).alias("z"),
    )
    return df.select(
        "p_partkey",
        F.col("z.toks").alias("tok"),
        F.col("z.lens").alias("tok_len"),
    )


# ---------------------------------------------------------------------------
# U1: ISO-8601 duration parsing at scale (regexp built-ins, no UDF)
# ---------------------------------------------------------------------------

DURATION_AGG_SQL = """
WITH durs AS (
  SELECT l_returnflag,
         CASE WHEN l_discount = 0.0 THEN 'INVALID'
              WHEN l_linenumber % 3 = 0
                THEN CONCAT('PT', CAST(l_quantity AS INT), 'H')
              WHEN l_linenumber % 3 = 1
                THEN CONCAT('PT', CAST(l_quantity AS INT), 'H',
                            l_orderkey % 60, 'M')
              ELSE CONCAT('PT', l_orderkey % 60, 'M')
         END AS dur
  FROM lineitem
), parsed AS (
  SELECT l_returnflag,
         CASE WHEN regexp_matches(dur, '^PT(\\d+H)?(\\d+M)?$')
              THEN COALESCE(TRY_CAST(regexp_extract(dur,
                     '^PT(?:(\\d+)H)?(?:(\\d+)M)?$', 1) AS INT), 0) * 60
                 + COALESCE(TRY_CAST(regexp_extract(dur,
                     '^PT(?:(\\d+)H)?(?:(\\d+)M)?$', 2) AS INT), 0)
         END AS minutes
  FROM durs
)
SELECT l_returnflag,
       CAST(SUM(minutes) AS BIGINT) AS total_minutes,
       COUNT(*) - COUNT(minutes) AS n_invalid,
       COUNT(minutes) AS n_valid
FROM parsed
GROUP BY l_returnflag
"""


@register("duration_agg", oracle=DURATION_AGG_SQL, survey=["U1", "G3"])
def duration_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 (travelDuration parse, transformToSilver.py:19-28) as codegen'd
    regexp arithmetic over synthesized PT#H#M strings, incl. malformed."""
    li = load(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("int").cast("string")
    mins = (F.col("l_orderkey") % 60).cast("string")
    dur = (
        F.when(F.col("l_discount") == 0.0, F.lit("INVALID"))
        .when(F.col("l_linenumber") % 3 == 0, F.concat(F.lit("PT"), qty, F.lit("H")))
        .when(
            F.col("l_linenumber") % 3 == 1,
            F.concat(F.lit("PT"), qty, F.lit("H"), mins, F.lit("M")),
        )
        .otherwise(F.concat(F.lit("PT"), mins, F.lit("M")))
    )
    minutes = duration_to_minutes(dur)
    return (
        li.select("l_returnflag", minutes.alias("minutes"))
        .groupBy("l_returnflag")
        .agg(
            F.sum("minutes").alias("total_minutes"),
            (F.count(F.lit(1)) - F.count("minutes")).alias("n_invalid"),
            F.count("minutes").alias("n_valid"),
        )
    )
