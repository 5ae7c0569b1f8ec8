"""Query registry: one entry per implemented operator (SURVEY.md section 2).

Each entry pairs a PySpark callable ``(spark, sf_dir) -> DataFrame`` with an
equivalent ANSI-SQL oracle string DuckDB can run over the same parquet
tables. The driver hash-compares the two at sf=0.01 (order-insensitive), so
column names/aliases MUST match on both sides; genuinely non-SQL ops set
``oracle=None`` and get a rows-only check.

Registration is decentralized: each domain module calls ``register`` at
import time; ``plans.queries`` imports them all and exposes the dict.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    survey: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    survey: tuple[str, ...] | list[str] = (),
    bench: bool = False,
) -> Callable:
    """Decorator: add a query to the registry under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(fn, oracle, tuple(survey), bench)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table (parquet scan, S3).

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS). Depending on the
    Spark build this surfaces as bigint (``nanosAsLong``) or, on Spark
    4.1+, natively as TIMESTAMP_NTZ with nanos truncated to micros — the
    same truncation DuckDB applies. Either way, normalize to a session-tz
    TIMESTAMP so ``unix_micros``/window functions work downstream; the
    NTZ→LTZ cast is instant-preserving because every session here runs
    with ``spark.sql.session.timeZone=UTC`` (asserted below) and the NTZ
    wall clock *is* the epoch-UTC rendering of the stored nanos.
    """
    df = None
    if name == "events":
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        dt = dict(df.dtypes).get("ts")
        if dt == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif dt == "timestamp_ntz":
            if spark.conf.get("spark.sql.session.timeZone") != "UTC":
                spark.conf.set("spark.sql.session.timeZone", "UTC")
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
