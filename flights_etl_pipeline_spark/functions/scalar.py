"""Scalar expression helpers.

U1/U2 (the reference's only two UDFs, transformToSilver.py:19-34) are
implemented as native column expressions -- regexp_extract and a timestamp
cast -- because row-at-a-time Python UDFs are the slow path at 100 TB
(JVM->Python pipe per row). A ``pandas_udf`` variant of U1 is kept to cover
the vectorized-UDF API surface and as an A/B benchmark subject.

``dsum``/``davg`` make double aggregation *bit-deterministic* across
engines and partition orderings: summing IEEE doubles is order-sensitive,
so a Spark shuffle and a DuckDB scan can disagree in the last ulp. Casting
each row to an exact DECIMAL first makes the sum associative (exact decimal
arithmetic), so any execution order -- and any engine -- produces the
identical value. This is also the right call at scale: money sums over 1e12
rows accumulate real float error; decimal partial aggregates do not.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-independent SUM of a double column, exact to ``scale`` digits.

    Rows are cast to DECIMAL(18, scale), summed exactly, and the total
    cast back to double. Deterministic under any partitioning.

    Cross-engine contract (pinned live in tests/test_properties_r9.py):
    bit-identical to ``sqlfrag.sql_dsum`` PROVIDED the input doubles are
    quantized at or below ``scale`` (the money/cents columns this repo
    feeds it — asserted against the shipped fixtures). The engines'
    double->decimal casts differ mechanically (Spark: exact HALF_UP
    quantize; DuckDB: binary-FP scaling then half-even — the same
    taxonomy as functions.vectors.py_decimal_dot), so on ARBITRARY
    doubles each element may land one quantum apart; quantized inputs
    sit ~half a quantum from every boundary, where both casts agree.
    Do not point dsum at unquantized doubles in an oracle-compared
    channel without margins above n * 10^-scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4) -> Column:
    """Order-independent AVG of a double column.

    Exact decimal sum divided by the non-null count; the single final
    division is one deterministic IEEE op, so the result is reproducible
    bit-for-bit across engines and shuffles.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)


def dround(col: Column | str, scale: int = 2) -> Column:
    """Engine-portable rounding of a positive double: floor(x*10^s + 0.5).

    Spark's ``round()`` routes doubles through their shortest *decimal
    string* (so 4.7249999...964, printed "4.725", rounds UP to 4.73) while
    DuckDB rounds the binary value (4.72). This helper is the identical
    IEEE op sequence in both engines -- use it, with its SQL twin
    ``sqlfrag.sql_dround``, for every rounded double the oracle compares.
    """
    c = F.col(col) if isinstance(col, str) else col
    p = 10**scale
    return F.floor(c * p + F.lit(0.5)) / p


# --- U1: ISO-8601 duration (PT#H#M) -> total minutes -----------------------

_DURATION_RE = re.compile(r"^PT(?:(\d+)H)?(?:(\d+)M)?$")


def duration_to_minutes(col: Column | str) -> Column:
    """ISO-8601 ``PT#H#M`` duration -> integer minutes; null on no match.

    Native rebuild of the reference's ``duration_to_minutes`` Python UDF
    (transformToSilver.py:19-28): hours*60 + minutes, null for strings that
    do not match ``PT(\\d+H)?(\\d+M)?``. Pure regexp_extract arithmetic, so
    it stays inside whole-stage codegen.
    """
    c = F.col(col) if isinstance(col, str) else col
    matches = c.rlike(r"^PT(\d+H)?(\d+M)?$")
    # try_cast: no-match groups extract as '' and ANSI mode (default in
    # Spark 4) makes a plain cast throw on them
    hours = F.coalesce(
        F.regexp_extract(c, r"^PT(?:(\d+)H)?(?:(\d+)M)?$", 1).try_cast("int"),
        F.lit(0),
    )
    mins = F.coalesce(
        F.regexp_extract(c, r"^PT(?:(\d+)H)?(?:(\d+)M)?$", 2).try_cast("int"),
        F.lit(0),
    )
    return F.when(matches & c.isNotNull(), hours * 60 + mins).cast("int")


@F.pandas_udf(T.IntegerType())
def duration_to_minutes_pandas_udf(s: pd.Series) -> pd.Series:
    """Vectorized (Arrow-batched) variant of U1, kept for the UDF surface.

    Semantics identical to :func:`duration_to_minutes`; used in tests to
    assert built-in/UDF agreement and in the benchmark as the slow-path
    comparison point.
    """

    def parse(v: object) -> object:
        if not isinstance(v, str):
            return None
        m = _DURATION_RE.match(v)
        if not m:
            return None
        return int(m.group(1) or 0) * 60 + int(m.group(2) or 0)

    return s.map(parse).astype("Int64")


# --- U2: ISO-8601 string (with Z / offset) -> timestamp ---------------------


def iso_to_timestamp(col: Column | str) -> Column:
    """ISO-8601 string (``2022-04-17T13:30:00Z`` or ``...-04:00``) -> UTC ts.

    The reference intended a Python ``fromisoformat`` UDF
    (transformToSilver.py:30-34, defect D3); its own validated notebook uses
    the builtin cast (load_to_datawarehouse.ipynb cell 2). Spark 3's
    timestamp cast handles both ``Z`` and numeric offsets natively.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("timestamp")  # null (not ANSI error) on malformed
