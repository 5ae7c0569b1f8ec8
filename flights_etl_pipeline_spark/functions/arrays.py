"""Array/collection column functions -- the reference's signature feature.

The reference's silver layer turns ``||``-delimited multi-leg "segments"
strings into typed arrays (transformToSilver.py:56-90): null-safe split
(P5), string-encoded-null normalization to int 0 (P7), per-element
timestamp cast (P8). All three are higher-order built-ins here
(``F.transform`` etc.), so they run inside whole-stage codegen -- no Python
round-trip, which is what makes them viable over 100 TB of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SEGMENT_DELIM = r"\|\|"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def split_segments(col: Column | str, delim: str = SEGMENT_DELIM) -> Column:
    """P5: null-safe split. NULL input -> empty array (not NULL), matching
    ``when(col.isNull(), array()).otherwise(split(col, '\\|\\|'))``
    (transformToSilver.py:56-72)."""
    c = _c(col)
    return F.when(c.isNull(), F.array().cast("array<string>")).otherwise(
        F.split(c, delim)
    )


def normalize_int_array(col: Column | str) -> Column:
    """P7: per-element string-null normalization -> int.

    Elements that are NULL, ``'None'``, ``'null'`` (the pandas-to-text
    artifacts the reference scrubs, transformToSilver.py:83-90), or
    non-numeric become 0; everything else casts to int.
    """
    return F.transform(
        _c(col),
        lambda x: F.when(
            x.isNull() | F.trim(x).isin("None", "null", ""), F.lit(0)
        ).otherwise(F.coalesce(x.try_cast("int"), F.lit(0))),
    )


def timestamp_array(col: Column | str) -> Column:
    """P8/U2: per-element ISO-8601 (``Z`` or offset) -> timestamp array;
    malformed elements -> null (transformToSilver.py:78-80, defect D3
    resolved to the builtin cast)."""
    return F.transform(_c(col), lambda x: x.try_cast("timestamp"))


def int_array_sum(col: Column | str) -> Column:
    """Exact integer fold of an array<int>; empty array -> 0."""
    return F.aggregate(_c(col), F.lit(0).cast("long"), lambda acc, x: acc + x)
