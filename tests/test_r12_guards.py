"""Round-12 guards: the ADVICE r11 fixes.

1. The rerank normalizer's whitespace class must treat vertical tab
   (U+000B) identically in Spark (Java regex: \\s INCLUDES \\x0B) and
   DuckDB (RE2: \\s EXCLUDES \\x0B) — the explicit _WS_CLASS is the
   fix; this test reproduces the divergence with the old idiom and
   pins agreement with the new one.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.plans.queries_simsearch import _WS_CLASS

VTAB_DOC = "alpha\x0bbeta  gamma\tdelta"


def _duck_norm(pattern: str) -> str:
    return duckdb.sql(
        "SELECT TRIM(LOWER(REGEXP_REPLACE(?, ?, ' ', 'g')))",
        params=[VTAB_DOC, pattern],
    ).fetchone()[0]


def _spark_norm(spark, pattern: str) -> str:
    return (
        spark.range(1)
        .select(
            F.trim(
                F.lower(F.regexp_replace(F.lit(VTAB_DOC), pattern, " "))
            ).alias("t")
        )
        .first()["t"]
    )


def test_vtab_divergence_exists_with_bare_whitespace_escape(spark):
    """The bug the explicit class fixes: Java \\s matches \\x0B, RE2
    \\s does not, so the bare escape tokenizes a vertical-tab document
    differently across engines. If an engine upgrade ever makes these
    agree, this test flags that _WS_CLASS is no longer load-bearing."""
    assert _spark_norm(spark, r"\s+") != _duck_norm(r"\s+")


def test_ws_class_agrees_across_engines(spark):
    got_spark = _spark_norm(spark, _WS_CLASS + "+")
    got_duck = _duck_norm(_WS_CLASS + "+")
    assert got_spark == got_duck == "alpha beta gamma delta"


def test_ws_class_covers_every_re2_and_java_s_char(spark):
    """The class must be a superset of BOTH engines' \\s on ASCII:
    space, tab, newline, vertical tab, form feed, carriage return."""
    for ch in " \t\n\x0b\f\r":
        doc = f"a{ch}b"
        spark_out = (
            spark.range(1)
            .select(
                F.regexp_replace(F.lit(doc), _WS_CLASS + "+", "_").alias("t")
            )
            .first()["t"]
        )
        duck_out = duckdb.sql(
            "SELECT REGEXP_REPLACE(?, ?, '_', 'g')",
            params=[doc, _WS_CLASS + "+"],
        ).fetchone()[0]
        assert spark_out == duck_out == "a_b", repr(ch)


def test_rerank_norm_sql_uses_the_explicit_class():
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _RERANK_NORM_SQL,
    )

    assert _WS_CLASS in _RERANK_NORM_SQL
    assert "\\s" not in _RERANK_NORM_SQL.replace(_WS_CLASS, "")


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
