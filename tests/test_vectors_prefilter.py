"""Two-phase lossless pair filtering (functions.vectors.double_dot):
the cheap double-precision cosine may only PRUNE, never decide — its
deviation from the exact decimal cosine must sit orders of magnitude
inside the 1e-3 prefilter margin, or semantic_dedup /
embedding_neardup could drop a pair the exact threshold admits.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR

# prefilter margin used at the call sites (threshold 0.99, gate 0.989)
_MARGIN = 1e-3
# the double fold's error is ~dim ulps; give it six orders of headroom
_ERROR_BUDGET = _MARGIN / 1e6


def test_double_cos_error_far_inside_prefilter_margin(spark):
    """Max |double_cos - exact_cos| over every (row, query) pair of the
    real fixture must be below a millionth of the prefilter margin."""
    from flights_etl_pipeline_spark.functions.vectors import (
        cosine_from_parts,
        decimal_dot,
        double_cos,
    )
    from flights_etl_pipeline_spark.plans.registry import load

    emb = load(spark, SF_DIR, "embeddings")
    q = (
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("embedding").alias("qv"))
        .select("qv", decimal_dot("qv", "qv").alias("qnorm"))
    )
    rows = emb.select(
        "vec_id", "embedding", decimal_dot("embedding", "embedding").alias("enorm")
    ).crossJoin(F.broadcast(q))
    exact = cosine_from_parts(
        decimal_dot("embedding", "qv"), "enorm", "qnorm"
    )
    fast = double_cos("embedding", "qv", "enorm", "qnorm")
    (worst,) = (
        rows.select(F.abs(exact - fast).alias("err"))
        .agg(F.max("err"))
        .collect()[0]
    )
    assert worst < _ERROR_BUDGET, (
        f"double-cos deviation {worst} eats into the {_MARGIN} prefilter "
        "margin — the two-phase check is no longer lossless"
    )


def test_prefilter_sites_use_the_documented_margin():
    """The call sites must gate at (threshold - margin): a tightened
    gate silently turns the lossless prune into a lossy one."""
    import inspect

    from flights_etl_pipeline_spark.plans import queries_simsearch as qs

    for fn in (qs.semantic_dedup, qs.embedding_neardup):
        src = inspect.getsource(fn)
        assert "fast > 0.989" in src and "> 0.99" in src, fn.__name__
