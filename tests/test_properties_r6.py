"""Property checks for the round-6 row-local centroid assignment:
_nearest_centroid vs a pure-Python model over hypothesis-generated
vectors. The model mirrors the SEMANTICS (argmax cosine, ties to the
lowest cid) with exact Fraction arithmetic on the squared comparison,
so any Spark-side drift in the argmax fold, the struct tie-break, or
the literal packing shows up as a cid mismatch.
"""

from __future__ import annotations

from fractions import Fraction

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

_DIM = 6

# float32-representable magnitudes, no NaN/inf, bounded away from the
# all-zero vector (a zero norm makes cosine undefined in any engine)
_component = st.integers(-1000, 1000).map(lambda v: v / 128.0)
_vector = st.lists(_component, min_size=_DIM, max_size=_DIM).filter(
    lambda v: any(x != 0 for x in v)
)


def _model_nearest(emb: list[float], cents: list[list[float]]) -> int:
    """Exact argmax of cos(emb, c) with lowest-cid tie-break, done in
    Fractions: compare cos_i > cos_j via dot_i^2 * n_j > dot_j^2 * n_i
    (sign-aware), which is exact for rational inputs."""

    def dot(a, b):
        return sum(Fraction(x) * Fraction(y) for x, y in zip(a, b))

    def better(i, j):
        di, dj = dot(emb, cents[i]), dot(emb, cents[j])
        ni, nj = dot(cents[i], cents[i]), dot(cents[j], cents[j])
        # cos_i ? cos_j  <=>  di/sqrt(ni) ? dj/sqrt(nj), norms > 0
        if (di >= 0) != (dj >= 0):
            return di > dj
        gt = di * di * nj > dj * dj * ni
        lt = di * di * nj < dj * dj * ni
        if di >= 0:
            return gt
        return lt

    best = 0
    for c in range(1, len(cents)):
        if better(c, best):
            best = c
    return best


@settings(**_SETTINGS)
@given(
    st.lists(_vector, min_size=3, max_size=3),
    st.lists(_vector, min_size=4, max_size=10),
)
def test_nearest_centroid_matches_exact_model(spark, cents, embs):
    from flights_etl_pipeline_spark.functions.vectors import decimal_dot
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _nearest_centroid,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(embs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    ).withColumn("enorm", decimal_dot("embedding", "embedding"))
    data = [
        (cid, list(vec), _exact_norm_double(spark, vec))
        for cid, vec in enumerate(cents)
    ]
    got = {
        r["vec_id"]: r["cid"]
        for r in df.select(
            "vec_id", _nearest_centroid(data)["cid"].alias("cid")
        ).collect()
    }
    for i, emb in enumerate(embs):
        want = _model_nearest(emb, cents)
        # the model is exact; Spark works in doubles, so only assert on
        # examples where the two best cosines are distinguishable well
        # above double precision (ambiguous near-ties are legal either
        # way and the oracle computes them identically to Spark anyway)
        if _margin(emb, cents, want) > 1e-9:
            assert got[i] == want, (emb, cents)


def _exact_norm_double(spark, vec: list[float]) -> float:
    """cnorm exactly as _centroids ships it: Spark's own decimal fold."""
    from flights_etl_pipeline_spark.functions.vectors import decimal_dot

    row = spark.createDataFrame(
        [(list(vec),)], "v ARRAY<DOUBLE>"
    ).select(decimal_dot("v", "v").alias("n")).collect()[0]
    return float(row["n"])


def _margin(emb, cents, best_idx) -> float:
    import math

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    scores = sorted((cos(emb, c) for c in cents), reverse=True)
    return scores[0] - scores[1] if len(scores) > 1 else 1.0
