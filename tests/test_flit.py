"""flit (single-parse array literals) must be indistinguishable from
F.lit: same element types, same values, bit-for-bit — it exists only to
cut ~1000 py4j round trips per K x dim model literal to one (r12)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.vectors import flit


def _one(spark, col):
    return spark.range(1).select(col.alias("x")).collect()[0]["x"]


def _dtype(spark, col):
    return spark.range(1).select(col.alias("x")).schema["x"].dataType


@pytest.mark.parametrize(
    "vals",
    [
        [1, 2, 3],
        [0, -1, 2**31 - 1, -(2**31)],
        [2**40, -(2**40), 7],
        [1.5, -2.25, 0.0, -0.0],
        [[1.0, 2.0], [3.5, -4.5]],
        [[1, 2], [3, 4]],
        list(range(1, 65)),
    ],
)
def test_flit_matches_lit_type_and_value(spark, vals):
    got_t, ref_t = _dtype(spark, flit(vals)), _dtype(spark, F.lit(vals))
    assert got_t == ref_t
    assert _one(spark, flit(vals)) == _one(spark, F.lit(vals))


def test_flit_roundtrips_arbitrary_doubles_bit_for_bit(spark):
    rng = random.Random(12012)
    vals = [
        rng.random() * 10 ** rng.randint(-12, 12)
        * (1 if rng.random() < 0.5 else -1)
        for _ in range(200)
    ] + [5e-324, 1.7976931348623157e308, 0.1, 1 / 3]
    got = _one(spark, flit(vals))
    assert all(
        a == b and math.copysign(1, a) == math.copysign(1, b)
        for a, b in zip(got, vals)
    )


def test_flit_rejects_nonfinite_and_nonnumeric():
    with pytest.raises(ValueError):
        flit([1.0, float("nan")])
    with pytest.raises(ValueError):
        flit([float("inf")])
    with pytest.raises(TypeError):
        flit(["a"])
    with pytest.raises(TypeError):
        flit([True])


def test_flit_rejects_out_of_int64_range(spark):
    """An int beyond int64 must fail at RENDER time with a clear error,
    not later at Spark parse time with an opaque ParseException on the
    'L' suffix (ADVICE r12)."""
    with pytest.raises(ValueError):
        flit([2**63])
    with pytest.raises(ValueError):
        flit([-(2**63) - 1])
    # boundaries stay renderable and round-trip exactly
    assert _one(spark, flit([2**63 - 1, -(2**63)])) == [
        2**63 - 1,
        -(2**63),
    ]
