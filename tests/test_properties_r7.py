"""Round-7 property tests: the cid-only fast path (`_nearest_cid`) must
agree bit-for-bit with the full two-phase argmax (`_nearest_centroid`),
and `py_decimal_dot` must be the bit-exact driver-side twin of the
column decimal fold (the claim `_probe_select`'s oracle-parity rests
on).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=6,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)

# The twin tests never touch Spark (pure Python vs an in-process DuckDB
# query), so they can afford a real search budget — r8's divergence was
# only found by luck at max_examples=6 (VERDICT r8 item 1).
_TWIN_SETTINGS = dict(_SETTINGS, max_examples=300)

_DIM = 6

_component = st.integers(-1000, 1000).map(lambda v: v / 128.0)
_vector = st.lists(_component, min_size=_DIM, max_size=_DIM).filter(
    lambda v: any(x != 0 for x in v)
)

# ADVICE r7: k/128 components make every product k1*k2/2^14 exactly
# representable at decimal scale 14, so _vector NEVER exercises the
# quantize step's rounding or tie path. Two extra families close that:
# (a) TIE vectors — odd/2^7 times odd/2^8 products are odd/2^15, whose
#     decimal expansion ends in ...5 at digit 15: an EXACT half tie at
#     the scale-14 quantize, forcing the rounding-direction decision on
#     every single element;
# (b) arbitrary finite doubles — products carry full binary precision,
#     so the quantize rounds (non-tie) on essentially every element.
_odd = st.integers(-500, 499).map(lambda v: 2 * v + 1)
_tie_vector_a = st.lists(
    _odd.map(lambda k: k / 128.0), min_size=_DIM, max_size=_DIM
)
_tie_vector_b = st.lists(
    _odd.map(lambda k: k / 256.0), min_size=_DIM, max_size=_DIM
)
_finite_vector = st.lists(
    st.floats(
        min_value=-32.0, max_value=32.0, allow_nan=False, allow_infinity=False
    ),
    min_size=_DIM,
    max_size=_DIM,
).filter(lambda v: any(x != 0 for x in v))


def _spark_decimal_norm(spark, vec):
    from flights_etl_pipeline_spark.functions.vectors import decimal_dot

    row = spark.createDataFrame([(list(vec),)], "v ARRAY<DOUBLE>").select(
        decimal_dot("v", "v").alias("n")
    ).collect()[0]
    return float(row["n"])


@settings(**_SETTINGS)
@given(
    cents=st.lists(_vector, min_size=3, max_size=5),
    embs=st.lists(_vector, min_size=1, max_size=4),
)
def test_nearest_cid_matches_full_argmax(spark, cents, embs):
    """The double-phase cid fast path returns the SAME cid as the exact
    two-phase struct argmax on every row — including hypothesis-made
    near-ties, which exercise the ambiguous `otherwise` branch."""
    from flights_etl_pipeline_spark.functions.vectors import decimal_dot
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _nearest_centroid,
        _nearest_cid,
    )

    data = [
        (cid, list(vec), _spark_decimal_norm(spark, vec))
        for cid, vec in enumerate(cents)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(embs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    ).withColumn("enorm", decimal_dot("embedding", "embedding"))
    rows = df.select(
        "vec_id",
        _nearest_centroid(data)["cid"].alias("full_cid"),
        _nearest_cid(data).alias("fast_cid"),
    ).collect()
    for r in rows:
        assert r["fast_cid"] == r["full_cid"], (cents, embs)


def _assert_twins_oracle(a, b):
    import duckdb

    from flights_etl_pipeline_spark.functions.vectors import py_decimal_dot
    from flights_etl_pipeline_spark.plans.sqlfrag import sql_decimal_dot

    def lit(v):
        # Each element as CAST('<repr>' AS DOUBLE): a bare numeric literal
        # like 9.114548806391987 is typed DECIMAL(16,15) by DuckDB's
        # parser, and its decimal->double conversion can land 1 ulp off
        # the strtod double Python holds — the string cast is correctly
        # rounded, so both engines see the IDENTICAL input doubles.
        return "[" + ", ".join(f"CAST('{x!r}' AS DOUBLE)" for x in v) + "]"

    got = py_decimal_dot(a, b)
    want = float(
        duckdb.sql(f"SELECT {sql_decimal_dot(lit(a), lit(b))} AS d").fetchone()[0]
    )
    assert got == want, (a, b, got, want)


@settings(**_TWIN_SETTINGS)
@given(a=_vector, b=_vector)
def test_py_decimal_dot_twins_oracle_fold_to_the_cast(a, b):
    """py_decimal_dot must reproduce the ORACLE's fold BIT-FOR-BIT
    (zero tolerance): r9 replaced the idealized decimal model with
    DuckDB's actual op sequence — binary-FP-scaled half-even cast in
    (vectors._duckdb_quantize14), exact int sum, and the quirky
    hugeint->double cast out (vectors._duckdb_dec14_to_double) — so
    even the final-cast wobble that r7/r8 tolerated at 1 ulp is now
    reproduced, not tolerated. k/128 grid: products exactly
    representable at scale 14, the no-rounding baseline."""
    _assert_twins_oracle(a, b)


@settings(**_TWIN_SETTINGS)
@given(a=_tie_vector_a, b=_tie_vector_b)
def test_py_decimal_dot_twins_oracle_on_exact_ties(a, b):
    """EVERY product here lands on (or, after the binary-FP scaling
    fl(p * 1e14), within one binary ulp of) an exact .5 tie at the
    scale-14 quantize (odd/2^15), pinning the rounding-direction
    decision on every element. Because py_decimal_dot now performs the
    SAME binary scaling DuckDB does, ties that the scaling perturbs
    off .5 are perturbed identically on both sides — zero tolerance."""
    _assert_twins_oracle(a, b)


@settings(**_TWIN_SETTINGS)
@given(a=_finite_vector, b=_finite_vector)
def test_py_decimal_dot_twins_oracle_on_arbitrary_doubles(a, b):
    """Full-precision doubles: the quantize step rounds on essentially
    every product. This strategy found r8's real divergence (an exact
    decimal quantize is NOT DuckDB's cast — DuckDB scales in binary FP
    first, landing 1 quantum away on ~17% of arbitrary doubles, e.g.
    a=[...,1.680607943755824,...] x b=[...,1.9,...]); the cached
    counterexample in .hypothesis/examples keeps hitting that path,
    and the r9 mimic must match it bit-for-bit."""
    _assert_twins_oracle(a, b)


@settings(**_SETTINGS)
@given(a=_vector, b=_vector)
def test_spark_fold_within_margin_of_exact(spark, a, b):
    """The in-plan Spark fold's scale-13 accumulator rounding may drift
    from the exact sum, but by no more than dim * 1e-13 — the bound the
    ANN ranking-margin arguments (and _probe_select's parity with the
    in-plan scores) rest on."""
    from flights_etl_pipeline_spark.functions.vectors import (
        decimal_dot,
        py_decimal_dot,
    )

    got = float(
        spark.createDataFrame([(a, b)], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
        .select(decimal_dot("a", "b").alias("d"))
        .collect()[0]["d"]
    )
    assert abs(got - py_decimal_dot(a, b)) <= len(a) * 1e-13, (a, b)


@settings(**_SETTINGS)
@given(a=_tie_vector_a, b=_tie_vector_b)
def test_spark_fold_margin_holds_on_exact_ties(spark, a, b):
    """Spark's double->decimal cast is an exact HALF_UP quantize, so on
    exact .5 ties its per-product decimals sit 1e-14 above the
    DuckDB-mimicking twin's (whose binary-scaled cast half-even-rounds
    them) — still inside the dim * 1e-13 drift bound every ranking
    argument uses. This pins that the tie divergence stays bounded
    (and invisible through >=1e-8 result rounding)."""
    from flights_etl_pipeline_spark.functions.vectors import (
        decimal_dot,
        py_decimal_dot,
    )

    got = float(
        spark.createDataFrame([(a, b)], "a ARRAY<DOUBLE>, b ARRAY<DOUBLE>")
        .select(decimal_dot("a", "b").alias("d"))
        .collect()[0]["d"]
    )
    assert abs(got - py_decimal_dot(a, b)) <= len(a) * 1e-13, (a, b)


def test_probe_select_matches_inplan_ranking(spark):
    """_probe_select's driver-side probe choice must equal the ranking
    the oracle computes in-SQL: exact decimal pair dots, IEEE
    sqrt/divide, (cosine DESC, cid ASC). Checked on the real sf0.001
    quantizer against a Spark-computed reference ordering."""
    from pyspark.sql import functions as F

    from flights_etl_pipeline_spark.functions.vectors import (
        cosine_from_parts,
        decimal_dot,
    )
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _centroids,
        _probe_select,
    )

    sf_dir = "/root/testdata/sf0.001"
    cents = _centroids(spark, sf_dir)
    probe_cids, qvec, qnorm = _probe_select(spark, sf_dir, cents, n_probe=len(cents))
    cdf = spark.createDataFrame(
        [(c[0], c[1], c[2]) for c in cents],
        "cid LONG, cvec ARRAY<DOUBLE>, cnorm DOUBLE",
    )
    want = [
        r["cid"]
        for r in cdf.select(
            "cid",
            cosine_from_parts(
                decimal_dot("cvec", F.lit(qvec)), "cnorm", F.lit(qnorm)
            ).alias("cs"),
        )
        .orderBy(F.col("cs").desc(), "cid")
        .collect()
    ]
    assert probe_cids == want


@settings(**_SETTINGS)
@given(
    cents=st.lists(_vector, min_size=2, max_size=4),
    embs=st.lists(_vector, min_size=1, max_size=4),
)
def test_km_assign_matches_reference_shape(spark, cents, embs):
    """_km_assign_rowlocal (two-phase row-local argmin) must agree with
    the reference formulation it replaced — crossJoin + min over
    struct(dm, cid) with the same exact micro distance — on both the
    winning cid AND the exact dm, including hypothesis-made near-ties
    that exercise the ambiguous rescore branch."""
    from pyspark.sql import functions as F

    from flights_etl_pipeline_spark.plans.queries_ml import (
        _km_assign_rowlocal,
        _km_sqdist_micro,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(embs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    data = [(cid, list(vec)) for cid, vec in enumerate(cents)]
    fast = {
        r["vec_id"]: (r["b"]["cid"], r["b"]["dm"])
        for r in df.select(
            "vec_id", _km_assign_rowlocal(data).alias("b")
        ).collect()
    }
    cdf = spark.createDataFrame(data, "cid INT, cv ARRAY<DOUBLE>")
    ref_rows = (
        df.crossJoin(F.broadcast(cdf))
        .select(
            "vec_id",
            "cid",
            _km_sqdist_micro(F.col("embedding"), F.col("cv")).alias("dm"),
        )
        .groupBy("vec_id")
        .agg(F.min(F.struct("dm", "cid")).alias("m"))
        .collect()
    )
    ref = {r["vec_id"]: (r["m"]["cid"], r["m"]["dm"]) for r in ref_rows}
    assert fast == ref, (cents, embs)


@settings(**_SETTINGS)
@given(
    cbook=st.lists(_vector, min_size=2, max_size=4),
    embs=st.lists(
        st.lists(st.integers(-1000, 1000).map(lambda v: v / 128.0),
                 min_size=2 * _DIM, max_size=2 * _DIM),
        min_size=1,
        max_size=3,
    ),
)
def test_pq_best_matches_reference_shape(spark, cbook, embs):
    """_pq_best_rowlocal must agree with the join+groupBy encode it
    replaced — broadcast codebook join, min over struct(dist, cid) with
    the exact dist = |s|^2 - 2 s.c + |c|^2 — for every subvector, on
    both the code and the exact dist."""
    from pyspark.sql import functions as F

    import flights_etl_pipeline_spark.plans.queries_simsearch as qs
    from flights_etl_pipeline_spark.functions.vectors import decimal_dot

    sub_len = _DIM  # one subvector of PQ_SUB-like length
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(embs)],
        "vec_id INT, embedding ARRAY<DOUBLE>",
    )
    # codebook for subspace m=1 (slice [sub_len+1 : 2*sub_len])
    cents_m = []
    for cid, cv in enumerate(cbook):
        n = float(
            spark.createDataFrame([(list(cv),)], "v ARRAY<DOUBLE>")
            .select(decimal_dot("v", "v").alias("n"))
            .collect()[0]["n"]
        )
        cents_m.append((cid, list(cv), n))
    orig_sub, orig_m = qs.PQ_SUB, qs.PQ_M
    qs.PQ_SUB, qs.PQ_M = sub_len, 2
    try:
        fast = {
            r["vec_id"]: (r["b"]["cid"], r["b"]["dist"])
            for r in df.select(
                "vec_id", qs._pq_best_rowlocal(cents_m, 1).alias("b")
            ).collect()
        }
    finally:
        qs.PQ_SUB, qs.PQ_M = orig_sub, orig_m
    cdf = spark.createDataFrame(
        [(c, v, n) for c, v, n in cents_m],
        "cid INT, cv ARRAY<DOUBLE>, cnorm DOUBLE",
    )
    sv = F.slice("embedding", sub_len + 1, sub_len)
    dist = (
        decimal_dot(sv, sv)
        - 2 * decimal_dot(sv, F.col("cv"))
        + F.col("cnorm")
    )
    ref_rows = (
        df.crossJoin(F.broadcast(cdf))
        .select("vec_id", "cid", dist.alias("dist"))
        .groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid")).alias("m"))
        .collect()
    )
    ref = {r["vec_id"]: (r["m"]["cid"], r["m"]["dist"]) for r in ref_rows}
    assert fast == ref, (cbook, embs)
