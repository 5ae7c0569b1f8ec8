"""Python UDTF surface (Spark 4 ``@udtf``): a table function that
explodes a ||-delimited segments string into (pos, code) rows -- the
reference's signature array semantics (transformToSilver.py:56-72)
expressed through the UDTF API. Value-pinned against the pure-builtin
posexplode(split(...)) formulation; kept as a test (not a registered
query) because builtins cover the semantics and the hot-path discipline
forbids Python where the JVM can do it.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_udtf_matches_builtin_explode(spark):
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="pos INT, code STRING")
    class SplitSegments:
        def eval(self, segments: str):
            if segments is None:
                return
            for i, code in enumerate(segments.split("||")):
                yield i, code.strip()

    rows = [
        ("ATL||JFK||LAX",),
        ("ORD",),
        (None,),
        (" SFO || SEA ",),
    ]
    df = spark.createDataFrame(rows, "segments STRING")
    df.createOrReplaceTempView("seg_rows")
    spark.udtf.register("split_segments", SplitSegments)

    got = sorted(
        (r.segments, r.pos, r.code)
        for r in spark.sql(
            "SELECT s.segments, t.pos, t.code "
            "FROM seg_rows s, LATERAL split_segments(s.segments) t"
        ).collect()
    )
    expected = sorted(
        (r.segments, r.pos, r.code)
        for r in df.select(
            "segments",
            F.posexplode(
                F.transform(
                    F.split("segments", r"\|\|"), lambda c: F.trim(c)
                )
            ).alias("pos", "code"),
        ).collect()
    )
    assert got == expected
    assert len(got) == 6  # 3 + 1 + 0 + 2
