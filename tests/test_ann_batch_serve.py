"""ann_batch_serve edge behavior: the two-pass threshold refinement
must stay EXACT when the score distribution degenerates (every row in
the k-th bucket — maximal survivor set), and the emitted top-k must
match brute force on the real fixture.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_degenerate_all_tie_scores_still_exact(spark, tmp_path):
    """50 identical embeddings: every cosine is exactly 1.0, so pass 1
    puts the entire corpus in one bucket and pass 2's survivor set is
    the whole table — the worst case for the refinement. The result
    must still be the exact top-k: ties broken by vec_id ascending,
    cosine 1.0 everywhere."""
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _BATCH_K,
        _BATCH_Q,
        ann_batch_serve,
    )

    vec = [float(j % 3) / 4 + 0.1 for j in range(64)]
    rows = [(i, vec, "dup") for i in range(50)]
    (
        spark.createDataFrame(
            rows, "vec_id LONG, embedding ARRAY<FLOAT>, label STRING"
        )
        .write.mode("overwrite")
        .parquet(str(tmp_path / "embeddings.parquet"))
    )
    out = ann_batch_serve(spark, str(tmp_path)).collect()
    assert len(out) == _BATCH_Q * _BATCH_K
    for qid in range(_BATCH_Q):
        got = sorted(
            (r["vec_id"], r["cosine"]) for r in out if r["qid"] == qid
        )
        assert got == [(v, 1.0) for v in range(_BATCH_K)], (qid, got)


def test_matches_bruteforce_on_fixture(spark):
    """Cross-check against an independently computed exact ranking on
    the real sf0.001 embeddings (same rounded-cosine formula, naive
    per-qid sort) — the two-pass plan is an optimization, never a
    semantics change."""
    from flights_etl_pipeline_spark.functions.vectors import (
        cosine_similarity,
    )
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _BATCH_K,
        _BATCH_Q,
        ann_batch_serve,
    )
    from flights_etl_pipeline_spark.plans.registry import load

    sf = "/root/testdata/sf0.001"
    got = {
        (r["qid"], r["vec_id"]): r["cosine"]
        for r in ann_batch_serve(spark, sf).collect()
    }

    emb = load(spark, sf, "embeddings")
    q = emb.filter(F.col("vec_id") < _BATCH_Q).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    cos = F.floor(
        cosine_similarity("embedding", "qv") * 100000000 + 0.5
    ) / 100000000
    scored = emb.crossJoin(q).select("qid", "vec_id", cos.alias("cosine"))
    want = {}
    for r in scored.collect():
        want.setdefault(r["qid"], []).append((-r["cosine"], r["vec_id"]))
    expect = {}
    for qid, lst in want.items():
        for c, v in sorted(lst)[:_BATCH_K]:
            expect[(qid, v)] = -c
    assert got == expect
