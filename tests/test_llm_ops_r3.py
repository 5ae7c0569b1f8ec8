"""Semantic invariants for the round-3 LLM-pipeline additions.

Parity (tools/check_parity.py) pins exact values; these tests pin the
*meaning*: DSIR weights separate the target domain, the logreg scorer
is a proper probability, and the chunk scrub really removes every
corpus-wide repeat exactly once.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.test_plans import SF_DIR


def test_dsir_weights_separate_target_language(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import (
        _DSIR_TARGET_LANG,
        dsir_importance_weights,
    )
    from flights_etl_pipeline_spark.plans.registry import load

    w = dsir_importance_weights(spark, SF_DIR)
    langs = load(spark, SF_DIR, "documents").select("doc_id", "lang")
    by_lang = (
        w.join(langs, "doc_id")
        .withColumn("is_tgt", F.col("lang") == _DSIR_TARGET_LANG)
        .groupBy("is_tgt")
        .agg(
            (F.sum("weight_micro") / F.sum("n_tokens")).alias(
                "mean_lr_micro"
            )
        )
        .collect()
    )
    means = {r["is_tgt"]: r["mean_lr_micro"] for r in by_lang}
    # importance weights must rank the target slice above the rest --
    # that is the whole point of the likelihood ratio
    assert means[True] > means[False]


def test_quality_logreg_prob_is_valid_and_monotone_in_logit(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import (
        quality_logreg_score,
    )

    rows = quality_logreg_score(spark, SF_DIR).collect()
    assert all(0 <= r["prob_micro"] <= 1_000_000 for r in rows)
    # sigmoid is monotone: sort by mean logit, probs must be sorted too
    srt = sorted(
        rows, key=lambda r: (r["logit_sum_milli"] / r["n_tokens"])
    )
    probs = [r["prob_micro"] for r in srt]
    assert probs == sorted(probs)


def test_chunk_scrub_keeps_each_distinct_chunk_exactly_once(spark):
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _SCRUB_CHUNK,
        chunk_dedup_scrub,
    )
    from flights_etl_pipeline_spark.plans.registry import load

    out = chunk_dedup_scrub(spark, SF_DIR)
    totals = out.agg(
        F.sum("n_chunks").alias("n_chunks"), F.sum("n_kept").alias("n_kept")
    ).collect()[0]

    docs = load(spark, SF_DIR, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("t"))
    chunks = toks.select(
        F.explode(
            F.sequence(
                F.lit(0),
                F.ceil(F.size("t") / F.lit(float(_SCRUB_CHUNK))).cast("int")
                - 1,
            )
        ).alias("cidx"),
        "t",
    ).select(
        F.array_join(
            F.slice("t", F.col("cidx") * _SCRUB_CHUNK + 1, _SCRUB_CHUNK), " "
        ).alias("chunk")
    )
    n_total = chunks.count()
    n_distinct = chunks.distinct().count()
    # every occurrence is accounted for, and the scrub keeps exactly
    # one occurrence per distinct chunk corpus-wide
    assert totals["n_chunks"] == n_total
    assert totals["n_kept"] == n_distinct


def test_docs_quality_gate_stream_matches_batch_and_is_stateless(spark):
    from flights_etl_pipeline_spark.plans.queries_ml import (
        quality_logreg_score,
    )
    from flights_etl_pipeline_spark.streaming.jobs import (
        docs_quality_gate_stream,
    )

    out = docs_quality_gate_stream(spark, SF_DIR)
    batch = quality_logreg_score(spark, SF_DIR)
    # bit-identical to the batch gate, row for row (the streaming twin
    # recomputes the same integer-milli arithmetic from the broadcast
    # literal weights -- any drift would surface here)
    assert out.exceptAll(batch).count() == 0
    assert batch.exceptAll(out).count() == 0


def test_incremental_ingest_classifies_recrawls_and_probe_finds_edits(spark):
    from pyspark.sql import functions as F

    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _DELTA_COPY_N,
        _NEARDUP_OFFSET,
        _RECRAWL_OFFSET,
        incremental_corpus_ingest,
        incremental_neardup_probe,
    )

    ingest = incremental_corpus_ingest(spark, SF_DIR)
    # every exact re-crawl of an indexed doc must be flagged against
    # the historical index, not as new
    recrawls = ingest.filter(
        (F.col("doc_id") >= _RECRAWL_OFFSET)
        & (F.col("doc_id") < _RECRAWL_OFFSET + _DELTA_COPY_N)
    )
    assert recrawls.count() == _DELTA_COPY_N
    assert (
        recrawls.filter(F.col("status") == "dup_of_index").count()
        == _DELTA_COPY_N
    )

    probe = incremental_neardup_probe(spark, SF_DIR)
    # lightly-edited re-crawls (source doc + ' qq zz') must surface as
    # candidates paired with their own source for most docs -- LSH with
    # 4x2 bands catches a 1-shingle edit with high probability; require
    # a strong majority rather than all 50 (banding is probabilistic)
    self_hits = probe.filter(
        F.col("delta_id") - _NEARDUP_OFFSET == F.col("index_id")
    ).count()
    assert self_hits >= int(_DELTA_COPY_N * 0.8)


def test_pca_projection_captures_dominant_variance(spark):
    import statistics

    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        pca_projection,
    )
    from flights_etl_pipeline_spark.plans.registry import load

    pc1 = [r["pc1"] for r in pca_projection(spark, SF_DIR).collect()]
    var_pc1 = statistics.pvariance(pc1)
    emb = [r["embedding"] for r in load(spark, SF_DIR, "embeddings").collect()]
    dim_vars = [
        statistics.pvariance([row[i] for row in emb]) for i in range(64)
    ]
    # the top principal direction must explain at least as much variance
    # as the single best coordinate axis (it maximizes over ALL unit
    # directions; quantization costs at most a hair, hence the 0.999)
    assert var_pc1 >= max(dim_vars) * 0.999
