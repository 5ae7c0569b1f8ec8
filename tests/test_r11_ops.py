"""Round-11 operator mechanisms.

- snapshot_isolation_read: the four CDC shapes land in the right
  snapshot (update-after-update, delete-after-update,
  insert-after-delete, pass-through), and the two pinned readers see
  genuinely different states for the same key.
- ann_two_stage_rerank: the lexical cross-score actually REORDERS the
  vector pool (a lexically-identical lower-cosine candidate overtakes
  a lexically-disjoint higher-cosine one), self-matches are excluded,
  and exactly K rows emerge per query.
"""
from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F


def _write_customer(spark, tmp_path, keys):
    pdf = pd.DataFrame(
        {
            "c_custkey": keys,
            "c_acctbal": [float(100 + k) for k in keys],
            "c_mktsegment": ["BASE"] * len(keys),
        }
    )
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(
        str(tmp_path / "customer.parquet")
    )


def test_snapshot_isolation_cdc_shapes(spark, tmp_path):
    from flights_etl_pipeline_spark.plans.queries_incremental import (
        snapshot_isolation_read,
    )

    # 39 = 13*3: deleted at gen 1, RESTORED at gen 2
    # 35 = 7*5:  UPDATED at gen 1, UPDATED2 at gen 2
    # 77 = 7*11: UPDATED at gen 1, deleted at gen 2
    # 26 = 13*2: deleted at gen 1, stays deleted (not %3)
    # 1: untouched pass-through
    _write_customer(spark, tmp_path, [39, 35, 77, 26, 1])
    rows = snapshot_isolation_read(spark, str(tmp_path)).collect()
    st = {(r["snapshot_id"], r["c_custkey"]): r for r in rows}

    assert (1, 39) not in st, "deleted key must be absent at snapshot 1"
    assert st[(2, 39)]["c_mktsegment"] == "RESTORED"
    assert st[(2, 39)]["c_acctbal"] == 50.0

    assert st[(1, 35)]["c_mktsegment"] == "UPDATED"
    assert st[(1, 35)]["c_acctbal"] == 100.0 + 35 + 100.0
    assert st[(2, 35)]["c_mktsegment"] == "UPDATED2"
    assert st[(2, 35)]["c_acctbal"] == 100.0 + 35 + 200.0

    assert st[(1, 77)]["c_mktsegment"] == "UPDATED"
    assert (2, 77) not in st, "delete-after-update must drop the key"

    assert (1, 26) not in st and (2, 26) not in st

    for s in (1, 2):
        assert st[(s, 1)]["c_mktsegment"] == "BASE"
        assert st[(s, 1)]["version"] == 0 and st[(s, 1)]["last_op"] == "I"


def test_two_stage_rerank_lexical_feature_reorders(spark, tmp_path):
    from flights_etl_pipeline_spark.plans.queries_simsearch import (
        _BATCH_Q,
        _RERANK_K,
        ann_two_stage_rerank,
    )

    # 8 query vectors (vec_id < _BATCH_Q) plus two candidates crafted
    # so the vector ranking and the lexical ranking disagree for query
    # 0: candidate A (id 8) is nearly collinear with q0 but shares no
    # tokens; candidate B (id 9) is a bit farther but textually
    # identical. alpha*cos + beta*jac must put B first.
    vecs = []
    for qid in range(_BATCH_Q):
        v = [0.0] * 8
        v[qid] = 1.0
        vecs.append((qid, v, qid))
    vecs.append((8, [0.999, 0.0447, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0))
    vecs.append((9, [0.93, 0.3676, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0))
    emb = pd.DataFrame(vecs, columns=["vec_id", "embedding", "label"])
    texts = {qid: f"query text number {qid} unique tokens" for qid in
             range(_BATCH_Q)}
    texts[8] = "completely different words entirely"
    texts[9] = texts[0]
    docs = pd.DataFrame(
        {
            "doc_id": list(range(10)),
            "text": [texts[i] for i in range(10)],
            "lang": ["en"] * 10,
            "source": ["t"] * 10,
            "n_chars": [len(texts[i]) for i in range(10)],
        }
    )
    spark.createDataFrame(emb).select(
        "vec_id",
        F.col("embedding").cast("array<float>").alias("embedding"),
        F.col("label").cast("int").alias("label"),
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    spark.createDataFrame(docs).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )

    out = ann_two_stage_rerank(spark, str(tmp_path))
    rows = out.collect()
    assert all(r["qid"] != r["vec_id"] for r in rows), "self must be excluded"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    # 9 non-self candidates per query, K=5 picks each
    assert all(len(v) == _RERANK_K for v in by_q.values())

    q0 = sorted(by_q[0], key=lambda r: -r["rerank_score"])
    a = next(r for r in q0 if r["vec_id"] == 8)
    b = next(r for r in q0 if r["vec_id"] == 9)
    assert a["cosine"] > b["cosine"], "fixture: A must win on vectors alone"
    assert b["lex_jaccard"] == 1.0 and a["lex_jaccard"] == 0.0
    assert b["rerank_score"] > a["rerank_score"], (
        "the lexical cross-score must flip the order"
    )
    assert q0[0]["vec_id"] == 9
