"""bpe_learn_merges vs a pure-Python reference BPE trainer.

The query has no SQL oracle (iterative argmax loop), so this test IS its
correctness gate: an independent dict-based implementation of the same
algorithm on the same corpus must produce the identical merge table.
"""

from __future__ import annotations

import collections
import re

import duckdb

SF_DIR = "/root/testdata/sf0.001"


def _reference_merges(texts: list[str], n_merges: int):
    freqs = collections.Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower()):
            if w:
                freqs[w] += 1
    words = {w: tuple(w) for w in freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        pair_freq = collections.Counter()
        for w, syms in words.items():
            f = freqs[w]
            for a, b in zip(syms, syms[1:]):
                pair_freq[(a, b)] += f
        if not pair_freq:
            break
        # max frequency, ties broken lexicographically on (a, b)
        (a, b), pf = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, pf))
        fused = a + b
        new_words = {}
        for w, syms in words.items():
            out = []
            for s in syms:
                if out and out[-1] == a and s == b:
                    out[-1] = fused
                else:
                    out.append(s)
            new_words[w] = tuple(out)
        words = new_words
    return merges


def test_bpe_merges_match_reference(spark):
    from flights_etl_pipeline_spark.plans.queries_text import (
        _BPE_N_MERGES,
        bpe_learn_merges,
    )

    texts = [
        r[0]
        for r in duckdb.sql(
            f"SELECT text FROM '{SF_DIR}/documents.parquet'"
        ).fetchall()
    ]
    expected = _reference_merges(texts, _BPE_N_MERGES)
    got = [
        (r.merge_rank, r.left, r.right, r.pair_freq)
        for r in bpe_learn_merges(spark, SF_DIR).collect()
    ]
    assert got == expected
    assert len(got) == _BPE_N_MERGES  # corpus is big enough to learn all


def test_bpe_merge_rewrite_handles_overlaps(spark):
    """Left-to-right fuse on a run of identical symbols: 'aaaa' with the
    pair (a,a) must become [aa, aa], not [aa, a, a] or [aaa, a]."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(["a", "a", "a", "a"],)], "syms ARRAY<STRING>")
    la, lb, fused = F.lit("a"), F.lit("a"), F.lit("aa")
    out = df.select(
        F.aggregate(
            "syms",
            F.expr("CAST(array() AS ARRAY<STRING>)"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.try_element_at(acc, F.lit(-1)) == la)
                & (s == lb),
                F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(fused)),
            ).otherwise(F.concat(acc, F.array(s))),
        ).alias("syms")
    ).first()
    assert out.syms == ["aa", "aa"]
