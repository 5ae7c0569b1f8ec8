"""Content-defined chunking (cdc_chunk_dedup): the property that
justifies the technique — boundaries depend on LOCAL content only, so
an edit re-chunks its neighborhood while every later chunk hash
survives (fixed-window chunking loses everything downstream of an
insertion).
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import functions as F


def _chunks_of(spark, texts: list[str]) -> list[set[str]]:
    """Chunk each text with the SAME expression pipeline the registered
    query uses (importing its constants so they cannot drift), returning
    the set of chunk md5s per text."""
    from flights_etl_pipeline_spark.functions.text import ROLLING_MOD
    from flights_etl_pipeline_spark.plans.queries_dedup import (
        _CDC_DIV,
        _CDC_POWS,
        _CDC_W,
    )

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id INT, text STRING"
    )
    n = F.length("text").cast("long")
    a = F.transform(F.split("text", ""), lambda c: F.ascii(c).cast("long"))
    df = df.select("id", "text", n.alias("n"), a.alias("a"))

    def whash(i):
        total = None
        for j, p in enumerate(_CDC_POWS):
            term = F.element_at("a", (i - F.lit(j)).cast("int")) * F.lit(p)
            total = term if total is None else total + term
        return total % F.lit(ROLLING_MOD)

    mid = F.when(
        F.col("n") >= _CDC_W + 1,
        F.filter(
            F.sequence(F.lit(_CDC_W).cast("long"), F.col("n") - 1),
            lambda i: whash(i) % _CDC_DIV == 0,
        ),
    ).otherwise(F.array().cast("array<long>"))
    bounds = F.concat(
        F.array(F.lit(0).cast("long")), mid, F.array(F.col("n"))
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(bounds) - 1),
        lambda k: F.substring(
            "text",
            (F.element_at(bounds, k) + 1).cast("int"),
            (F.element_at(bounds, k + 1) - F.element_at(bounds, k)).cast(
                "int"
            ),
        ),
    )
    rows = df.select("id", chunks.alias("ch")).collect()
    out = [set() for _ in texts]
    for r in rows:
        out[r["id"]] = {
            hashlib.md5(c.encode()).hexdigest() for c in r["ch"]
        }
    return out


def test_insertion_is_locally_contained(spark):
    """One char inserted near the front: CDC re-chunks only the edited
    neighborhood, so the vast majority of chunk hashes survive — while
    fixed 64-char windows lose every chunk downstream of the edit."""
    rng = random.Random(9)
    base = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz .,") for _ in range(4000)
    )
    edited = base[:97] + "X" + base[97:]

    cdc_base, cdc_edit = _chunks_of(spark, [base, edited])
    shared = len(cdc_base & cdc_edit)
    assert shared >= 0.8 * len(cdc_base), (
        f"CDC lost too much: {shared}/{len(cdc_base)} chunks survived"
    )

    def fixed(t):
        return {
            hashlib.md5(t[i : i + 64].encode()).hexdigest()
            for i in range(0, len(t), 64)
        }
    fixed_shared = len(fixed(base) & fixed(edited))
    # downstream shift kills fixed chunking: only the pre-edit prefix
    # (~2 chunks here) survives
    assert fixed_shared < 0.2 * len(fixed(base))
    assert shared > fixed_shared


def test_avg_chunk_length_tracks_divisor(spark):
    """Boundary density is ~1/_CDC_DIV of positions, so the mean chunk
    length on random text sits near _CDC_DIV (geometric distribution —
    accept a wide band, the point is order-of-magnitude correctness)."""
    from flights_etl_pipeline_spark.plans.queries_dedup import _CDC_DIV

    rng = random.Random(42)
    text = "".join(
        rng.choice("abcdefghijklmnopqrstuvwxyz0123456789 ") for _ in range(20000)
    )
    (chunks,) = _chunks_of(spark, [text])
    avg = len(text) / max(len(chunks), 1)
    assert _CDC_DIV / 3 <= avg <= _CDC_DIV * 3, avg


def test_registered_query_runs_and_is_deterministic(spark):
    from flights_etl_pipeline_spark.plans.queries_dedup import cdc_chunk_dedup

    sf = "/root/testdata/sf0.001"
    a = cdc_chunk_dedup(spark, sf).collect()
    b = cdc_chunk_dedup(spark, sf).collect()
    assert a == b
    assert len(a) > 0  # the corpus has duplicated spans to find
    assert all(r["n_occ"] > 1 for r in a)
