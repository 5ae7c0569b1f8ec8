"""Multimodal queries: typed-metadata rollups, mapInPandas feature
extraction, and frame sampling over opaque binary payloads.

The payloads/metadata are synthesized deterministically from the
documents table (functions.multimodal.with_blob), so the JVM-side
metadata path and the frame-sampling arithmetic are fully
oracle-checkable; the byte-statistics feature extractor (crc32 etc.) is
not SQL-expressible and registers as a rows-only check, with its own
pytest verifying values against a pure-Python model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    FRAME_SCHEMA,
    blob_features,
    sample_frames,
    with_blob,
)
from flights_etl_pipeline_spark.plans.registry import load, register

_MEDIA_CASE = (
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)


@register(
    "multimodal_meta",
    oracle=f"""
SELECT {_MEDIA_CASE} AS media_type,
       COUNT(*) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(CASE WHEN doc_id % 3 = 0
                     THEN (doc_id % 640 + 64) * (doc_id % 480 + 48) END)
            AS BIGINT) AS total_pixels,
       CAST(SUM(CASE WHEN doc_id % 3 <> 0 THEN 1000 + (doc_id % 50) * 200 END)
            AS BIGINT) AS total_duration_ms
FROM documents
GROUP BY 1
""",
    survey=["multimodal", "G3"],
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed-metadata rollup by media type — all JVM-side column work over
    the opaque payload table; the binary column itself is never touched."""
    blobs = with_blob(load(spark, sf_dir, "documents"))
    m = F.col("meta")
    return (
        blobs.groupBy(m["media_type"].alias("media_type"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(m["byte_len"]).alias("total_bytes"),
            F.sum((m["width"] * m["height"]).cast("long")).alias("total_pixels"),
            F.sum(m["duration_ms"]).alias("total_duration_ms"),
        )
    )


@register(
    "multimodal_features",
    oracle=None,  # crc32 / byte stats are not SQL-expressible; see
    # tests/test_multimodal.py for the value-level verification
    survey=["multimodal", "mapInPandas"],
    bench=True,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-statistics extraction (the deterministic fake
    decoder) via mapInPandas — the real-codec path would swap the batch
    function body, not the plumbing."""
    blobs = with_blob(load(spark, sf_dir, "documents"))
    return blobs.mapInPandas(blob_features, schema=FEATURE_SCHEMA)


@register(
    "video_frames",
    oracle="""
SELECT doc_id,
       CAST(f AS INT) AS frame_idx,
       f * 1000 // 24 AS ts_ms
FROM (
  SELECT doc_id,
         unnest(range(0, (1000 + (doc_id % 50) * 200) * 24 // 1000, 10)) AS f
  FROM documents
  WHERE doc_id % 3 = 2
)
""",
    survey=["multimodal", "mapInPandas"],
)
def video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling for video rows: every 10th frame index + exact
    integer timestamp, fanned out by mapInPandas (batch in, more rows
    out) — the seek plan a real demuxer would execute."""
    blobs = with_blob(load(spark, sf_dir, "documents"))
    videos = blobs.filter(F.col("meta")["media_type"] == "video").select(
        "doc_id", F.col("meta")["duration_ms"].alias("duration_ms")
    )
    return videos.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
