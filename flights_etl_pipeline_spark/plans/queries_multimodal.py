"""Multimodal queries: typed-metadata rollups, mapInPandas feature
extraction, and frame sampling over opaque binary payloads.

The payloads/metadata are synthesized deterministically from the
documents table (functions.multimodal.with_blob), so every query here —
including the byte-statistics feature extractor — is hash-checkable:
the byte stats mirror into DuckDB via hex(encode(text)) and the one
non-SQL feature (crc32) rides a bound-contract boolean recomputed
JVM-side, with raw values additionally pytest-verified against a
pure-Python model (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flights_etl_pipeline_spark.functions.multimodal import (
    FEATURE_SCHEMA,
    VAD_FRAME,
    VAD_THRESHOLD,
    FRAME_SCHEMA,
    blob_features_checked,
    decode_wav_features,
    sample_frames,
    wav_payloads,
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
    oracle=f"""
WITH b AS (
  SELECT doc_id,
         hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents
)
SELECT doc_id,
       {_MEDIA_CASE} AS media_type,
       CAST(n AS BIGINT) AS byte_len,
       CAST(CASE WHEN n = 0 THEN -1
                 ELSE CAST('0x' || substring(h, 1, 2) AS INT) END
            AS INT) AS first_byte,
       CASE WHEN n = 0 THEN 0.0
            ELSE list_sum(list_transform(
                   range(1, n + 1),
                   i -> CAST('0x' || substring(h, 2 * i - 1, 2) AS INT)
                 )) / n END AS mean_byte,
       TRUE AS crc_ok
FROM b
""",
    survey=["multimodal", "mapInPandas"],
    bench=True,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched byte-statistics extraction (the deterministic fake
    decoder) via mapInPandas — the real-codec path would swap the batch
    function body, not the plumbing.

    Bound-contract oracle (VERDICT r7 item 3, the
    ``price_percentiles_approx`` pattern): byte_len / first_byte /
    mean_byte are integer-exact functions of the payload bytes that
    DuckDB re-derives from ``hex(encode(text))``, so they hash-compare
    directly; the crc32 feature has no DuckDB builtin, so the plan
    recomputes it JVM-side (``F.crc32`` on the payload, before the
    Python stage) and emits ``crc_ok`` — computed from data, asserted
    constant-TRUE by the oracle, so a broken Python checksum (or a
    payload mangled in the Arrow hop) flips the hash. The raw crc32
    values stay value-tested in tests/test_multimodal.py.

    Scale shape: unchanged — one Arrow-batched row-local stage, no
    shuffle; the extra F.crc32 column rides the same scan projection.
    """
    blobs = with_blob(load(spark, sf_dir, "documents")).withColumn(
        "jvm_crc32", F.crc32("payload")
    )
    feats = blobs.mapInPandas(
        blob_features_checked, schema=FEATURE_SCHEMA + ", jvm_crc32 LONG"
    )
    return feats.select(
        "doc_id",
        "media_type",
        "byte_len",
        "first_byte",
        "mean_byte",
        (F.col("crc32") == F.col("jvm_crc32")).alias("crc_ok"),
    )


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


@register(
    "audio_decode_stats",
    oracle="""
WITH audio AS (
  SELECT doc_id, 160 + doc_id % 320 AS n
  FROM documents WHERE doc_id % 3 = 1
),
s AS (
  SELECT a.doc_id, a.n,
         ABS(((a.doc_id * 31 + t.i * 7) % 65536) - 32768) AS amp
  FROM audio a JOIN range(0, 480) t(i) ON t.i < a.n
)
SELECT doc_id,
       16000 AS sample_rate,
       CAST(MAX(n) AS INT) AS n_samples,
       CAST(SUM(amp) AS BIGINT) AS sum_abs,
       CAST(MAX(amp) AS INT) AS max_abs
FROM s
GROUP BY doc_id
""",
    survey=["multimodal", "audio-decode", "mapInPandas"],
)
def audio_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode path, end to end on actual container bytes:
    audio rows get a spec-conforming RIFF/WAVE PCM16 payload
    (mapInPandas ingest stage), then a dependency-free WAV chunk parser
    decodes header + samples and computes integer-exact amplitude
    features from the DECODED waveform (second mapInPandas stage). The
    oracle re-derives every sample arithmetically in SQL, so a parser
    bug (wrong offset, wrong endianness, wrong chunk walk) fails the
    hash -- unlike the byte-statistics stand-in, nothing here short-
    circuits the container format.

    Scale shape: both stages are Arrow-batched and row-local (no
    shuffle at all); the real-codec swap (librosa/ffmpeg) changes only
    the parse_wav body. At 100 TB payload columns stream through
    executors batch-by-batch with spill-free constant memory."""
    audio = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )
    wavs = audio.mapInPandas(wav_payloads, schema="doc_id LONG, payload BINARY")
    return wavs.mapInPandas(
        decode_wav_features,
        schema=(
            "doc_id LONG, sample_rate INT, n_samples INT, "
            "sum_abs LONG, max_abs INT"
        ),
    )


@register(
    "image_decode_stats",
    oracle="""
WITH img AS (
  SELECT doc_id, 4 + doc_id % 16 AS w, 3 + doc_id % 8 AS h
  FROM documents WHERE doc_id % 3 = 0
),
px AS (
  SELECT m.doc_id, m.w, m.h, t.i % 3 AS ch,
         (m.doc_id * 7 + t.i * 13) % 256 AS v
  FROM img m JOIN range(0, 570) t(i) ON t.i < 3 * m.w * m.h
)
SELECT doc_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS sum_r,
       CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS sum_b,
       CAST(MAX(v) AS INT) AS max_byte
FROM px
GROUP BY doc_id
""",
    survey=["multimodal", "image-decode", "mapInPandas"],
)
def image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode path, end to end on actual container bytes:
    image rows get a spec-conforming PNG payload (signature, IHDR,
    CRC-validated chunk walk, ancillary tEXt a parser must skip, the
    zlib scanline stream split across two IDAT chunks, every scanline
    filter type 0-4 in use; mapInPandas ingest stage), then a
    dependency-free PNG decoder inflates and UNFILTERS the raster and
    computes integer-exact per-channel features from the DECODED
    pixels (second mapInPandas stage). The oracle re-derives every
    pixel byte arithmetically in SQL, so a codec bug (wrong Paeth
    predictor, missed filter case, chunk-walk off-by-one, CRC skip)
    fails the hash.

    Scale shape: both stages are Arrow-batched and row-local (no
    shuffle); swapping in libjpeg for zlib-PNG changes only the
    parse body, not the plan. At 100 TB payload columns stream
    through executors batch-by-batch with constant memory."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        decode_ppm_features,
        png_payloads,
    )

    imgs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    pngs = imgs.mapInPandas(png_payloads, schema="doc_id LONG, payload BINARY")
    return pngs.mapInPandas(
        decode_ppm_features,
        schema=(
            "doc_id LONG, width INT, height INT, "
            "sum_r LONG, sum_g LONG, sum_b LONG, max_byte INT"
        ),
    )


@register(
    "image_resize_stats",
    oracle="""
WITH img AS (
  SELECT doc_id, 4 + doc_id % 16 AS w, 3 + doc_id % 8 AS h
  FROM documents WHERE doc_id % 3 = 0
),
cell AS (
  SELECT m.doc_id,
         c.i AS ch,
         (m.doc_id * 7
          + (3 * ((y.i * m.h // 4) * m.w + (x.i * m.w // 4)) + c.i) * 13)
           % 256 AS v
  FROM img m, range(0, 4) y(i), range(0, 4) x(i), range(0, 3) c(i)
)
SELECT doc_id,
       4 AS out_w,
       4 AS out_h,
       CAST(SUM(CASE WHEN ch = 0 THEN v END) AS BIGINT) AS rsum_r,
       CAST(SUM(CASE WHEN ch = 1 THEN v END) AS BIGINT) AS rsum_g,
       CAST(SUM(CASE WHEN ch = 2 THEN v END) AS BIGINT) AS rsum_b,
       CAST(MAX(v) AS INT) AS max_byte
FROM cell
GROUP BY doc_id
""",
    survey=["multimodal", "image-resize", "mapInPandas"],
)
def image_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode -> RESIZE pipeline on real container bytes: full PNG
    decode (chunk walk, inflate, unfilter), then integer-exact
    nearest-neighbor downsample to 4x4 of the DECODED raster
    (src = out_idx * src_dim // out_dim), per-channel sums of the
    resized pixels. The oracle replays the same NN index map
    arithmetically per cell, so an off-by-one in the resize map, a
    channel swap, or any unfilter bug fails the hash -- the resize
    stage of an image-training preprocessing pipeline made
    oracle-checkable.

    Scale shape: two Arrow-batched row-local stages, no shuffle; a real
    resampler (PIL.Image.resize) swaps in for the numpy index map
    without touching the plan."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        png_payloads,
        resize_ppm_features,
    )

    imgs = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 0)
        .select("doc_id")
    )
    pngs = imgs.mapInPandas(png_payloads, schema="doc_id LONG, payload BINARY")
    return pngs.mapInPandas(
        resize_ppm_features,
        schema=(
            "doc_id LONG, out_w INT, out_h INT, "
            "rsum_r LONG, rsum_g LONG, rsum_b LONG, max_byte INT"
        ),
    )


@register(
    "video_decode_stats",
    oracle="""
WITH vid AS (
  SELECT doc_id, 2 + doc_id % 6 AS n_frames,
         4 + doc_id % 16 AS w, 3 + doc_id % 8 AS h
  FROM documents WHERE doc_id % 3 = 2
),
px AS (
  SELECT v.doc_id, v.n_frames, v.w, v.h, f.f AS fi,
         (v.doc_id * 7 + f.f * 11 + t.i * 13) % 256 AS b
  FROM vid v
  JOIN range(0, 8) f(f) ON f.f < v.n_frames
  JOIN range(0, 570) t(i) ON t.i < 3 * v.w * v.h
)
SELECT doc_id,
       CAST(MAX(n_frames) AS INT) AS n_frames,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(b) AS BIGINT) AS total_sum,
       CAST(SUM(CASE WHEN fi = 0 THEN b END) AS BIGINT) AS frame0_sum,
       CAST(MAX(b) AS INT) AS max_byte
FROM px
GROUP BY doc_id
""",
    survey=["multimodal", "video-decode", "demux", "mapInPandas"],
)
def video_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video decode path, end to end on actual container bytes:
    video rows get a multi-frame VPPM container (magic + frame count +
    length-prefixed spec-conforming P6 frames; mapInPandas ingest
    stage), then a dependency-free demuxer walks the frame table and
    decodes every frame through the P6 parser, computing integer-exact
    features from the DECODED rasters (second mapInPandas stage). The
    oracle re-derives every byte of every frame arithmetically in SQL,
    so a demux bug (wrong prefix width, off-by-one frame walk,
    truncation mishandling) or a frame-parse bug fails the hash — this
    closes the last stubbed modality: audio, image, AND video all
    decode real containers now.

    Scale shape: both stages are Arrow-batched and row-local (no
    shuffle anywhere); payload size is bounded per row, so executor
    memory is flat. Swapping VPPM for mp4 swaps the parser, not the
    plan."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        decode_vppm_features,
        vppm_payloads,
    )

    vids = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 2)
        .select("doc_id")
    )
    blobs = vids.mapInPandas(
        vppm_payloads, schema="doc_id LONG, payload BINARY"
    )
    return blobs.mapInPandas(
        decode_vppm_features,
        schema=(
            "doc_id LONG, n_frames INT, width INT, height INT, "
            "total_sum LONG, frame0_sum LONG, max_byte INT"
        ),
    )


# ---------------------------------------------------------------------------
# Blob-level exact dedup manifest (content-addressed storage bill)
# ---------------------------------------------------------------------------

MULTIMODAL_DEDUP_SQL = f"""
WITH blobs AS (
  SELECT doc_id, {_MEDIA_CASE} AS media_type,
         md5(text) AS digest,
         octet_length(encode(text)) AS byte_len
  FROM documents
),
grp AS (
  SELECT media_type, digest,
         COUNT(*) AS n_copies,
         MIN(doc_id) AS keeper_doc_id,
         CAST(SUM(byte_len) AS BIGINT) AS bytes_all,
         MIN(byte_len) AS keeper_bytes
  FROM blobs
  GROUP BY media_type, digest
)
SELECT media_type,
       CAST(COUNT(*) AS BIGINT) AS n_unique,
       CAST(SUM(n_copies) AS BIGINT) AS n_blobs,
       CAST(SUM(n_copies) - COUNT(*) AS BIGINT) AS n_dup_rows,
       CAST(SUM(bytes_all) AS BIGINT) AS bytes_total,
       CAST(SUM(bytes_all) - SUM(keeper_bytes) AS BIGINT) AS bytes_saved,
       CAST(SUM(CASE WHEN n_copies > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_groups,
       MIN(keeper_doc_id) AS min_keeper_doc_id
FROM grp
GROUP BY media_type
"""


@register(
    "multimodal_dedup_manifest",
    oracle=MULTIMODAL_DEDUP_SQL,
    survey=["multimodal", "dedup-exact", "composition", "manifest"],
)
def multimodal_dedup_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed dedup manifest over the opaque payload table —
    the storage bill a multimodal lake computes before physical dedup:
    hash every payload (md5 of the binary column), elect the
    minimum-doc_id copy per (media_type, digest) as keeper, and emit
    the per-type accounting: unique blobs, duplicate rows, total bytes,
    and bytes reclaimed by keeping one copy per digest. The multimodal
    twin of ``training_shard_manifest``'s content-checksum discipline.

    Scale shape: one scan computing digest+length row-locally (the
    payload is hashed once and never shuffled — the exchange carries
    the 16-byte digest and a long, not blob bytes, which is the entire
    point of content addressing at 100 TB), then two map-side-
    combinable hash aggregates (digest groups → per-type manifest).
    MIN election is order/partitioning-independent, so the manifest is
    byte-identical on reruns and across layouts. No windows, no
    Python, no driver round-trips.

    Note the hash is computed on the payload BYTES (Spark ``F.md5`` on
    the binary column); DuckDB's ``md5(text)`` hashes the same UTF-8
    byte sequence, so digests agree across engines.
    """
    blobs = with_blob(load(spark, sf_dir, "documents"))
    m = F.col("meta")
    grp = (
        blobs.select(
            "doc_id",
            m["media_type"].alias("media_type"),
            F.md5("payload").alias("digest"),
            m["byte_len"].alias("byte_len"),
        )
        .groupBy("media_type", "digest")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.sum("byte_len").cast("long").alias("bytes_all"),
            F.min("byte_len").alias("keeper_bytes"),
        )
    )
    return grp.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.sum("n_copies").cast("long").alias("n_blobs"),
        (F.sum("n_copies") - F.count(F.lit(1))).cast("long").alias("n_dup_rows"),
        F.sum("bytes_all").cast("long").alias("bytes_total"),
        (F.sum("bytes_all") - F.sum("keeper_bytes"))
        .cast("long")
        .alias("bytes_saved"),
        F.sum(F.when(F.col("n_copies") > 1, 1).otherwise(0))
        .cast("long")
        .alias("n_dup_groups"),
        F.min("keeper_doc_id").alias("min_keeper_doc_id"),
    )


@register(
    "audio_vad_segments",
    oracle=f"""
WITH audio AS (
  SELECT doc_id, 160 + doc_id % 320 AS n
  FROM documents WHERE doc_id % 3 = 1
),
s AS (
  SELECT a.doc_id, t.i // {VAD_FRAME} AS f,
         ABS(((a.doc_id * 31 + t.i * 7) % 65536) - 32768) AS amp
  FROM audio a JOIN range(0, 480) t(i) ON t.i < a.n
),
fr AS (
  SELECT doc_id, CAST(f AS INT) AS f, CAST(SUM(amp) AS BIGINT) AS energy
  FROM s GROUP BY doc_id, f
),
flg AS (
  SELECT doc_id, f, energy, energy >= {VAD_THRESHOLD} AS voiced,
         LAG(energy >= {VAD_THRESHOLD})
           OVER (PARTITION BY doc_id ORDER BY f) AS pv
  FROM fr
),
isl AS (
  SELECT doc_id, f, energy, voiced,
         SUM(CASE WHEN pv IS NULL OR pv != voiced THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY f) AS seg
  FROM flg
)
SELECT doc_id, CAST(seg - 1 AS INT) AS seg_idx,
       CAST(MIN(f) AS INT) AS start_frame,
       CAST(MAX(f) + 1 AS INT) AS end_frame,
       CAST(COUNT(*) AS INT) AS n_frames,
       BOOL_AND(voiced) AS is_voiced,
       CAST(SUM(energy) AS BIGINT) AS energy
FROM isl GROUP BY doc_id, seg
""",
    survey=["multimodal", "vad", "audio-segmentation", "mapInPandas"],
)
def audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity segmentation over REAL decoded audio: the WAV
    ingest + chunk-parse path of audio_decode_stats, then per-frame
    |amplitude| energies gated at a fixed threshold and collapsed into
    voiced/silence segments (gaps-and-islands on the frame flags) --
    the silence-split an ASR training pipeline runs before chunking
    audio, here end-to-end on actual container bytes.

    The oracle re-derives every SAMPLE arithmetically in SQL and runs
    the same framing/threshold/islands construction, so a parser bug,
    an off-by-one in the frame boundary, or a wrong partial-last-frame
    rule fails the hash.

    Scale shape: both mapInPandas stages are Arrow-batched and
    row-local (zero shuffle; numpy reshape+sum per payload); a real
    VAD (webrtcvad/silero) swaps only the energy gate inside
    vad_segments."""
    from flights_etl_pipeline_spark.functions.multimodal import (
        VAD_SCHEMA,
        vad_segments,
        wav_payloads,
    )

    audio = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 3 == 1)
        .select("doc_id")
    )
    wavs = audio.mapInPandas(
        wav_payloads, schema="doc_id LONG, payload BINARY"
    )
    return wavs.mapInPandas(vad_segments, schema=VAD_SCHEMA)
