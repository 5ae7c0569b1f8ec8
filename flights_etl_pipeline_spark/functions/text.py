"""Text-analysis column functions for the training-data pipeline extras:
tokenization, normalization, fingerprinting, stopword scoring, language-ID
heuristic, shingling, minhash.

All pure column expressions (JVM-side); at 100 TB the text path is the hot
path, so nothing here drops to Python. The shingle/minhash pipeline is
higher-order functions over arrays -- per-row work, no shuffle until the
LSH band join.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Minimal stopword sets for the language-ID heuristic (public common words).
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "fr": ("le", "la", "de", "et", "les", "des", "est"),
    "de": ("der", "die", "das", "und", "ist", "von", "ein"),
}

# Shared CASE expression (valid in both Spark SQL and DuckDB) that turns the
# four score_* columns into a predicted language; ties break by the fixed
# en > es > fr > de preference order.
LANG_CASE_SQL = """
CASE
  WHEN score_en = 0 AND score_es = 0 AND score_fr = 0 AND score_de = 0
    THEN 'unknown'
  WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de
    THEN 'en'
  WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
  WHEN score_fr >= score_de THEN 'fr'
  ELSE 'de'
END
"""


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokenize(col: Column | str) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(_c(col), r"\s+")


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapsed
    whitespace, trimmed."""
    return F.trim(F.lower(F.regexp_replace(_c(col), r"\s+", " ")))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.
    (md5 hex is identical across engines, unlike engine-native hash().)"""
    return F.md5(normalize_text(col))


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007


def rolling_hash(col: Column | str) -> Column:
    """Polynomial (Rabin-Karp) rolling hash of a string -> long.

    ``fold(chars, 0, (acc, c) -> (acc*31 + codepoint(c)) % 1e9+7)`` as a
    higher-order aggregate over the char array -- O(len) per row, fully
    inside codegen, no shuffle. Unlike md5 it supports incremental
    window extension (the classic substring-search / chunk-dedup trick);
    the oracle twin is ``sql_rolling_hash``.
    """
    chars = F.split(_c(col), "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * ROLLING_BASE + F.ascii(c)) % F.lit(ROLLING_MOD),
    )


def sql_rolling_hash(expr: str) -> str:
    """DuckDB twin of :func:`rolling_hash` (list_reduce fold; the leading
    0 seeds the accumulator since list_reduce has no initial-value arg)."""
    return (
        f"list_reduce(list_concat([CAST(0 AS BIGINT)], "
        f"list_transform(string_split({expr},''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc,c) -> (acc*{ROLLING_BASE} + c) % {ROLLING_MOD})"
    )


def stopword_score(tokens: Column, words: tuple[str, ...]) -> Column:
    """Count of tokens that are in the given stopword set."""
    return F.size(F.filter(tokens, lambda x: x.isin(*words)))


def char_shingles(col: Column | str, k: int = 5) -> Column:
    """Character k-gram shingles of the normalized text -> array<string>.

    ``substr`` past the end yields a short tail shingle; texts shorter than
    k produce a single shingle. Distinct is applied so shingle multiplicity
    does not bias minhash/jaccard.
    """
    norm = normalize_text(col)
    n = F.greatest(F.length(norm) - (k - 1), F.lit(1))
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), n), lambda i: norm.substr(i, F.lit(k))
        )
    )


def word_shingles(col: Column | str, w: int = 3) -> Column:
    """Word w-gram shingles of the normalized text -> array<string>
    (Broder-style document shingling).

    Why words, not chars, for MinHash near-dup: documents drawn from a
    shared vocabulary overlap heavily in character k-grams (pairwise
    Jaccard ~0.3-0.5), which degenerates LSH banding into near-quadratic
    candidate sets; word w-grams of unrelated documents are almost
    disjoint, so buckets stay small and the band join stays sub-linear
    in the pair space — the property that makes MinHash dedup viable at
    100 TB. Texts with fewer than w tokens yield one short shingle
    (``concat_ws`` skips the out-of-range NULLs, identically in Spark
    and DuckDB).

    PERF NOTE: inside the ``transform`` lambda the normalize/split
    subtree is re-evaluated per element (interpreted, no CSE). For the
    hot path, materialize ``split(normalize_text(c), ' ')`` as a column
    first and build shingles from an exploded index projection instead
    (see ``queries_dedup.minhash_lsh_pairs``) — same values, all
    whole-stage codegen.
    """
    toks = F.split(normalize_text(col), " ")
    n = F.greatest(F.size(toks) - (w - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(toks, i + j) for j in range(w)]
        ),
    )


def shingle_hash_long(shingle: Column) -> Column:
    """One shingle string -> int64: md5, first 15 hex digits, mod 1e9+7.

    Plain column expression (no higher-order lambda), so it stays inside
    whole-stage codegen when applied to an exploded shingle column —
    ~10x faster than the same md5 inside an interpreted ``transform``
    lambda. Identical value to :func:`shingle_hashes` per element.
    """
    return (
        F.conv(F.substring(F.md5(shingle), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_MOD)
    )


def minhash(shingles: Column, seed: int) -> Column:
    """One minhash value: lexicographic min of seeded md5 over shingles.

    Seeded md5-hex is a public, engine-portable stand-in for a hash-
    permutation family: min(md5(seed || shingle)) behaves as an independent
    permutation per seed and reproduces bit-identically in any engine.

    NOTE: computing k of these evaluates k md5 passes over every shingle;
    the production path is :func:`shingle_hashes` (one md5 per shingle)
    + :func:`minhash_from_hashes` (k cheap integer mixes).
    """
    return F.array_min(
        F.transform(
            shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s))
        )
    )


MINHASH_MOD = ROLLING_MOD


def minhash_params(n: int) -> list[tuple[int, int]]:
    """Deterministic universal-hash family ((a_j, b_j) pairs) derived from
    md5 — driver-side literals inlined identically into both engines.
    a_j is odd and < 2^29 so a*h + b stays far inside int64."""
    import hashlib

    def _p(tag: str, j: int) -> int:
        return int(hashlib.md5(f"{tag}|{j}".encode()).hexdigest()[:7], 16)

    return [((_p("a", j) * 2 + 1) % 2**29, _p("b", j)) for j in range(n)]


def shingle_hashes(shingles: Column) -> Column:
    """Shingle array -> int64 hash array: ONE md5 per shingle (first 15
    hex digits -> bigint, mod 1e9+7). All k minhashes mix these ints."""
    return F.transform(
        shingles,
        lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        % F.lit(MINHASH_MOD),
    )


def minhash_from_hashes(hs: Column, a: int, b: int) -> Column:
    """min((a*h + b) mod p) over the pre-hashed shingle ints — the cheap
    per-permutation mix (integer mul/add vs a full md5 per shingle)."""
    return F.array_min(
        F.transform(hs, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_MOD))
    )


def shingle_rows(df, id_cols: list, text_col: str = "text", w: int = 3):
    """Explode a document table to one row per word w-gram shingle --
    the codegen hot path: tokens materialize as a column BEFORE the
    explode, so normalize/split run once per document and every step
    (sequence-explode, concat_ws projection) stays in whole-stage
    codegen. Same values as ``explode(word_shingles(c))``, ~6x faster
    (see word_shingles PERF NOTE).

    Returns ``df.select(*id_cols, sh)``.
    """
    toks_df = df.select(
        *id_cols, F.split(normalize_text(text_col), " ").alias("_toks")
    )
    return toks_df.select(
        *id_cols,
        "_toks",
        F.explode(
            F.sequence(
                F.lit(1), F.greatest(F.size("_toks") - (w - 1), F.lit(1))
            )
        ).alias("_i"),
    ).select(
        *id_cols,
        F.concat_ws(
            " ", *[F.try_element_at("_toks", F.col("_i") + j) for j in range(w)]
        ).alias("sh"),
    )
