"""Vector functions over embedding columns (array<float>).

Dot products / norms fold per-element products into an exact DECIMAL
accumulator instead of a double: IEEE double addition is order-sensitive,
and neither Spark's ``aggregate`` fold order under repartitioning nor
another engine's ``list_sum`` is guaranteed to match -- exact decimal makes
the sum associative, so the result is bit-identical everywhere (the SQL
twin is ``sqlfrag.sql_decimal_dot``). The per-element double multiply is a
single deterministic IEEE op; its decimal rounding at scale 14 is
far below float32 input precision, so no information is lost.

All higher-order built-ins: the hot path (64-1536 dims x billions of rows)
stays inside codegen, no Python.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

DOT_SCALE = 14
_DEC = f"decimal(38,{DOT_SCALE})"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def decimal_dot(a: Column | str, b: Column | str) -> Column:
    """Exact (order-independent) dot product of two float arrays -> double."""
    prods = F.zip_with(
        _c(a), _c(b), lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    ).cast("double")


def py_decimal_dot(a: list[float], b: list[float]) -> float:
    """Driver-side bit-exact twin of the ORACLE's decimal fold
    (``sqlfrag.sql_decimal_dot``: quantize each product to scale 14,
    sum EXACTLY) for model-channel computations — probe selection
    against a collected quantizer, codebook norms, ...

    Per-element IEEE double multiply (Python floats ARE doubles), each
    product converted to decimal exactly then quantized to
    ``DOT_SCALE`` digits with HALF_EVEN — DuckDB's double->decimal
    cast rounding, verified on exact .5 ties: a product that lands
    exactly on the scale-15 half boundary (only possible for dyadic
    inputs, e.g. k/2^7 * k/2^8) banker's-rounds in DuckDB, NOT
    half-up (pinned in tests/test_properties_r7.py, ADVICE r7) —
    summed exactly, and the total rounded back to the nearest double:
    a driver-side ranking over these dots matches the oracle's in-SQL
    ranking bit-for-bit, which is what the correctness gate compares
    against. (Spark's own double->decimal cast is HALF_UP, so on
    exact ties the IN-PLAN fold can sit 1e-14/element away from this
    twin — that divergence is covered by the bounded-drift relation
    below, is dyadic-only, and is invisible through every >=1e-8
    result rounding.)

    NOT the in-plan Spark fold to the last bit: Spark's decimal ``+``
    at (38,14)+(38,14) overflows precision 38 and reduces the
    accumulator scale to 13, HALF_UP-rounding each step, so its sum
    can drift up to ~dim ulp at 1e-13 from the exact sum (pinned in
    tests/test_properties_r7.py). And DuckDB's own decimal->double
    CAST divides an int128 by 10^14 in floating point, occasionally
    landing 1 ulp off the correctly-rounded double this function (and
    Spark's BigDecimal.doubleValue) produce — the decimal sums are
    identical, only the cast wobbles (also pinned). Both gaps are
    many orders of magnitude inside every ranking margin the ANN
    family relies on and inside the >=1e-8 rounding of every result
    channel.
    """
    from decimal import ROUND_HALF_EVEN, Decimal

    q = Decimal(1).scaleb(-DOT_SCALE)
    total = Decimal(0)
    for x, y in zip(a, b):
        total += Decimal(x * y).quantize(q, rounding=ROUND_HALF_EVEN)
    return float(total)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity via exact dots; final sqrt/divide are single
    correctly-rounded IEEE ops (deterministic across engines)."""
    a, b = _c(a), _c(b)
    return decimal_dot(a, b) / F.sqrt(decimal_dot(a, a) * decimal_dot(b, b))


def cosine_from_parts(
    dot: Column, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Cosine from a precomputed pair dot and per-side self-dots.

    Bit-identical to :func:`cosine_similarity` (the decimal dots are
    exact, and sqrt/divide run on the same doubles) but lets a query
    compute each side's self-dot ONCE instead of once per pair — at k
    centroids or n candidates that cuts the fold work from 3 folds/pair
    to 1 fold/pair + 1 fold/side.
    """
    return dot / F.sqrt(_c(norm_a) * _c(norm_b))


def double_dot(a: Column | str, b: Column | str) -> Column:
    """Plain double-precision dot — the CHEAP bound for two-phase pair
    filtering, never a result channel.

    Two-phase lossless pattern: pair queries filter on an exact-decimal
    cosine threshold t; evaluating the decimal fold on every candidate
    pair is the dominant cost (interpreted BigDecimal, ~5-10x a double
    fold). Prefiltering with ``double_cos > t - 1e-3`` prunes the bulk
    of pairs at double-fold cost and the surviving pairs re-check with
    the exact decimal cosine, so results stay bit-identical: the double
    sum's error is bounded by ~dim ulps (~1e-13 relative at dim 1536),
    six orders of magnitude inside the 1e-3 margin, so no pair that
    passes the exact threshold can be pruned."""
    return F.aggregate(
        F.zip_with(
            _c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def double_cos(
    a: Column | str, b: Column | str, norm_a: Column | str, norm_b: Column | str
) -> Column:
    """Double-precision cosine from precomputed (exact) self-dots; see
    :func:`double_dot` for the two-phase prefilter contract."""
    return double_dot(a, b) / F.sqrt(_c(norm_a) * _c(norm_b))


def signed_hyperplane(seed: int, dim: int) -> list[int]:
    """Deterministic +-1 pseudo-random hyperplane from md5(seed|dim-index).

    Computed driver-side once and inlined as a literal array, so Spark and
    any oracle engine use the exact same plane. The md5-parity bit stream
    is a public-construction substitute for a seeded RNG.
    """
    return [
        1
        if int(hashlib.md5(f"{seed}|{d}".encode()).hexdigest()[0], 16) < 8
        else -1
        for d in range(dim)
    ]


def hyperplane_lit(plane: list[int]) -> Column:
    """+-1 plane as a literal int array column."""
    return F.array(*[F.lit(v) for v in plane])
