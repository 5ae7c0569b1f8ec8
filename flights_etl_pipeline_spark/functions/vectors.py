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


_POW = 10**DOT_SCALE
_FPOW = float(_POW)  # 1e14 is exactly representable (< 2^53)
_M64 = (1 << 64) - 1
_F64MAX = float(_M64)  # DuckDB multiplies upper by fl(2^64-1) == 2^64


def _duckdb_quantize14(p: float) -> int:
    """DuckDB's double->DECIMAL(38,14) cast, bit-for-bit: scale in
    BINARY floating point first, then round half-even to an integer
    (Python ``round(float)`` is a correctly-rounded half-even
    nearbyint, matching the C cast under the default FP mode).

    NOT an exact decimal quantize: ``fl(p * 1e14)`` already rounds in
    binary, so on non-dyadic doubles the result can sit 1 quantum (and
    for |p*1e14| beyond 2^53, up to ~0.5 binary-ulp of the scaled
    value) away from the correctly-rounded decimal — verified against
    DuckDB on 22k+ fuzz doubles across magnitude regimes incl.
    subnormals and exact .5 ties (tests/test_properties_r7.py pins the
    live engine).
    """
    return round(p * _FPOW)


def _duckdb_dec14_to_double(i: int) -> float:
    """DuckDB's DECIMAL(38,14)->DOUBLE cast, bit-for-bit: the hugeint
    goes to double as ``fl(fl(lower) + fl(upper) * fl(2^64-1))`` on the
    two's-complement (upper, lower) split — with a special branch for
    upper == -1 (``-fl(2^64-1 - lower) - 1.0``) — then one IEEE divide
    by 1e14. For |i| >= 2^53 this is NOT the correctly-rounded
    conversion Python's ``float(int)`` performs (it can land 1-2 ulp
    away); mimicking it exactly is what makes the twin bit-exact.
    Verified against DuckDB on 40k+ fuzz hugeints.
    """
    upper = i >> 64
    lower = i & _M64
    if upper == -1:
        d = -float(_M64 - lower) - 1.0
    else:
        d = float(lower) + float(upper) * _F64MAX
    return d / _FPOW


def py_decimal_dot(a: list[float], b: list[float]) -> float:
    """Driver-side BIT-EXACT twin of the ORACLE's decimal fold
    (``sqlfrag.sql_decimal_dot``) for model-channel computations —
    probe selection against a collected quantizer, codebook norms,
    ADC tables, ...

    Reproduces DuckDB's op sequence exactly, not an idealized decimal
    model of it: per-element IEEE double multiply (Python floats ARE
    doubles), each product pushed through DuckDB's actual
    double->decimal cast (:func:`_duckdb_quantize14` — binary-FP
    scaling then half-even, which is NOT an exact decimal quantize on
    non-dyadic doubles), the scale-14 integers summed exactly (int128
    never overflows at embedding magnitudes), and the total pushed
    through DuckDB's actual decimal->double cast
    (:func:`_duckdb_dec14_to_double` — the quirky hugeint-to-double
    conversion plus one divide, which is NOT correctly rounded beyond
    2^53). tests/test_properties_r7.py pins equality with the live
    engine at ZERO tolerance on arbitrary finite doubles, exact
    dyadic .5 ties, and k/128 grids — so a driver-side ranking over
    these dots matches the oracle's in-SQL ranking bit-for-bit, which
    is what the correctness gate compares against.

    Relation to the IN-PLAN Spark fold (:func:`decimal_dot`) is a
    BOUND, not equality: Spark's double->decimal cast is an exact
    HALF_UP quantize (differs from DuckDB's binary-scaled cast by <=1
    quantum per element, ~1e-14) and Spark's decimal ``+`` at
    (38,14)+(38,14) overflows precision 38 to scale 13, HALF_UP-
    rounding each step — total drift <= dim * 1e-13 from this twin
    (pinned in tests/test_properties_r7.py). Every ranking margin the
    ANN family relies on and every >=1e-8 result-channel rounding sits
    orders of magnitude above that bound.
    """
    total = 0
    for x, y in zip(a, b):
        total += _duckdb_quantize14(x * y)
    return _duckdb_dec14_to_double(total)


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


def flit(vals: list) -> Column:
    """Numeric (possibly nested) list as ONE JVM-parsed array literal.

    ``F.lit(list)`` builds the array element by element over py4j — a
    K x dim centroid table costs ~1000 gateway round trips, ~0.3 s of
    pure DRIVER latency per call (measured r12; the k-means loop paid
    it 4x per run, the PQ encode 4x). Rendering the same values as a
    SQL ``array(...)`` text and parsing it with one ``F.expr`` call
    produces a column with the IDENTICAL type and values (double
    literals carry the ``D`` suffix; ``repr`` of a Python float is the
    shortest round-tripping decimal, so parseDouble recovers the exact
    bits — pinned against ``F.lit`` in tests/test_flit.py) at ~1000x
    less gateway traffic. Guide §4 discipline applied to plan
    CONSTRUCTION: the JVM boundary is the cost, cross it once.

    Ints render unsuffixed (IntegerType when they fit in int32, else
    LongType — same promotion ``F.lit`` applies per element). Floats
    must be finite: model literals here are distances/centroids, and a
    NaN/Inf literal would be a corrupted model, so it raises."""
    return F.expr(_flit_render(vals))


def _flit_render(v) -> str:
    if isinstance(v, (list, tuple)):
        return "array(" + ",".join(_flit_render(x) for x in v) + ")"
    if isinstance(v, bool):
        raise TypeError("flit: bool literals unsupported")
    if isinstance(v, int):
        # fail at render time with a clear message, not later with an
        # opaque ParseException on the 'L' suffix (ADVICE r12)
        if not -(2**63) <= v < 2**63:
            raise ValueError(f"flit: int out of int64 range {v!r}")
        if -(2**31) <= v < 2**31:
            return str(v)
        return f"{v}L"
    if isinstance(v, float):
        if v != v or v in (float("inf"), float("-inf")):
            raise ValueError(f"flit: non-finite float {v!r}")
        return f"{v!r}D"
    raise TypeError(f"flit: unsupported element type {type(v).__name__}")


# --- Spark-SQL TEXT twins of the column folds above (r12) -------------------
#
# PySpark Column construction costs ~3 ms of gateway latency PER
# OPERATOR on this driver (measured r12: 1000 trivial col ops = 3.2 s),
# so the K x dim argmin helpers — a few hundred operators each — paid
# 0.2-0.9 s of pure DRIVER time per query construction, re-paid on
# every bench run and every k-means round. These render the IDENTICAL
# expressions as SQL text for a single F.expr parse (same functions,
# same casts, same operand order — the analyzer produces the same
# resolved tree, so results are bit-for-bit; pinned by the oracle
# parity gate over the whole ANN/k-means family). They are Spark-SQL
# dialect — the DuckDB oracle twins live in plans/sqlfrag.py.

def sp_double_dot(a: str, b: str) -> str:
    """Spark-SQL text of :func:`double_dot` (plain double fold)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def sp_decimal_dot(a: str, b: str) -> str:
    """Spark-SQL text of :func:`decimal_dot` (exact decimal fold)."""
    dec = _DEC.upper()
    return (
        f"CAST(aggregate(zip_with({a}, {b}, (x, y) -> "
        f"CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE) AS {dec})), "
        f"CAST(0 AS {dec}), (acc, x) -> CAST(acc + x AS {dec})) AS DOUBLE)"
    )


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
    """+-1 plane as a literal int array column (one JVM parse; see
    :func:`flit`)."""
    return flit(list(plane))
