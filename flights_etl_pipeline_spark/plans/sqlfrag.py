"""SQL fragments mirroring functions.scalar's engine-portable arithmetic.

Every oracle string that aggregates or rounds doubles must use these so
the DuckDB side performs the exact same op sequence as the Spark side
(exact decimal sums; floor-based rounding -- see scalar.dsum/dround
docstrings for why plain SUM/ROUND diverge between engines).
"""

from __future__ import annotations


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Mirror of scalar.dsum: exact decimal sum cast back to double."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 4) -> str:
    """Mirror of scalar.davg: exact decimal sum / non-null count."""
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )


def sql_dround(expr: str, scale: int = 2) -> str:
    """Mirror of scalar.dround: floor(x * 10^s + 0.5) / 10^s."""
    p = 10**scale
    return f"(FLOOR(({expr}) * {p} + 0.5) / {p})"


def sql_decimal_dot(a: str, b: str) -> str:
    """Mirror of vectors.decimal_dot: exact decimal fold of the products."""
    return (
        f"CAST(LIST_SUM(LIST_TRANSFORM(LIST_ZIP({a}, {b}), "
        f"p -> CAST(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) "
        f"AS DECIMAL(38,14)))) AS DOUBLE)"
    )


def sql_cosine(a: str, b: str) -> str:
    """Mirror of vectors.cosine_similarity."""
    return (
        f"({sql_decimal_dot(a, b)} / "
        f"SQRT({sql_decimal_dot(a, a)} * {sql_decimal_dot(b, b)}))"
    )
