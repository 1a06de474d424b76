"""Reusable column-expression builders (pure functions Column -> Column
— the JVM-side fast path; see plans/ for their oracle-checked uses).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_cents(col: Column | str) -> Column:
    """2-decimal money column -> exact int64 cents (the cross-engine
    determinism primitive, plans/registry.py)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("bigint")


def quantize_vector(col: Column | str, scale: int = 1_000_000) -> Column:
    """float vector -> int64 vector for exact dot products."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def int_dot(a: Column | str, b: Column | str) -> Column:
    """Exact int64 dot product of two quantized vectors."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y), F.lit(0).cast("bigint"), lambda acc, x: acc + x
    )


def cosine_from_int(dot: Column, norm_a: Column, norm_b: Column) -> Column:
    """Cosine from exact integer dot/norms — only IEEE-exact double ops."""
    return dot.cast("double") / (F.sqrt(norm_a.cast("double")) * F.sqrt(norm_b.cast("double")))


def shingles(text_col: Column | str, n: int = 3, sep: str = " ") -> Column:
    """Distinct n-token shingles of a text column (dedup/similarity
    building block)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col

    # Bind the token array ONCE as a lambda variable: higher-order
    # functions are interpreted without common-subexpression elimination,
    # so referencing split(text) directly inside the per-index lambda
    # re-splits the whole text per element (O(tokens^2) per doc — measured
    # 5x the entire minhash pipeline at sf0.1). The array-wrap trick
    # evaluates split() once per row.
    def _body(toks):
        # guard: sequence(1, 0) DESCENDS in Spark ([1, 0]), so short texts
        # must short-circuit to an empty array, not an empty sequence
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        return F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
            F.array_distinct(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(sep, *[F.element_at(toks, i + k) for k in range(n)]),
                )
            )
        )

    return F.element_at(F.transform(F.array(F.split(c, sep)), _body), 1)


def token_count(text_col: Column | str, sep: str = " ") -> Column:
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.size(F.split(c, sep))


__all__ = [
    "cosine_from_int",
    "int_dot",
    "money_cents",
    "quantize_vector",
    "shingles",
    "token_count",
]
