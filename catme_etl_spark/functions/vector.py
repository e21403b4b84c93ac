"""Vector math over ``array<float>`` columns — built-in higher-order
functions only (zip_with/aggregate/transform), no UDFs.

The fold is sequential left-to-right, which matches DuckDB's
``list_sum`` over an index-ordered ``list_transform`` — keeping
cross-engine float results in agreement to the last ulp for the oracle
gate. Everything is whole-stage-codegen'd; at 100 TB this is the
JVM-side hot path for brute-force similarity (the LSH/IVF variants cut
the candidate count, not the kernel).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _d(x: Column) -> Column:
    return x.cast("double")


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with float→double widening per element."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: _d(x) * _d(y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_sq(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: _d(x) * _d(x)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(norm_sq(a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs instead of NaN."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0, F.lit(0.0)).otherwise(dot(a, b) / denom)


# DuckDB oracle SQL fragments computing the *same* sequential folds.
# {a}/{b} are list-typed SQL expressions.
SQL_DOT = (
    "list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({b}[i+1] AS DOUBLE)))"
)
SQL_NORM = (
    "sqrt(list_sum(list_transform(range(len({a})), "
    "i -> CAST({a}[i+1] AS DOUBLE) * CAST({a}[i+1] AS DOUBLE))))"
)


def sql_cosine(a: str, b: str) -> str:
    return (
        f"({SQL_DOT.format(a=a, b=b)} / "
        f"({SQL_NORM.format(a=a)} * {SQL_NORM.format(a=b)}))"
    )
