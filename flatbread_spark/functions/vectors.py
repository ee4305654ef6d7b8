"""Vector (embedding) column expressions.

All JVM-side higher-order functions over ``array<float>`` columns — no UDFs,
so they stay inside codegen and scale linearly with partition count.

Two flavors:

- ``*_exact``: products rounded to 12 decimals and accumulated in
  ``DECIMAL(28,12)``. Decimal addition is associative, so the result is
  bit-identical regardless of evaluation order or engine — this is what makes
  cosine results hash-comparable against a DuckDB oracle (verified
  bit-for-bit) and reproducible across cluster re-runs.
- ``*_fast``: plain double accumulation — marginally faster, order-sensitive
  at the last ulp; use when only ranking matters and ties are broken by id.
"""
from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_DEC = "decimal(28,12)"


def dot_exact(a: Column, b: Column) -> Column:
    prods = F.zip_with(
        a, b, lambda x, y: F.round(x.cast("double") * y.cast("double"), 12).cast(_DEC)
    )
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, v: (acc + v).cast(_DEC)
    ).cast("double")


def norm_exact(a: Column) -> Column:
    return F.sqrt(dot_exact(a, a))


def cosine_exact(a: Column, b: Column) -> Column:
    return dot_exact(a, b) / (norm_exact(a) * norm_exact(b))


def dot_fast(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_fast(a: Column, b: Column) -> Column:
    return dot_fast(a, b) / (F.sqrt(dot_fast(a, a)) * F.sqrt(dot_fast(b, b)))
