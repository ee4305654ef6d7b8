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


def int8_scale(a: Column) -> Column:
    """Per-vector symmetric int8 quantization scale: ``max(|v|) / 127``.
    Pure double ops (max, abs, one division) — IEEE-deterministic, so Spark
    and a SQL oracle derive bit-identical scales from the same floats."""
    return F.array_max(F.transform(a, lambda x: F.abs(x.cast("double")))) / F.lit(
        127.0
    )


def int8_codes(a: Column, scale: Column) -> Column:
    """Quantization codes ``floor(v/scale + 0.5)`` (round-to-nearest spelled
    as floor, which both Spark and DuckDB evaluate identically — ``round``'s
    half-way tie behavior differs between engines). Codes land in
    [-127, 127] by construction of :func:`int8_scale`; an all-zero vector
    (scale 0) quantizes to all-zero codes instead of dividing by zero."""
    zero = F.transform(a, lambda x: F.lit(0).cast("bigint"))
    q = F.transform(
        a, lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("bigint")
    )
    return F.when(scale > 0, q).otherwise(zero)


def dequant_rmse_exact(a: Column, codes: Column, scale: Column) -> Column:
    """Reconstruction RMSE of ``codes * scale`` vs the original vector, with
    squared errors rounded to 12 decimals and accumulated in DECIMAL — the
    same order-independence discipline as :func:`dot_exact`, so the value is
    hash-comparable against a SQL oracle."""
    err2 = F.zip_with(
        a,
        codes,
        lambda x, c: F.round(
            (x.cast("double") - c.cast("double") * scale)
            * (x.cast("double") - c.cast("double") * scale),
            12,
        ).cast(_DEC),
    )
    total = F.aggregate(
        err2, F.lit(0).cast(_DEC), lambda acc, v: (acc + v).cast(_DEC)
    ).cast("double")
    return F.sqrt(total / F.size(a).cast("double"))


def dot_fast(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_fast(a: Column, b: Column) -> Column:
    return dot_fast(a, b) / (F.sqrt(dot_fast(a, a)) * F.sqrt(dot_fast(b, b)))
