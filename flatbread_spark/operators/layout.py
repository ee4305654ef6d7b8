"""Storage-layout operators: multi-dimensional clustering for data skipping.

At 100 TB, scan cost is decided before the query runs — by how rows were
laid out at write time. Range-partitioning on one column gives min/max
file pruning on that column only; interleaving the bits of TWO columns
(a Z-order / Morton key) gives useful pruning on either, because rows
close in both dimensions land in the same files. The key is pure integer
bit math — deterministic, engine-portable, and cheap enough to compute at
write time for every row.
"""
from __future__ import annotations


from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton interleave of the low ``bits`` bits of two non-negative
    integer columns: output bit ``2i`` is ``a``'s bit ``i``, bit ``2i+1``
    is ``b``'s bit ``i``. Plain shifts/ands — identical in any engine."""
    av = a.cast("bigint")
    bv = b.cast("bigint")
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (
            key
            + F.shiftleft(F.shiftright(av, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(bv, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return key


def cluster_by_zorder(
    df: DataFrame,
    a: str | Column,
    b: str | Column,
    bits: int = 16,
    num_partitions: int | None = None,
    key_col: str = "__zkey",
) -> DataFrame:
    """Lay ``df`` out in Z-order on two dimensions: range-partition on the
    Morton key and sort within partitions, so a subsequent parquet write
    produces files whose min/max spans are tight in BOTH columns —
    predicate pushdown on either column then skips most files. Returns the
    clustered frame with the key attached (drop it before writing if the
    physical column is unwanted)."""
    ac = F.col(a) if isinstance(a, str) else a
    bc = F.col(b) if isinstance(b, str) else b
    keyed = df.withColumn(key_col, zorder_key(ac, bc, bits))
    part = (
        keyed.repartitionByRange(num_partitions, key_col)
        if num_partitions
        else keyed.repartitionByRange(key_col)
    )
    return part.sortWithinPartitions(key_col)
