"""Corpus versioning: latest-wins snapshot merge (upsert) and snapshot diff.

A 100 TB training corpus is not built once — it is re-crawled, re-filtered,
and patched. Without a transactional table format the two primitives every
pipeline needs are:

- :func:`merge_upsert` — fold a delta batch into a base snapshot, latest
  version wins per key, with optional tombstone deletes. This is the MERGE
  INTO of Delta/Iceberg re-expressed as one keyed window over the union:
  shuffle cost is ONE hash partition on the key for |base| + |delta| rows;
  no join, no second scan of the base, and payload bytes move at most once.
  (A join-based merge shuffles base AND delta, then unions the anti-join —
  two shuffles of the big side.)
- :func:`snapshot_diff` — classify every key across two snapshots as
  added / deleted / changed / unchanged. One full outer join on the key;
  "changed" compares a 64-bit content hash of the compared columns computed
  BEFORE the join, so wide payloads never cross the comparator, and the
  equality check is one long-vs-long compare per key.
  :func:`snapshot_diff_summary` reduces that to the 4-row audit report —
  the "what did this re-crawl actually change?" answer.

Both are pure DataFrame compositions — Catalyst plans them, AQE handles
skewed keys, and nothing touches the driver.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    delta: DataFrame,
    keys: Sequence[str],
    version_col: str,
    delete_col: str | None = None,
) -> DataFrame:
    """Latest-wins merge of ``delta`` into ``base``.

    Both frames must share a schema (plus an optional boolean ``delete_col``
    tombstone column on either side — treated as False when absent/null).
    Per key, the row with the highest ``version_col`` wins; on a version tie
    the DELTA row wins (the conventional MERGE semantics: the incoming batch
    overrides the snapshot it was diffed against). Winning tombstones delete
    the key from the output.

    Scale: union → one window (``row_number`` over the key, ordered by
    version desc, source desc) → filter. A single hash shuffle on the key;
    per-key state in the window is the rows of that key only (bounded by
    the number of versions per key, typically 2). Deterministic under any
    partitioning.
    """
    keys = list(keys)
    cols = [c for c in base.columns if c != delete_col]
    # order-insensitive: the merge unions by NAME, so a delta whose columns
    # arrive in a different order is valid input, not a schema mismatch
    if {c for c in delta.columns if c != delete_col} != set(cols):
        raise ValueError(
            f"base/delta schemas differ: {base.columns} vs {delta.columns}"
        )

    def with_del(df: DataFrame) -> DataFrame:
        if delete_col is not None and delete_col in df.columns:
            return df.withColumn(
                "__del", F.coalesce(F.col(delete_col), F.lit(False))
            ).drop(delete_col)
        return df.withColumn("__del", F.lit(False))

    tagged = with_del(base).withColumn("__src", F.lit(0)).unionByName(
        with_del(delta).withColumn("__src", F.lit(1))
    )
    w = Window.partitionBy(*keys).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & ~F.col("__del"))
        .select(*cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Row-level diff of two snapshots of a keyed table.

    Returns one row per key present in either snapshot:
    ``*keys, status`` where status ∈ {'added','deleted','changed',
    'unchanged'}. ``compare_cols`` defaults to every non-key column shared
    by both frames (order-insensitively matched by name).

    Scale: each side is reduced to ``(keys, xxhash64(compared columns))``
    BEFORE the join — the payload never shuffles, only key + 8 bytes. The
    join is a plain keyed full outer (AQE-skew-handled). Null-safe: the
    hash distinguishes NULL from '' via Spark's typed xxhash64 on the raw
    columns, and the same normalization is applied to both sides.
    """
    keys = list(keys)
    if compare_cols is None:
        shared = [c for c in old.columns if c in set(new.columns)]
        compare_cols = [c for c in shared if c not in keys]
    compare_cols = list(compare_cols)

    def hashed(df: DataFrame, alias: str) -> DataFrame:
        return df.select(
            *keys, F.xxhash64(*[F.col(c) for c in compare_cols]).alias(alias)
        )

    o = hashed(old, "__ho")
    n = hashed(new, "__hn")
    joined = o.join(n, keys, "full_outer")
    return joined.select(
        *keys,
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("deleted"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """The 4-row audit report: ``status, n_keys`` counts over
    :func:`snapshot_diff`, all four statuses always present (0 when empty).
    Output is bounded (4 rows) regardless of corpus size."""
    diff = snapshot_diff(old, new, keys, compare_cols)
    counts = diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_keys"))
    dim = old.sparkSession.createDataFrame(
        [("added",), ("deleted",), ("changed",), ("unchanged",)],
        "status string",
    )
    return dim.join(counts, "status", "left").select(
        "status", F.coalesce("n_keys", F.lit(0)).cast("bigint").alias("n_keys")
    )


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    open_end: "int | None" = None,
) -> DataFrame:
    """Build SCD-2 validity intervals from a change log: each (key, ts)
    change event becomes a ``[valid_from, valid_to)`` row, with the key's
    latest version open-ended (``valid_to`` NULL, or ``open_end`` when a
    sentinel horizon is preferred for BETWEEN-join pruning) — the
    classic warehouse dimension-history shape that
    :func:`merge_upsert` keeps CURRENT and this keeps FULL.

    One per-key window (``lead(ts)``) — the same bounded per-key pattern
    as sessionize/gap_fill; ``ts_col`` must be integral (epoch ns at the
    load boundary) and unique per key (change logs are; pre-aggregate
    duplicates with latest-wins upsert otherwise — a duplicate ts would
    make version numbering non-total). Appends ``version`` (1-based per
    key, change order), ``valid_from``, ``valid_to``, ``is_current``.
    All columns pass through — the payload stays with its interval.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(F.col(ts_col))
    nxt = F.lead(F.col(ts_col)).over(w)
    valid_to = (
        F.coalesce(nxt, F.lit(open_end).cast("bigint"))
        if open_end is not None
        else nxt
    )
    return (
        df.withColumn("version", F.row_number().over(w).cast("bigint"))
        .withColumn("valid_from", F.col(ts_col).cast("bigint"))
        .withColumn("valid_to", valid_to.cast("bigint"))
        .withColumn("is_current", nxt.isNull())
    )
