"""Source readers.

The reference has no file readers (in-memory pandas only — SURVEY §2.2); the
engine exposes Spark's native scans so Catalyst gets predicate pushdown,
column pruning and partition pruning for free. ``load_table`` is the thin
convention wrapper over the driver testdata layout (one parquet per table).
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str, names=TABLES) -> dict[str, DataFrame]:
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    **options,
) -> DataFrame:
    """Format-generic scan (parquet/orc/csv/json/text/binaryFile).

    Columnar formats (parquet/orc) get predicate pushdown + column pruning
    from Catalyst automatically. For csv/json ALWAYS pass ``schema`` at
    scale: schema inference runs a full extra pass over the data, and for
    json it materializes sampled records on the driver. ``options`` pass
    through to the DataFrameReader (header, delimiter, multiLine, ...)."""
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    return reader.options(**options).load(path)


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "error",
    partition_by=None,
    max_records_per_file: int | None = None,
    **options,
) -> None:
    """Format-generic sink with layout controls that matter at scale.

    ``partition_by`` writes hive-style directory partitions — the column(s)
    downstream queries filter on become partition-pruning keys (e.g. lang,
    date). ``max_records_per_file`` bounds file sizes so a skewed task can't
    emit one multi-GB file. For bucketed, exchange-free join layouts use
    ``sources.bucketing`` (saveAsTable — bucket metadata needs a catalog)."""
    writer = df.write.format(fmt).mode(mode)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"  # symmetric with read_table's default
    if partition_by:
        cols = [partition_by] if isinstance(partition_by, str) else list(partition_by)
        writer = writer.partitionBy(*cols)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.options(**options).save(path)
