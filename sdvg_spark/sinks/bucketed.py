"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact-fact join is shuffling both
sides on the key. Writing each side ONCE bucketed (and sorted) by that
key moves the shuffle to write time and amortizes it over every later
join/aggregate: Catalyst sees `HashPartitioning(key, n)` on both scans
and plans a SortMergeJoin with NO Exchange (asserted in
tests/test_sinks.py). Same story for repeated `groupBy(key)` — the
aggregate reuses the bucket partitioning.

Spark only honors bucket metadata through the catalog, so this writes
a saved table (`saveAsTable` with an explicit `path`), not a bare
directory; `read_bucketed` resolves the table by name. Bucket file
count = n_buckets × write tasks — call `repartition(key)` first (done
here by default) so each bucket is one file per task wave.

Reference parity note: the reference engine (tarantool/sdvg) has no
table catalog; this is beyond-parity infrastructure for the analytics
surface (SURVEY.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    *,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as a bucketed (optionally sort-merged-ready) parquet
    table registered as ``table`` with data at ``path``.

    ``n_buckets`` is a layout commitment: joins between tables bucketed
    on the same key with the same count skip the exchange entirely;
    pick it near the target parallelism at full scale (buckets are the
    max join parallelism without AQE splitting).
    """
    w = (
        df.repartition(*[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a table written by :func:`write_bucketed` — the catalog
    carries the bucket spec, so downstream joins/aggregates on the
    bucket key start from `HashPartitioning` instead of a shuffle."""
    return spark.table(table)
