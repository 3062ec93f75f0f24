"""Bucketed table layouts: co-located, Exchange-free joins at scale.

At 100 TB the dominant cost of a fact-to-fact join (e.g. lineitem x
orders, events x sessions) is the shuffle of both sides on the join key.
Spark's bucketing eliminates it: both tables are written pre-hashed into
the SAME number of buckets on their join keys, so the join plan reads
matching buckets directly — ``SortMergeJoin`` with NO ``Exchange`` on
either side (verified by ``tests/test_scale_utils.py::
test_bucketed_join_is_shuffle_free``).  The shuffle is paid ONCE at write
time, then amortized over every subsequent join/aggregation on that key.

Guidelines baked into :func:`save_bucketed`:

- bucket count should match the target parallelism at the expected data
  size (buckets are the unit of join-task parallelism; too few starves a
  1000-executor cluster, too many makes small files);
- ``sortBy`` the bucket key so each bucket is read pre-sorted — the
  sort-merge join then skips its sort, and min/max row-group stats make
  point lookups on the key near-free;
- aggregations grouped on the bucket key also skip their Exchange (the
  partial/final aggregate collapses into one stage).

Parity note: the reference keeps everything in one process and has no
equivalent concept; this module is the Spark-native answer to its
"records are co-located in memory" assumption (reference
``tinyolap/cube.py`` in-memory row store).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: "str | list[str]",
    num_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> DataFrame:
    """Write ``df`` as a bucketed managed parquet table and return the
    re-read table handle (joins/aggs on ``bucket_cols`` are co-located)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    writer = (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, cols[0], *cols[1:])
    )
    if sort:
        writer = writer.sortBy(cols[0], *cols[1:])
    writer.saveAsTable(table)
    return df.sparkSession.table(table)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on,
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed tables; with equal bucket counts on the join
    keys the physical plan carries no Exchange on either input."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
