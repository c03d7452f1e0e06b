"""Streaming incremental rollup — the streaming twin of batch
``q98_incremental_rollup`` (operators/relational.py): a continuously
maintained aggregate where each micro-batch contributes ONE partial
aggregate and the served rollup is the associative merge of all
partials.  Same partial-merge algebra as ``incremental_agg_merge``
(counts and sums are associative; avg re-derives), lifted from
cross-job to cross-micro-batch granularity.

Architecture — partial-agg store with per-batch partitions, the same
replay-safe layout as ``dedup_stream``'s signature delta:

- each micro-batch aggregates ONLY its own rows (O(batch), never
  O(history)) and OVERWRITES its ``batch=<id>`` partition — a crashed
  and replayed batch rewrites the identical partial instead of
  double-counting (foreachBatch may re-run the last uncommitted
  batch);
- the served rollup (``read_rollup``) merges the partial frames —
  O(|groups|·batches) rows, metadata-sized next to the event stream;
- ``compact_rollup`` folds all partials into one.  UNLIKE the
  signature store, duplicate rows here are NOT harmless (sums double-
  count), so compaction writes a NEW directory and the caller swaps
  it in atomically (os.rename) — never an in-place rewrite, and only
  while the stream is stopped after a clean drain (a clean
  availableNow drain commits every batch, so no replay can resurrect
  an absorbed partition).

100 TB posture: the per-batch partial is a map-side-combined
aggregate of the arriving slice; history is touched only at read
(tiny) or compaction (|groups|·batches, still tiny).  The reference
has no aggregation at all (SURVEY §2.5); this is the continuous-
aggregate shape TimescaleDB/Materialize users expect, on Spark
micro-batches.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery


def rollup_partial(df: DataFrame, keys: Sequence[str], cents_col: str) -> DataFrame:
    """One batch's partial aggregate: (keys..., n, sum_cents).  Long
    cent sums are exact and associative — the merge order across
    batches/partitions cannot change the result (same rationale as the
    batch rollup's integer-cents discipline)."""
    return df.groupBy(*keys).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(cents_col).cast("long")).alias("sum_cents"),
    )


def stream_incremental_rollup(
    spark: SparkSession,
    source_path: str,
    schema: str,
    store_dir: str,
    checkpoint_dir: str,
    keys: Sequence[str] = ("event_type",),
    cents_col: str = "cents",
    max_files_per_trigger: int = 1,
) -> StreamingQuery:
    """Maintain the rollup store over a file source.  Drains everything
    available (``availableNow``) then stops; restarting with the same
    ``checkpoint_dir`` resumes exactly after the last committed batch,
    so each landed file contributes to exactly one partial partition.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_path)
    )
    keys = list(keys)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        (
            rollup_partial(batch_df, keys, cents_col)
            .coalesce(1)  # |groups| rows — one small file per batch
            .write.mode("overwrite")
            .parquet(f"{store_dir}/batch={batch_id}")
        )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_rollup(spark: SparkSession, store_dir: str, keys: Sequence[str]) -> DataFrame:
    """The served continuous aggregate: merge every batch partial.
    Identical algebra to ``incremental_agg_merge`` generalized to N
    partials — one groupBy over a metadata-sized frame."""
    parts = spark.read.parquet(store_dir)
    return (
        parts.groupBy(*keys)
        .agg(
            F.sum("n").cast("long").alias("n"),
            F.sum("sum_cents").cast("long").alias("sum_cents"),
        )
        .orderBy(*keys)
    )


def compact_rollup(
    spark: SparkSession, store_dir: str, compacted_dir: str, keys: Sequence[str]
) -> str:
    """Fold all batch partials into one partition, written to a NEW
    directory (``compacted_dir`` must not exist).  The caller swaps it
    in — ``os.rename`` after stopping the stream — so a crash mid-
    compaction leaves the live store untouched (an in-place rewrite
    could double-count: unlike the set-semantic signature store, sums
    are not idempotent under duplicated rows).  Returns the path
    written.  Only run after a clean availableNow drain: every batch
    is then checkpoint-committed and no replay can rewrite an absorbed
    ``batch=<id>`` partition.
    """
    if os.path.exists(compacted_dir):
        raise ValueError(f"compacted_dir already exists: {compacted_dir}")
    merged = read_rollup(spark, store_dir, keys)
    merged.coalesce(1).write.parquet(f"{compacted_dir}/batch=-1")
    return compacted_dir
