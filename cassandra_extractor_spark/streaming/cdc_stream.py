"""Streaming CDC materialized view — the streaming twin of batch
``cdc_apply`` (operators/relational.py, the MERGE-INTO shape): a
change stream continuously maintains a latest-row-per-key snapshot.

Architecture — GENERATIONAL store, the third member of the replay-safe
store family (signature store: set-semantic, rollup store: partial-agg
partitions, CDC store: whole-snapshot generations):

- each micro-batch merges its changes against the current snapshot and
  writes a COMPLETE new snapshot to ``gen=<batch_id>`` — the current
  generation is the highest one with a ``_SUCCESS`` marker, so a
  half-written generation is invisible and a crash falls back to the
  previous snapshot;
- replay-idempotent BY ALGEBRA, not by bookkeeping: last-writer-wins
  over (order_cols) is idempotent — re-merging a batch into a snapshot
  that already reflects it reproduces the identical snapshot, so a
  replayed foreachBatch simply rewrites ``gen=<id>`` with the same
  bytes;
- OUT-OF-ORDER safe across batches: the store retains ``order_cols``
  and tombstones (op='D' rows), so a late-arriving STALE change loses
  the per-key ordering against what the store already holds — and a
  stale update can never resurrect a deleted key.  This is the reason
  the store keeps tombstones; purge them only past a lateness horizon
  you are prepared to enforce upstream;
- old generations are cleaned best-effort after each successful write
  (``retain_gens``); leftover generations after a crash are harmless
  (never read — only the max complete generation is).

100 TB posture: the merge is one window over |store keys| + |batch|
rows hashed on the key — at warehouse scale you bucket the store by
key so the merge shuffles only the batch (same discipline as the
signature store), and snapshot generations become a table-format
concern (Delta/Iceberg do exactly this dance with manifests); this
module is the format-free spelling of that contract.
"""

from __future__ import annotations

import os
import shutil
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F
from pyspark.sql.streaming import StreamingQuery


def _complete_gens(store_dir: str) -> list[int]:
    if not os.path.isdir(store_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(store_dir)
        if d.startswith("gen=")
        and os.path.exists(os.path.join(store_dir, d, "_SUCCESS"))
    )


def _read_current(spark: SparkSession, store_dir: str) -> DataFrame | None:
    gens = _complete_gens(store_dir)
    if not gens:
        return None
    return spark.read.parquet(os.path.join(store_dir, f"gen={gens[-1]}"))


def init_cdc_store(
    spark: SparkSession,
    base: DataFrame,
    store_dir: str,
    op_col: str,
    order_cols: Sequence[str],
) -> None:
    """Seed generation −1 from a base snapshot.  The caller supplies
    ``order_cols`` values older than any change that will ever arrive
    (epoch zero / sentinel), so every real change outranks the seed."""
    base.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(store_dir, "gen=-1")
    )


def merge_cdc_batch(
    store: DataFrame | None,
    changes: DataFrame,
    key: str,
    order_cols: Sequence[str],
    op_col: str,
    payload_cols: Sequence[str],
) -> DataFrame:
    """Last-writer-wins merge of a change batch into a snapshot —
    pure-DataFrame, idempotent (merging a batch twice is a no-op), and
    stale-proof (the snapshot's retained order_cols win against older
    late arrivals; tombstones outrank stale updates the same way)."""
    cols = [key, op_col, *order_cols, *payload_cols]
    all_rows = changes.select(*cols)
    if store is not None:
        all_rows = store.select(*cols).unionByName(all_rows)
    w = W.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        all_rows.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def stream_cdc_apply(
    spark: SparkSession,
    source_path: str,
    schema: str,
    store_dir: str,
    checkpoint_dir: str,
    key: str,
    order_cols: Sequence[str],
    op_col: str = "op",
    payload_cols: Sequence[str] = (),
    max_files_per_trigger: int = 1,
    retain_gens: int = 3,
) -> StreamingQuery:
    """Maintain the CDC snapshot over a file source of change batches.
    Drains everything available (``availableNow``) then stops;
    restarting with the same ``checkpoint_dir`` resumes after the last
    committed batch."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", "*.parquet")
        .parquet(source_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        merged = merge_cdc_batch(
            _read_current(spark, store_dir),
            batch_df,
            key,
            order_cols,
            op_col,
            payload_cols,
        )
        merged.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(store_dir, f"gen={batch_id}")
        )
        # best-effort cleanup: never the generation just written, never
        # the previous complete one (crash fallback)
        for g in _complete_gens(store_dir)[:-retain_gens] if retain_gens else []:
            if g != batch_id:
                shutil.rmtree(
                    os.path.join(store_dir, f"gen={g}"), ignore_errors=True
                )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def read_cdc_view(
    spark: SparkSession, store_dir: str, op_col: str = "op"
) -> DataFrame:
    """The served materialized view: the current snapshot minus
    tombstones (tombstones stay IN the store to fence stale late
    arrivals; they leave only through an explicit horizon purge)."""
    cur = _read_current(spark, store_dir)
    if cur is None:
        raise FileNotFoundError(f"no complete generation under {store_dir}")
    return cur.where(F.col(op_col) != "D")
