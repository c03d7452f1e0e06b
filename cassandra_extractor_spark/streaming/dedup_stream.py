"""Streaming incremental near-dup gate: arriving document batches are
checked against the persisted LSH signature store WITHOUT ever
re-signing or re-shuffling the corpus.

This is the streaming spelling of
``operators.dedup.incremental_dedup_against_store`` (reference parity:
the extractor's incremental crawl loop, `datacrawler.py`, re-reads
only rows past the modified-ts high-water mark — here the analogous
"only new work" contract applies to near-dup detection).

Architecture — base store + per-batch delta, the production shape at
100 TB:

- the BASE store is the bucketed, sorted signature table written once
  by ``write_signature_store`` (store-side bucket join is
  exchange-free — plan-asserted in ``tests/test_scale.py``);
- each micro-batch signs ONLY its own documents, joins them against
  base ∪ delta, and then absorbs its bands into a ``batch=<id>``
  partition directory under ``delta_dir``;
- replay safety: foreachBatch may re-run a batch after a crash.  The
  batch OVERWRITES its own partition (never appends), and the delta
  read EXCLUDES the current batch id, so a half-written earlier
  attempt can neither duplicate store rows nor leak into its own
  candidate set.  The pairs sink receives ``batch_id`` and must be
  idempotent per batch — the standard foreachBatch contract;
- periodic compaction (outside this query) folds the delta back into
  the bucketed base via ``write_signature_store(base ∪ delta)``.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

from cassandra_extractor_spark.operators.dedup import incremental_dedup

_BAND_COLS = ["doc_id", "band", "sig"]


def stream_incremental_dedup(
    spark: SparkSession,
    source_path: str,
    schema: str,
    store_table: str,
    delta_dir: str,
    pairs_sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    max_files_per_trigger: int = 1,
    path_glob: str = "*.parquet",
    auto_compact: dict | None = None,
) -> StreamingQuery:
    """Start the streaming dedup gate over a file source of
    ``(doc_id, text)`` batches.  Drains everything available
    (``availableNow``) then stops; restarting with the same
    ``checkpoint_dir`` resumes exactly after the last committed batch.

    ``pairs_sink(dup_pairs_df, batch_id)`` receives, per micro-batch,
    the (new_id, dup_of) frame where ``dup_of`` may come from the base
    corpus, an earlier streamed batch (via the delta), or an earlier
    document of the same batch.

    ``auto_compact`` (off by default) runs the control plane's
    size-ratio policy in-band every ``every_n_batches`` (default 8)
    batches and folds the band delta into the bucketed base when
    crossed (keys: ``every_n_batches``, ``threshold``, ``n_buckets``;
    see ``streaming/maintenance.py`` for the mid-stream safety
    argument — the candidate join is set-semantic, so the crash
    window's base∪delta duplicates cannot duplicate pairs).
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", path_glob)
        .parquet(source_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        base = spark.table(store_table).select(*_BAND_COLS)
        try:
            delta = (
                spark.read.parquet(delta_dir)
                .where(F.col("batch") != batch_id)
                .select(*_BAND_COLS)
            )
            base = base.unionByName(delta)
        except AnalysisException:
            pass  # no delta yet (first batch)
        pairs, new_bands = incremental_dedup(base, batch_df)
        pairs_sink(pairs, batch_id)
        (
            new_bands.select(*_BAND_COLS)
            .write.mode("overwrite")
            .parquet(f"{delta_dir}/batch={batch_id}")
        )
        from cassandra_extractor_spark.streaming.maintenance import (
            batch_due,
            maybe_compact_signature,
        )

        if batch_due(auto_compact, batch_id):
            maybe_compact_signature(
                spark,
                store_table,
                delta_dir,
                threshold=float(auto_compact.get("threshold", 0.2)),
                n_buckets=int(auto_compact.get("n_buckets", 16)),
            )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def compact_signature_store(
    spark: SparkSession,
    store_table: str,
    delta_dir: str,
    n_buckets: int = 16,
) -> int:
    """Fold the streaming delta back into the bucketed base store —
    the periodic maintenance job that keeps the store-side bucket join
    exchange-free as the streamed corpus grows.

    Reads base ∪ delta, rewrites the store with the SAME bucket spec
    (one full shuffle, amortized across every future batch join), and
    removes the absorbed delta partitions.  Safe to run between
    streaming query restarts, or in-band from the SAME query's
    ``foreachBatch`` hook (``auto_compact`` →
    ``maintenance.maybe_compact_signature``): micro-batches never
    overlap within one query, so an in-hook fold is exactly as
    isolated as one run between restarts (full safety argument in
    ``streaming/maintenance.py``).  Only EXTERNAL concurrent
    invocation — a separate process folding while an active query
    appends ``batch=<id>`` partitions — remains forbidden.  Returns the
    number of delta band rows absorbed (0 = nothing to do, store
    untouched).
    """
    from cassandra_extractor_spark.operators.dedup import write_signature_store

    try:
        delta = spark.read.parquet(delta_dir).select(*_BAND_COLS)
    except AnalysisException:
        return 0
    absorbed = delta.count()
    if absorbed == 0:
        return 0
    # .distinct() makes the fold SELF-HEALING across the crash window:
    # re-absorbing a delta whose band rows already reached the base
    # (fold committed, delta removal crashed, batch replayed) collapses
    # the duplicates instead of carrying them in the base forever —
    # band rows are set-semantic by the store's contract
    merged = (
        spark.table(store_table)
        .select(*_BAND_COLS)
        .unionByName(delta)
        .distinct()
    )
    # two-phase rename-free rewrite: the store table swaps atomically at
    # the saveAsTable commit; the delta is removed only afterwards, so a
    # crash between the two steps leaves duplicate bands (harmless: the
    # candidate join is set-semantic, pairs go through .distinct())
    staged = merged.localCheckpoint(eager=True)
    write_signature_store(staged, store_table, n_buckets=n_buckets)
    import shutil

    shutil.rmtree(delta_dir, ignore_errors=True)
    return absorbed
