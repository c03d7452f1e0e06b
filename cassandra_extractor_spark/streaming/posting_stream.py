"""Streaming inverted-index (posting store) maintenance: arriving
document batches are exploded into (doc_id, term, tf) postings and
appended as delta files; conjunctive (AND) retrieval joins the query's
terms against the TERM-BUCKETED base store without ever re-exploding
or re-shuffling the corpus.

Third member of the incremental-store trio — same base-plus-delta
discipline as the LSH signature store (``streaming/dedup_stream.py``)
and the IVF cell store (``streaming/ann_stream.py``), applied to the
retrieval surface (batch spelling: ``operators/text.ns_boolean_
retrieval``).  Reference parity: the reference's only search path is
pushing a Solr query string to DSE (`ref:datacrawler.py:138-151`);
this is the engine-side index a corpus without a search backend
maintains itself.

100 TB shape:

- the BASE store is bucketed+sorted on the term (``write_posting_
  store``): a term-equality query prunes to the matching buckets at
  scan time (``SelectedBucketsCount`` in the plan — asserted in the
  tests) and never shuffles the store;
- each micro-batch explodes ONLY its own documents — O(batch tokens),
  map-side combined — and lands in an overwrite-own ``batch=<id>``
  delta directory (replay-safe, same contract as the other stores);
- compaction folds delta postings back into the bucketed base between
  streaming restarts.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.utils import AnalysisException

_POSTING_COLS = ["doc_id", "tok", "tf"]


def build_postings(docs: DataFrame) -> DataFrame:
    """(doc_id, tok, tf) from a (doc_id, text) frame — one explode +
    one map-side-combined aggregate; the shared tokenizer, so the
    store agrees with every batch text operator."""
    from cassandra_extractor_spark.operators.text import tokens

    return (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .where(F.col("tok") != "")
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
    )


def write_posting_store(postings: DataFrame, table_name: str, n_buckets: int = 16) -> None:
    """Persist postings bucketed+sorted on the term: term-equality
    retrieval prunes to matching buckets and a term-keyed join against
    the store is exchange-free on the store side — the same write-once
    shuffle amortization as the LSH signature store."""
    from cassandra_extractor_spark.operators.scale import write_bucketed

    write_bucketed(
        postings.select(*_POSTING_COLS), table_name, ["tok"], n_buckets, sort_cols=["tok"]
    )


def stream_posting_ingest(
    spark: SparkSession,
    source_path: str,
    schema: str,
    delta_dir: str,
    checkpoint_dir: str,
    stats_sink: Callable[[DataFrame, int], None] | None = None,
    max_files_per_trigger: int = 1,
    path_glob: str = "*.parquet",
) -> StreamingQuery:
    """Start the streaming posting ingest over a file source of
    ``(doc_id, text)`` batches.  Drains everything available
    (``availableNow``) then stops; restarting with the same
    ``checkpoint_dir`` resumes after the last committed batch.

    ``stats_sink(df, batch_id)``, if given, receives (n_docs,
    n_postings) per batch for ingest monitoring."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .option("pathGlobFilter", path_glob)
        .parquet(source_path)
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        postings = build_postings(batch_df)
        (
            postings.select(*_POSTING_COLS)
            .write.mode("overwrite")
            .parquet(f"{delta_dir}/batch={batch_id}")
        )
        if stats_sink is not None:
            stats_sink(
                postings.agg(
                    F.countDistinct("doc_id").alias("n_docs"),
                    F.count("*").alias("n_postings"),
                ),
                batch_id,
            )

    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _read_postings(spark: SparkSession, store_table: str, delta_dir: str) -> DataFrame:
    base = spark.table(store_table).select(*_POSTING_COLS)
    try:
        delta = spark.read.parquet(delta_dir).select(*_POSTING_COLS)
    except AnalysisException:
        return base
    return base.unionByName(delta)


def boolean_query_against_store(
    spark: SparkSession,
    store_table: str,
    delta_dir: str,
    terms: tuple[str, ...],
) -> DataFrame:
    """(doc_id, tf_total, tf_min): documents containing EVERY query
    term — the store-backed spelling of ``ns_boolean_retrieval``
    (row-identical over the same corpus; pinned by the parity test).
    The base-side term filter is a bucket-pruned scan (bucketed on
    tok); the delta side is small by construction.  The MAX per
    (doc, term) collapse makes the read immune to the one legal
    duplicate source — a crash between compaction's two phases leaves
    the same posting in base AND delta with an identical tf, so MAX
    is the identity on healthy data and the fix on crashed data
    (a corpus doc is append-once by contract, as in the dedup store)."""
    # Spark's DisableUnnecessaryBucketedScan rule turns OFF bucketed
    # reading for filter-only plans (no downstream join/agg needs the
    # bucket partitioning) — which also forfeits bucket PRUNING, the
    # entire point of this store's layout: a 3-term query should read
    # ≤3 of n_buckets bucket file groups, not the whole index.  The
    # rule reads the conf at execution time, so it must stay set for
    # the returned lazy frame; tables that benefit from auto-disable
    # (joins on bucket keys) keep their bucketed scans either way.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    p = _read_postings(spark, store_table, delta_dir).where(F.col("tok").isin(*terms))
    per_term = p.groupBy("doc_id", "tok").agg(F.max("tf").alias("tf"))
    return (
        per_term.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_terms"),
            F.sum("tf").cast("long").alias("tf_total"),
            F.min("tf").cast("long").alias("tf_min"),
        )
        .where(F.col("n_terms") == len(terms))
        .select("doc_id", "tf_total", "tf_min")
        .orderBy("doc_id")
    )


def compact_posting_store(
    spark: SparkSession, store_table: str, delta_dir: str, n_buckets: int = 16
) -> int:
    """Fold the delta into the bucketed base.  Idempotent under the
    crash window (base committed, delta not yet removed): the merge
    dedupes on (doc_id, tok) keeping MAX(tf) — re-absorbing an
    already-folded batch changes nothing, because a given (doc, term)
    posting is identical in both copies.  Returns delta posting rows
    absorbed (0 = nothing to do)."""
    import shutil

    try:
        delta = spark.read.parquet(delta_dir).select(*_POSTING_COLS)
    except AnalysisException:
        return 0
    absorbed = delta.count()
    if absorbed == 0:
        return 0
    merged = (
        spark.table(store_table)
        .select(*_POSTING_COLS)
        .unionByName(delta)
        .groupBy("doc_id", "tok")
        .agg(F.max("tf").cast("long").alias("tf"))
        .localCheckpoint(eager=True)
    )
    write_posting_store(merged, store_table, n_buckets=n_buckets)
    shutil.rmtree(delta_dir, ignore_errors=True)
    return absorbed
