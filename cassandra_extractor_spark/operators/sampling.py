"""Deterministic hash-based sampling — the corpus-subsetting primitive
a training-data pipeline needs (reproducible train/eval splits,
down-sampling over-represented strata).

``TABLESAMPLE``/``df.sample`` are RNG-based: not reproducible across
engines, partitionings, or reruns.  Hash-gating on a stable key is
reproducible everywhere, embarrassingly parallel (a codegen'd filter in
the scan stage — no shuffle, no state), and composable with any later
dedup/quality stage.  The hash is the repo's portable md5-derived
60-bit hash (dedup.py), bit-identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cassandra_extractor_spark.operators.dedup import _md5_hash64
from cassandra_extractor_spark.sources.catalog import load_table


def sample_by_hash(df: DataFrame, key, rate_permille: int, salt: str = "smp") -> DataFrame:
    """Keep ≈``rate_permille``/1000 of rows, chosen by a deterministic
    hash of ``key`` — same rows on every engine, partitioning, and rerun.
    Changing ``salt`` draws an independent sample (disjoint-ish splits:
    gate on ranges of the same hash instead)."""
    gate = _md5_hash64(F.col(key).cast("string"), salt) % 1000 < rate_permille
    return df.where(gate)


def ns_sample_uniform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible 10% document sample: a pushdown-friendly filter —
    zero shuffles, no RNG state, identical on any cluster size."""
    docs = load_table(spark, "documents", sf_dir)
    return sample_by_hash(docs, "doc_id", 100).select("doc_id").orderBy("doc_id")


def split_by_hash(df: DataFrame, key, splits: dict[str, int], salt: str = "split") -> DataFrame:
    """Assign every row to a named split by hash range — the
    train/val/test partitioner.  ``splits`` maps name → permille width
    (must sum to 1000); ranges are contiguous in dict order, so adding
    documents never moves an existing one between splits."""
    if sum(splits.values()) != 1000:
        raise ValueError(f"split widths must sum to 1000, got {splits}")
    h = _md5_hash64(F.col(key).cast("string"), salt) % 1000
    expr, lo = None, 0
    for name, width in splits.items():
        cond = h < F.lit(lo + width)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += width
    return df.withColumn("split", expr)


def ns_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """90/5/5 train/val/test assignment over documents, summarized per
    split — one scan, no shuffle beyond the 3-group aggregate."""
    docs = load_table(spark, "documents", sf_dir)
    out = split_by_hash(docs, "doc_id", {"train": 900, "val": 50, "test": 50})
    return out.groupBy("split").agg(F.count("*").alias("n")).orderBy("split")


def ns_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified down-sampling: per-stratum rates (clicks kept at 20%,
    everything else at 5%) applied in one scan — the rebalancing step
    that equalizes over-represented event types before training."""
    ev = load_table(spark, "events", sf_dir)
    rate = F.when(F.col("event_type") == "click", 200).otherwise(50)
    kept = ev.where(_md5_hash64(F.col("event_id").cast("string"), "strat") % 1000 < rate)
    return (
        kept.groupBy("event_type")
        .agg(F.count("*").alias("n_sampled"))
        .orderBy("event_type")
    )
