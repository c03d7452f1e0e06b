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


MIX_BUDGET_FRAC = 0.5  #: sampled corpus targets this fraction of all tokens


def ns_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling: down-sample each source so the sampled corpus
    hits per-source token-budget targets — the "data mixing" step that
    turns a raw crawl into a training mixture with chosen domain
    weights.

    Weights are md5-derived per source name (deterministic,
    non-uniform, engine-portable); each source's target is
    ``budget × wᵢ/Σw`` tokens with ``budget = 50%`` of corpus tokens,
    and its keep-rate is ``min(1, target/tokensᵢ)`` applied as the
    repo's deterministic hash gate on doc_id.

    100 TB shape: per-source token totals are one map-side-combined
    aggregation to a FEW-ROW frame (one row per source/domain —
    thousands at web scale, never corpus-sized); the rate table then
    broadcast-joins back and the gate is a codegen'd filter in the scan
    stage.  Two passes over the corpus, zero corpus-sized shuffles, no
    driver collect.
    """
    from cassandra_extractor_spark.operators.text import tokens

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    per_src = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    weights = per_src.select(
        "source",
        "src_tokens",
        (F.lit(1) + _md5_hash64(F.col("source"), "mixw") % 4).cast("double").alias("w"),
    )
    totals = weights.agg(
        F.sum("src_tokens").alias("total_tokens"), F.sum("w").alias("wsum")
    )
    rates = weights.crossJoin(F.broadcast(totals)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(MIX_BUDGET_FRAC)
            * F.col("total_tokens").cast("double")
            * F.col("w")
            / F.col("wsum")
            / F.col("src_tokens").cast("double"),
        ).alias("rate"),
    )
    kept = (
        d.join(F.broadcast(rates), "source")
        .where(
            _md5_hash64(F.col("doc_id").cast("string"), "mix") % 1_000_000
            < F.floor(F.col("rate") * 1_000_000)
        )
    )
    return (
        kept.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("kept_tokens"),
        )
        .orderBy("source")
    )


#: per-source selection size for ns_topk_per_source
TOPK_PER_SOURCE = 10


def ns_topk_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-of-source selection: the top-k documents per source by
    length (stand-in for any per-doc score), deterministic tie-break by
    doc_id — the "keep the N best pages per domain" stage of a crawl
    curation pipeline.

    100 TB shape: a PARTITIONED row_number window — one hash exchange
    on source + per-partition sort; no global ordering anywhere.  Skew
    note: a pathological mega-domain still sorts on one partition; cap
    it by pre-filtering with a per-source approx threshold
    (approx_percentile broadcast back, as in ns_quality_classifier)
    before ranking when domains exceed executor memory.
    """
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.sources.catalog import load_table

    d = load_table(spark, "documents", sf_dir)
    w = W.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= TOPK_PER_SOURCE)
        .orderBy("source", "rk")
    )
