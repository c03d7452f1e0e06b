"""End-to-end extraction pipeline queries — the reference's core flow
(scan → table-spec transforms → serialized output) as one DataFrame
lineage, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from cassandra_extractor_spark.functions.tablespecs import TableSpec, apply_table_spec
from cassandra_extractor_spark.sources.catalog import load_table

def ns_corpus_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-corpus selection — the flagship LLM-data
    pipeline: keep documents that (a) pass the quality score, (b) have
    enough tokens, and (c) survive near-dup removal (MinHash-LSH
    clusters keep only the lowest doc_id per cluster).

    Composes ns_text_quality + ns_dedup_clusters; each stage is the
    scale-shaped implementation documented on its operator.
    """
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.operators.dedup import ns_dedup_clusters
    from cassandra_extractor_spark.operators.text import shared_text_quality

    quality = shared_text_quality(spark, sf_dir)
    clusters = ns_dedup_clusters(spark, sf_dir)
    dropped = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return (
        quality.where((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 50))
        .join(dropped, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "quality")
        .orderBy("doc_id")
    )


def ns_corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus composition report: per (source, lang) doc counts, token
    totals, and summed quality — the audit table a training-data
    pipeline publishes per snapshot.  Quality sums go through
    DECIMAL(18,6) so the aggregate is order-independent (correct under
    any partitioning) and oracle-exact."""
    from cassandra_extractor_spark.operators.text import shared_text_quality

    quality = shared_text_quality(spark, sf_dir)
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "lang")
    return (
        docs.join(quality, "doc_id")
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.round(F.sum(F.col("quality").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("sum_quality"),
        )
        .orderBy("source", "lang")
    )


#: the FIXTURES.md representative table spec (reference worker.py:110-162)
EVENTS_TABLE_SPEC = {
    "columns": [
        {"name": "event_id", "renameTo": "id"},
        {"name": "props", "convertTo": "object", "schema": "k bigint"},
        {
            "name": "ts",
            "convertTo": "timestamp",
            "timestamp_format": "%Y-%m-%d %H:%M:%S.%f%z",
        },
        {"name": "user_id", "remove": True},
    ]
}


def ns_tablespec_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full per-row transform pipeline on events:
    rename event_id→id, parse props JSON, ts→epoch millis, drop
    user_id — compiled to a single Catalyst projection.

    The timestamp arrives as a native timestamp here (the reference gets
    strings out of Cassandra's JSON; `convertTo:"timestamp"` parses then
    emits epoch millis — same target semantics, worker.py:146-148), so
    the spec's convert is expressed on a pre-rendered string column to
    exercise the exact strptime path.
    """
    ev = load_table(spark, "events", sf_dir).withColumn(
        # render the reference's wire format: string with µs + offset
        "ts",
        F.concat(F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"), F.lit("Z")),
    )
    out = apply_table_spec(ev, TableSpec.from_dict(EVENTS_TABLE_SPEC))
    return out.select(
        "id",
        F.col("ts").alias("ts_ms"),
        "event_type",
        "value",
        F.col("props.k").cast("long").alias("props_k"),
    ).orderBy("id")


SEQ_BUDGET = 512  #: tokens per packed training sequence


def ns_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing: concatenate documents (in doc_id order,
    per source shard) into fixed ``SEQ_BUDGET``-token training
    sequences, emitting each document's sequence id and starting
    offset — the step that turns a curated corpus into fixed-length
    pretraining samples.

    All-integer arithmetic over one partitioned running-sum window:
    ``seq_id = (cumulative tokens before this doc) div budget``.
    100 TB shape: the window partitions by source shard (real
    pipelines pack per shard/file, never globally), so this is one
    shuffle on source and a linear in-partition scan — no global sort,
    no Python.
    """
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.operators.text import tokens

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    w = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    start = cum - F.col("n_tokens")
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / SEQ_BUDGET).cast("long").alias("seq_id"),
        (start % SEQ_BUDGET).cast("long").alias("seq_offset"),
    ).orderBy("doc_id")


def ns_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full training-data pipeline, end to end: documents that pass
    the heuristic quality gate, survive MinHash-LSH near-dup removal
    (`ns_corpus_select`), pass the Gopher repetition filter AND the
    hashed-vocab classifier, packed greedily into fixed-length training
    sequences per source shard (`ns_sequence_pack` semantics over the
    surviving set).

    This is the "run the whole thing" query a pipeline user executes
    nightly.  Every stage is the scale-shaped implementation documented
    on its operator; the composition adds only broadcast-joinable
    doc_id keep-lists between stages — no new corpus-sized shuffles.
    The repetition filter and the classifier aggregate ONE shared
    materialized ``token_stream`` (posexplode + lead, built once)
    instead of exploding the corpus independently — same outputs as the
    standalone operators, one token pipeline instead of two.
    """
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.operators.dedup import ns_dedup_clusters
    from cassandra_extractor_spark.operators.text import (
        ns_quality_classifier,
        shared_rep_flags,
        shared_text_quality,
        tokens,
    )

    quality = shared_text_quality(spark, sf_dir).where(
        (F.col("quality") >= 0.5) & (F.col("n_tokens") >= 50)
    )
    clusters = ns_dedup_clusters(spark, sf_dir)
    dropped = clusters.where(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    # all three gates read session-shared materialized frames (r14):
    # quality + repetition verdicts + classifier scores are each built
    # once per session, so this pipeline's marginal cost is the
    # keep-list joins + the packing window
    rep = shared_rep_flags(spark, sf_dir).where(F.col("keep")).select("doc_id")
    clf = ns_quality_classifier(spark, sf_dir).where(F.col("keep")).select("doc_id")
    # n_tokens rides along from the quality pass — identical expression
    # (size(tokens(text)) cast long in ns_text_quality), so re-deriving
    # it here re-tokenized the corpus a second time for nothing
    # (optimization r13, guide §1.2); the documents scan below prunes
    # to (doc_id, source)
    surv = (
        quality.select("doc_id", "n_tokens")
        .join(dropped, "doc_id", "left_anti")
        .join(rep, "doc_id")
        .join(clf, "doc_id")
    )
    d = (
        load_table(spark, "documents", sf_dir)
        .select("doc_id", "source")
        .join(surv, "doc_id")
    )
    w = W.partitionBy("source").orderBy("doc_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    start = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.floor(start / SEQ_BUDGET).cast("long").alias("seq_id"),
        (start % SEQ_BUDGET).cast("long").alias("seq_offset"),
    ).orderBy("doc_id")


def ns_pack_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-fragmentation audit over ``ns_sequence_pack``'s layout —
    the shard report a pretraining pipeline reads before committing a
    pack: per source shard, how many documents were SPLIT across a
    sequence boundary (``seq_offset + n_tokens > budget``: their
    context window is truncated mid-document), how many sequences the
    shard fills, and the split rate in ppm.  Contiguous packing wastes
    zero padding by construction, so fragmentation is the quantity to
    audit (the padding-vs-fragmentation trade is exactly why packers
    choose contiguous vs padded layouts).

    Pure-integer output; one map-side-combined aggregate over the pack
    frame — the pack itself is the one windowed pass documented on
    ``ns_sequence_pack``.
    """
    pack = ns_sequence_pack(spark, sf_dir)
    return (
        pack.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            (F.max("seq_id") + 1).cast("long").alias("n_seqs"),
            F.sum(
                (F.col("seq_offset") + F.col("n_tokens") > SEQ_BUDGET).cast("long")
            ).alias("n_split_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
        )
        .withColumn(
            "split_ppm",
            F.expr("div(n_split_docs * 1000000, n_docs)"),
        )
        .orderBy("source")
    )


#: the "previous snapshot" horizon for ns_corpus_diff (docs below this
#: id stand in for yesterday's crawl; a real run reads two snapshots)
DIFF_OLD_DOCS = 400


def ns_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — the incremental-crawl bookkeeping step: which
    documents are NEW since the previous snapshot, which CHANGED
    (same doc_id, different content fingerprint), which are UNCHANGED.
    Downstream stages (dedup, classifier) then run on new+changed only.

    Modeled here as old = docs with doc_id < DIFF_OLD_DOCS whose text
    is reversed when doc_id % 7 == 0 (deterministic mutation so CHANGED
    is non-empty on synthetic data); production passes two real
    snapshot frames.  100 TB shape: fingerprints are map-only md5s;
    the diff is one full outer join on doc_id — shuffle on the join
    key, or ZERO shuffle when both snapshots are bucketed by doc_id
    (the recommended table layout for nightly diffs).
    """
    from cassandra_extractor_spark.operators.text import doc_fingerprint_col

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    old = d.where(F.col("doc_id") < DIFF_OLD_DOCS).select(
        "doc_id",
        doc_fingerprint_col(
            F.when(F.col("doc_id") % 7 == 0, F.reverse(F.col("text"))).otherwise(
                F.col("text")
            )
        ).alias("old_fp"),
    )
    new = d.select("doc_id", doc_fingerprint_col(F.col("text")).alias("new_fp"))
    return (
        new.join(old, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.when(F.col("old_fp").isNull(), "added")
            .when(F.col("new_fp").isNull(), "removed")
            .when(F.col("old_fp") != F.col("new_fp"), "changed")
            .otherwise("unchanged")
            .alias("status"),
        )
        .orderBy("doc_id")
    )


def ns_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit table — the per-source validation report a
    pipeline publishes before training: row counts, null/empty text,
    metadata consistency (n_chars vs actual length), unexpected
    language codes, and token-length extremes.

    One scan, one map-side-combined aggregation per source: every
    metric is a conditional count in the same HashAggregate — the
    N-metrics-one-pass shape (no per-metric scans, no joins).
    """
    from cassandra_extractor_spark.operators.text import LANG_MARKERS, tokens

    d = load_table(spark, "documents", sf_dir)
    # NULL text must stay NULL (excluded from min/max on both engines):
    # bare F.size() yields -1 for NULL input under Spark's legacy
    # sizeOfNull default, while the oracle's MIN(len(...)) skips NULLs —
    # a latent divergence if a future corpus carries NULL text
    n_tok = F.when(F.col("text").isNotNull(), F.size(tokens(F.col("text"))))
    known = [F.lit(code) for code in LANG_MARKERS]
    return (
        d.groupBy("source")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0))
            .cast("long")
            .alias("n_empty_text"),
            F.sum(F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0))
            .cast("long")
            .alias("n_chars_mismatch"),
            F.sum(
                F.when(~F.col("lang").isin([c for c in LANG_MARKERS]), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_unknown_lang"),
            F.min(n_tok).cast("long").alias("min_tokens"),
            F.max(n_tok).cast("long").alias("max_tokens"),
        )
        .orderBy("source")
    )


def ns_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor — the nightly check that a new crawl
    snapshot hasn't shifted the corpus mix before it reaches training:
    per-language token-mass shares for the old vs new snapshot and each
    language's contribution to KL(new ‖ old).  A spike in ``kl_term``
    flags the language driving the drift; Σ kl_term is the headline
    drift number a pipeline alerts on.

    Modeling: old = doc_id < DIFF_OLD_DOCS (the ``ns_corpus_diff``
    snapshot convention); production passes two real snapshot frames.
    Laplace +1 smoothing keeps both distributions strictly positive, so
    the log is total.  100 TB shape: two map-side-combined aggregations
    over (lang) — output is languages × 1 rows; the arithmetic is
    integer counts → one fixed-order double expression, rounded at 6
    (the ``ns_ngram_pmi`` precedent for cross-engine ln parity).
    """
    from cassandra_extractor_spark.operators.text import shared_text_quality

    # per-doc token counts from the session quality frame (identical
    # size(tokens(text)) expression) joined to the pruned (doc_id,
    # lang) scan — the corpus text is never read here (optimization
    # r14, guide §1.2/§6: the old spelling tokenized the corpus to
    # count tokens this frame already carries)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang").join(
        shared_text_quality(spark, sf_dir).select(
            "doc_id", F.col("n_tokens").alias("n_tok")
        ),
        "doc_id",
    )
    counts = (
        d.groupBy("lang")
        .agg(
            F.sum(F.when(F.col("doc_id") < DIFF_OLD_DOCS, F.col("n_tok")).otherwise(0))
            .cast("long")
            .alias("tok_old"),
            F.sum("n_tok").cast("long").alias("tok_new"),
        )
    )
    # Laplace-smoothed totals are plan-time scalars: languages × 1 rows
    # upstream, so the two driver-side sums read a handful of rows
    tot = counts.agg(
        F.sum("tok_old").cast("long").alias("to"),
        F.sum("tok_new").cast("long").alias("tn"),
        F.count("*").cast("long").alias("k"),
    ).first()
    tot_old, tot_new, k = int(tot["to"]), int(tot["tn"]), int(tot["k"])
    p_old = (F.col("tok_old") + 1).cast("double") / F.lit(float(tot_old + k))
    p_new = (F.col("tok_new") + 1).cast("double") / F.lit(float(tot_new + k))
    return (
        counts.select(
            "lang",
            "tok_old",
            "tok_new",
            F.round(p_old, 6).alias("p_old"),
            F.round(p_new, 6).alias("p_new"),
            F.round(p_new * F.log(p_new / p_old), 6).alias("kl_term"),
        )
        .orderBy("lang")
    )


N_SHARDS = 16  #: output shards for the writer-layout query


def shard_assignment(key, n_shards: int = N_SHARDS):
    """Deterministic shard id for a row key: the repo's portable md5
    hash mod ``n_shards`` — stable across engines, reruns, and cluster
    sizes (unlike ``spark_partition_id`` or round-robin repartition).
    Feed it to ``df.repartition(n_shards, shard_col)`` +
    ``partitionBy``/``bucketBy`` so re-runs land rows in the same
    output files (idempotent overwrite, diff-able exports)."""
    from cassandra_extractor_spark.operators.dedup import _md5_hash64

    return _md5_hash64(key.cast("string"), "shard") % n_shards


def ns_shard_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Writer shard layout report: size and token balance of the
    ``N_SHARDS`` deterministic output shards the corpus writer would
    produce — the pre-flight check before a 100 TB export (a skewed
    shard means a straggler task and an oversized output file).

    ``balance`` is each shard's token share relative to perfect
    uniformity (1.0 = exactly even); md5 keys keep it tight at any
    scale.  One map-side-combined aggregation to ``N_SHARDS`` rows; the
    totals join is a broadcast of one row.
    """
    from cassandra_extractor_spark.operators.text import tokens

    d = load_table(spark, "documents", sf_dir).select(
        "doc_id", F.size(tokens(F.col("text"))).cast("long").alias("n_tokens")
    )
    per_shard = (
        d.select(shard_assignment(F.col("doc_id")).alias("shard"), "n_tokens")
        .groupBy("shard")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("shard_tokens"))
    )
    totals = per_shard.agg(F.sum("shard_tokens").alias("total_tokens"))
    return (
        per_shard.crossJoin(F.broadcast(totals))
        .select(
            F.col("shard").cast("long").alias("shard"),
            "n_docs",
            "shard_tokens",
            F.round(
                F.col("shard_tokens").cast("double")
                * N_SHARDS
                / F.col("total_tokens"),
                6,
            ).alias("balance"),
        )
        .orderBy("shard")
    )


def ns_filter_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-loss funnel: survivor counts after each pipeline gate
    (quality → near-dup removal → repetition → classifier) — the first
    observability question of every corpus run ("where did my data
    go?"), as one query.  Mirrors ``ns_training_corpus``'s gate order.

    Every gate is evaluated ONCE: the four keep-sets left-join onto the
    doc spine as boolean flags, and all five survivor counts come out
    of a single conditional aggregate over that one flag frame (then
    ``stack`` to long form).  The naive spelling — one aggregate per
    stage over the composed frames — recomputes the LSH clustering
    three times and the quality pass four times; at any scale that
    multiplies the dominant cost by the number of stages for zero
    extra information.
    """
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.operators.dedup import ns_dedup_clusters
    from cassandra_extractor_spark.operators.text import (
        ns_quality_classifier,
        shared_rep_flags,
        shared_text_quality,
    )
    from cassandra_extractor_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    s1 = (
        shared_text_quality(spark, sf_dir)
        .where((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 50))
        .select("doc_id", F.lit(True).alias("q"))
    )
    dropped = (
        ns_dedup_clusters(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", F.lit(True).alias("dd"))
    )
    # every gate reads a session-shared materialized frame (r14):
    # quality, repetition verdicts and classifier scores are each built
    # once per session — the funnel's marginal cost is the flag joins
    # and one aggregate
    rep = (
        shared_rep_flags(spark, sf_dir)
        .where(F.col("keep"))
        .select("doc_id", F.lit(True).alias("r"))
    )
    clf = (
        ns_quality_classifier(spark, sf_dir)
        .where(F.col("keep"))
        .select("doc_id", F.lit(True).alias("c"))
    )
    flags = (
        docs.join(s1, "doc_id", "left")
        .join(dropped, "doc_id", "left")
        .join(rep, "doc_id", "left")
        .join(clf, "doc_id", "left")
    )
    keep1 = F.col("q").isNotNull()
    keep2 = keep1 & F.col("dd").isNull()
    keep3 = keep2 & F.col("r").isNotNull()
    keep4 = keep3 & F.col("c").isNotNull()
    cnt = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    wide = flags.agg(
        F.count("*").cast("long").alias("n0"),
        cnt(keep1).alias("n1"),
        cnt(keep2).alias("n2"),
        cnt(keep3).alias("n3"),
        cnt(keep4).alias("n4"),
    )
    return (
        wide.selectExpr(
            "stack(5, 0, 'total', n0, 1, 'quality', n1, 2, 'dedup', n2, "
            "3, 'repetition', n3, 4, 'classifier', n4) "
            "AS (stage, stage_name, n_docs)"
        )
        .select(F.col("stage").cast("long"), "stage_name", "n_docs")
        .orderBy("stage")
    )


def ns_gate_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa agreement between the two independent quality
    gates (heuristic score ≥ 0.5 ∧ ≥ 50 tokens vs the hashed-vocab
    classifier's median cut) — the "do my filters agree beyond
    chance?" audit run before trusting any single gate to prune a
    100 TB corpus.  Low kappa on high raw agreement means the gates
    mostly fire on base rates, not shared signal.

    Exactness: the 2×2 confusion counts are integers from ONE
    aggregate; observed/expected agreement and kappa are exact
    rationals — po/pe in ppm and kappa in 1e-6 units via the portable
    divr spelling (truncating div, half away from zero), so every
    output hashes identically cross-engine.  kappa is NULL when the
    marginals are degenerate (pe = 1 ⇒ denominator 0).

    100 TB shape: the gates are each one corpus pass (documented on
    their operators, sharing one materialized token stream here is
    unnecessary — the classifier is the only token-level gate); the
    confusion matrix is a map-side-combined aggregate to ONE row; all
    kappa arithmetic happens on that row.
    """
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.operators.relational import divr_sql
    from cassandra_extractor_spark.operators.text import (
        ns_quality_classifier,
        shared_text_quality,
    )
    from cassandra_extractor_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id")
    heur = (
        shared_text_quality(spark, sf_dir)
        .where((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 50))
        .select("doc_id", F.lit(True).alias("ga"))
    )
    clf = (
        ns_quality_classifier(spark, sf_dir)
        .where(F.col("keep"))
        .select("doc_id", F.lit(True).alias("gb"))
    )
    flags = (
        docs.join(heur, "doc_id", "left")
        .join(clf, "doc_id", "left")
        .select(
            F.coalesce(F.col("ga"), F.lit(False)).alias("ga"),
            F.coalesce(F.col("gb"), F.lit(False)).alias("gb"),
        )
    )
    cnt = lambda cond: F.sum(cond.cast("long"))  # noqa: E731
    conf = flags.agg(
        F.count("*").cast("long").alias("n_docs"),
        cnt(F.col("ga") & F.col("gb")).alias("n_both_keep"),
        cnt(F.col("ga") & ~F.col("gb")).alias("n_heuristic_only"),
        cnt(~F.col("ga") & F.col("gb")).alias("n_classifier_only"),
        cnt(~F.col("ga") & ~F.col("gb")).alias("n_both_drop"),
    )
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    prepped = (
        conf.withColumn("po_num", dec("n_both_keep") + dec("n_both_drop"))
        .withColumn(
            "pe_num",
            (dec("n_both_keep") + dec("n_heuristic_only"))
            * (dec("n_both_keep") + dec("n_classifier_only"))
            + (dec("n_both_drop") + dec("n_classifier_only"))
            * (dec("n_both_drop") + dec("n_heuristic_only")),
        )
        .withColumn("nn", dec("n_docs") * dec("n_docs"))
        .withColumn("knum", dec("n_docs") * F.col("po_num") - F.col("pe_num"))
        .withColumn("kden", F.col("nn") - F.col("pe_num"))
    )
    return prepped.select(
        "n_docs",
        "n_both_keep",
        "n_heuristic_only",
        "n_classifier_only",
        "n_both_drop",
        F.expr(divr_sql("po_num * 1000000", "n_docs")).cast("long").alias("po_ppm"),
        F.expr(divr_sql("pe_num * 1000000", "nn")).cast("long").alias("pe_ppm"),
        F.when(
            F.col("kden") > 0,
            F.expr(divr_sql("knum * 1000000", "kden")).cast("double")
            / F.lit(1_000_000.0),
        ).alias("kappa"),
    )


def ns_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/partition-key skew audit — the pre-flight check a 100 TB
    job runs before choosing a join strategy: per candidate key, the
    key cardinality, row volume, hottest-key count, and the discrete
    p50/p99 of the per-key count distribution.  ``max_cnt`` ≫
    ``p99_cnt`` is the signal to reach for q88's salting / AQE's skew
    split; ``n_keys`` vs broadcast threshold decides build-side
    strategy.

    Exactness: per-key counts are BIGINT; the distribution quantiles
    use the mergeable GK sketch at max accuracy (exact, == DuckDB
    ``quantile_disc`` — same spelling as q44b/q89), so every output
    cell is integer and order-independent.

    Scale shape: one map-side-combined groupBy per audited key, then a
    single-row sketch aggregate over the (much smaller) per-key count
    frame; the three audits are independent subtrees unioned at the
    end — no cross-key shuffle, nothing driver-side.
    """
    acc = 2147483647

    def profile(df: DataFrame, key_name: str, col: str) -> DataFrame:
        c = df.groupBy(col).agg(F.count("*").cast("long").alias("cnt"))
        return c.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.sum("cnt").alias("n_rows"),
            F.max("cnt").alias("max_cnt"),
            F.percentile_approx("cnt", 0.5, acc).alias("p50_cnt"),
            F.percentile_approx("cnt", 0.99, acc).alias("p99_cnt"),
        ).select(
            F.lit(key_name).alias("key"),
            "n_keys",
            "n_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
        )

    ev = load_table(spark, "events", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    li = load_table(spark, "lineitem", sf_dir)
    out = (
        profile(ev, "events.user_id", "user_id")
        .unionByName(profile(ev, "events.event_type", "event_type"))
        .unionByName(profile(orders, "orders.o_custkey", "o_custkey"))
        .unionByName(profile(li, "lineitem.l_orderkey", "l_orderkey"))
    )
    return out.orderBy("key")


ASSOC_MIN_SUPPORT = 3  #: minimum pair co-occurrence count
ASSOC_TOP = 100  #: rules reported


def ns_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining over order baskets: pairwise
    part co-occurrence with support and lift — the co-occurrence
    statistic behind "documents that share X also share Y" corpus
    curation and retrieval-augmentation heuristics.

    Scale shape (the Apriori property in DataFrame form): baskets are
    BOUNDED (a TPC-H order holds ~4-7 lines), so the within-basket
    pair self-join is O(basket²)·|orders| — linear in the corpus, not
    quadratic.  Item supports are a vocabulary-sized aggregate that
    broadcast-joins back onto the pair counts; the min-support filter
    prunes before the join.  Lift's integer inputs make the double
    division deterministic cross-engine.
    """
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.operators.dedup import materialize_once

    # items feeds FOUR consumers (n_orders, supports, both self-join
    # sides); Catalyst does not dedupe common subplans, so without
    # materialization the scan+distinct would run four times
    items = materialize_once(
        load_table(spark, "lineitem", sf_dir)
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_orders = items.select("l_orderkey").distinct().agg(
        F.count("*").cast("long").alias("n_orders")
    )
    # supp feeds BOTH broadcast sides (s1, s2); without materialization
    # the vocabulary aggregate over the corpus runs twice (two
    # Exchange+HashAggregate subtrees in the executed plan — r13
    # measured).  The aggregate output is vocabulary-sized (~|parts|),
    # so the checkpoint is tiny.
    supp = materialize_once(
        items.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    )
    a, b = items.alias("a"), items.alias("b")
    pair_counts = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count("*").cast("long").alias("c12"))
        .where(F.col("c12") >= ASSOC_MIN_SUPPORT)
    )
    s1 = supp.select(F.col("l_partkey").alias("p1"), F.col("c").alias("c1"))
    s2 = supp.select(F.col("l_partkey").alias("p2"), F.col("c").alias("c2"))
    lift = F.round(
        F.col("c12").cast("double")
        * F.col("n_orders").cast("double")
        / (F.col("c1").cast("double") * F.col("c2").cast("double")),
        6,
    )
    w = W.orderBy(F.col("lift").desc(), F.col("p1"), F.col("p2"))
    return (
        pair_counts.join(F.broadcast(s1), "p1")
        .join(F.broadcast(s2), "p2")
        .crossJoin(F.broadcast(n_orders))
        .select("p1", "p2", "c12", "c1", "c2", lift.alias("lift"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= ASSOC_TOP)
        .orderBy("rank")
    )


PREF_GAP_MILLI = 50  #: minimum chosen-rejected score gap (milli-units)
_PREF_ENC = 1_000_000_000_000  #: doc_id encoding base (doc_id < 10^12)


def ns_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair mining for reward-model / DPO training data:
    within each (lang, source) slice, pair the highest-scoring
    document (*chosen*) with the lowest-scoring one (*rejected*),
    keeping only slices whose quality gap clears ``PREF_GAP_MILLI`` —
    the standard "same distribution, different quality" construction
    for preference datasets.

    The score is a pure-integer heuristic (both terms map-side
    computable):
    ``(1000·distinct_tokens) div n_tokens + (1000·alpha_tokens) div
    n_tokens`` — vocabulary diversity plus alphabetic cleanliness,
    each in milli-units, engine-exact by integer division.

    100 TB shape: ONE map-side-combined groupBy — argmax/argmin ride
    inside ``max``/``min`` of an order-preserving integer encoding
    ``score·10^12 ± doc_id`` (associative, so partial aggregation
    combines freely; no window, no sort, no join).  Ties break to the
    smallest doc_id on both sides by construction of the encoding.
    """
    from cassandra_extractor_spark.operators.text import tokens

    from cassandra_extractor_spark.operators.similarity import in_encoding_contract

    d = load_table(spark, "documents", sf_dir).select(
        in_encoding_contract(
            F.col("doc_id"), 0, _PREF_ENC - 1, "doc_id"
        ).alias("doc_id"),
        "lang",
        "source",
        tokens(F.col("text")).alias("toks"),
    )
    feats = d.select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").cast("long").alias("n_tok"),
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.size(
            F.filter(F.col("toks"), lambda t: t.rlike("^[a-z]+$"))
        ).cast("long").alias("n_alpha"),
    ).where(F.col("n_tok") > 0)
    score = F.expr("(1000 * n_distinct) div n_tok + (1000 * n_alpha) div n_tok")
    enc = feats.select(
        "lang",
        "source",
        # max picks max score, then (ENC-1-doc_id) max ⇒ MIN doc_id;
        # min picks min score, then doc_id min ⇒ MIN doc_id
        (score * _PREF_ENC + (F.lit(_PREF_ENC - 1) - F.col("doc_id"))).alias(
            "best_key"
        ),
        (score * _PREF_ENC + F.col("doc_id")).alias("worst_key"),
    )
    agg = enc.groupBy("lang", "source").agg(
        F.max("best_key").alias("bk"), F.min("worst_key").alias("wk")
    )
    chosen_score = F.expr("bk div " + str(_PREF_ENC))
    rejected_score = F.expr("wk div " + str(_PREF_ENC))
    return (
        agg.select(
            "lang",
            "source",
            (F.lit(_PREF_ENC - 1) - F.expr(f"bk % {_PREF_ENC}")).alias("chosen_id"),
            F.expr(f"wk % {_PREF_ENC}").alias("rejected_id"),
            chosen_score.alias("chosen_score"),
            rejected_score.alias("rejected_score"),
            (chosen_score - rejected_score).alias("gap"),
        )
        .where(F.col("gap") >= PREF_GAP_MILLI)
        .orderBy("lang", "source")
    )


def ns_quality_by_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Joint quality × duplication forensics — "are my duplicates also
    my low-quality documents?"  Every document lands in one cell of
    (is_dup = member of a near-dup cluster) × (passes_gate = the
    corpus-select quality gate), with doc counts, token mass and summed
    quality per cell.  Off-diagonal mass is actionable: dup∧high-quality
    means canonical selection (keep one) recovers good tokens that
    blanket dedup would discard; unique∧low-quality means the quality
    gate — not dedup — is what's cutting the corpus.

    Composes the session-shared cluster map with the shared quality
    gate (same 0.5/50 thresholds as ``ns_corpus_select``, so the cells
    reconcile exactly with the flagship keep-list).  Scale shape: one
    broadcast-ish left join of the cluster membership onto the quality
    frame, one map-side-combined aggregate to ≤4 rows; quality mass
    sums through DECIMAL(18,6) (order-independent, oracle-exact).
    """
    from cassandra_extractor_spark.operators.dedup import ns_dedup_clusters
    from cassandra_extractor_spark.operators.text import shared_text_quality

    quality = shared_text_quality(spark, sf_dir)
    dup = ns_dedup_clusters(spark, sf_dir).select(
        "doc_id", F.lit(True).alias("d")
    )
    j = quality.join(dup, "doc_id", "left").select(
        F.coalesce(F.col("d"), F.lit(False)).alias("is_dup"),
        ((F.col("quality") >= 0.5) & (F.col("n_tokens") >= 50)).alias("passes_gate"),
        "n_tokens",
        "quality",
    )
    return (
        j.groupBy("is_dup", "passes_gate")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("sum_tokens"),
            F.round(F.sum(F.col("quality").cast("decimal(18,6)")), 6)
            .cast("double")
            .alias("sum_quality"),
        )
        .orderBy("is_dup", "passes_gate")
    )


def ns_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup savings forecast: how many tokens canonical
    near-dup removal (keep the lowest doc_id per cluster — the
    ``ns_corpus_select`` rule) would delete, as absolute counts and
    ppm of each source's token mass.  This is the table that decides
    WHERE a dedup pass is worth its compute before running it corpus-
    wide — the planning companion to ``ns_source_dedup_matrix`` (which
    locates the duplication) and ``ns_quality_by_dup`` (which prices
    its quality).

    Scale shape: removable docs are the cluster members that are not
    their cluster's minimum (one aggregate over the session-shared
    cluster map); token counts ride the shared quality frame; one
    broadcast-ish join + one map-side-combined aggregate to |sources|
    rows.  Pure integers.
    """
    from cassandra_extractor_spark.operators.dedup import ns_dedup_clusters
    from cassandra_extractor_spark.operators.text import shared_text_quality

    removable = (
        ns_dedup_clusters(spark, sf_dir)
        .where(F.col("doc_id") != F.col("cluster_id"))
        .select("doc_id", F.lit(True).alias("rm"))
    )
    toks = shared_text_quality(spark, sf_dir).select("doc_id", "n_tokens")
    src = load_table(spark, "documents", sf_dir).select("doc_id", "source")
    j = (
        src.join(toks, "doc_id")
        .join(removable, "doc_id", "left")
        .select(
            "source",
            "n_tokens",
            F.coalesce(F.col("rm"), F.lit(False)).alias("rm"),
        )
    )
    return (
        j.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum(F.when(F.col("rm"), 1).otherwise(0)).cast("long").alias("n_removable"),
            F.sum(F.when(F.col("rm"), F.col("n_tokens")).otherwise(0))
            .cast("long")
            .alias("removable_tokens"),
        )
        .withColumn(
            "savings_ppm",
            F.when(
                F.col("total_tokens") > 0,
                F.expr("div(1000000 * removable_tokens, total_tokens)"),
            )
            .otherwise(0)
            .cast("long"),
        )
        .orderBy("source")
    )
