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
    from cassandra_extractor_spark.operators.text import shared_text_quality

    # (doc_id, source, n_tokens) from the pruned attr scan joined to
    # the session quality frame (identical size(tokens(text))
    # expression) — this frame is consumed TWICE (totals + gate), so
    # the old private spelling tokenized the corpus twice per call
    # (optimization r14, guide §1.2)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "source").join(
        shared_text_quality(spark, sf_dir).select("doc_id", "n_tokens"), "doc_id"
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


TEMP_BUDGET_FRAC = 0.5  #: temperature-sampled corpus targets this token share
TEMP_ALPHA_NOTE = "alpha = 0.5 (sqrt) so the power is IEEE-exact on every engine"


def ns_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based language rebalancing (the multilingual-LM
    mixing rule, XLM-R §3.1): sample language ``l`` with probability
    ``q_l ∝ p_l^alpha`` where ``p_l`` is its natural token share —
    alpha < 1 up-weights low-resource languages without discarding the
    head.  ``alpha = 0.5`` here: the power becomes ``sqrt``, which IEEE
    754 requires to be correctly rounded, so Spark and DuckDB produce
    bit-identical mixture weights (general ``pow`` is not guaranteed
    correctly rounded and could diverge in the last ulp).

    Per language: natural share ``p``, mixture weight ``q``, keep-rate
    ``min(1, q·budget/tokens)``, and the realized sample (docs kept by
    the deterministic md5 gate on doc_id — reproducible on any engine,
    partitioning, or rerun).

    100 TB shape: language token totals are one map-side-combined agg
    to a few rows; the rate table broadcast-joins back; the gate is a
    codegen'd filter.  Two corpus passes, zero corpus-sized shuffles.
    """
    from cassandra_extractor_spark.operators.text import shared_text_quality

    # (doc_id, lang, n_tokens) via the session quality frame — same
    # two-consumer rationale as ns_mixture_sample (optimization r14)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang").join(
        shared_text_quality(spark, sf_dir).select("doc_id", "n_tokens"), "doc_id"
    )
    per_lang = d.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("lang_tokens")
    )
    # Σ√ accumulates doubles across languages: go through DECIMAL(38,18)
    # so the sum is order-independent (the ns_corpus_stats trick) and
    # both engines agree bit-for-bit
    totals = per_lang.agg(
        F.sum("lang_tokens").alias("total_tokens"),
        F.sum(F.sqrt(F.col("lang_tokens").cast("double")).cast("decimal(38,18)"))
        .cast("double")
        .alias("sq_sum_raw"),
    )
    # q = sqrt(p)/Σsqrt(p) = sqrt(n_l)/Σsqrt(n_m): the total cancels, so
    # fold it once here rather than dividing before the sqrt (fewer
    # rounding steps shared identically by the oracle)
    rated = per_lang.crossJoin(F.broadcast(totals)).select(
        "lang",
        "n_docs",
        "lang_tokens",
        (F.col("lang_tokens").cast("double") / F.col("total_tokens")).alias("p"),
        (F.sqrt(F.col("lang_tokens").cast("double")) / F.col("sq_sum_raw")).alias("q"),
        F.least(
            F.lit(1.0),
            F.lit(TEMP_BUDGET_FRAC)
            * F.col("total_tokens").cast("double")
            * (F.sqrt(F.col("lang_tokens").cast("double")) / F.col("sq_sum_raw"))
            / F.col("lang_tokens").cast("double"),
        ).alias("rate"),
    )
    kept = d.join(F.broadcast(rated.select("lang", "rate")), "lang").where(
        _md5_hash64(F.col("doc_id").cast("string"), "temp") % 1_000_000
        < F.floor(F.col("rate") * 1_000_000)
    )
    kept_stats = kept.groupBy("lang").agg(
        F.count("*").alias("n_kept"), F.sum("n_tokens").alias("kept_tokens")
    )
    return (
        # both sides are per-language (a handful of rows at any corpus
        # size): broadcast, or the planner picks a sort-merge join
        rated.join(F.broadcast(kept_stats), "lang", "left")
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            F.round("p", 6).alias("p"),
            F.round("q", 6).alias("q"),
            F.round("rate", 6).alias("rate"),
            F.coalesce(F.col("n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce(F.col("kept_tokens"), F.lit(0)).cast("long").alias("kept_tokens"),
        )
        .orderBy("lang")
    )


DSIR_BUCKETS = 1024  #: hashed-bigram feature space for DSIR
DSIR_TARGET_LANG = "en"  #: the target domain the selector steers toward


def ns_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every document
    by the log-likelihood ratio of a hashed-bigram unigram model of the
    TARGET domain (here: ``lang = 'en'`` documents) against the RAW
    corpus model, with Laplace smoothing — positive log-weight means
    "looks more like the target than like the average of the crawl".

    Feature space is ``DSIR_BUCKETS`` md5-hashed bigram buckets (the
    hashing trick), so both count tables are FIXED-SIZE (1024 rows)
    regardless of corpus size: the per-bucket log-ratio table computes
    once and broadcast-joins back to the feature stream.  Per-doc
    summation goes through DECIMAL(38,18) (order-independent — the
    ns_corpus_stats trick) so the driver hash is partition-stable; each
    bucket's term uses correctly-rounded double ops and ONE ``ln``,
    mirrored operation-for-operation in the oracle.

    100 TB shape: one bigram explode (per-doc window, map-local), one
    map-side-combined count to 1024 rows per distribution, one
    broadcast join, one per-doc aggregation.  No corpus-sized shuffle
    except the final groupBy(doc_id) — same key the explode started
    partitioned on.  The feature stream has multiple consumers (the
    count pass and the per-doc scoring pass), so the md5-hashed bucket
    projection is materialized once (``materialize_once``) over the
    session-shared token stream, and the raw/target count tables come
    from ONE fused aggregation: a broadcast target-flag left join plus
    a conditional sum replaces the second full pass over the feature
    stream (optimization r13, guide §1.2/§2.2 — count both
    distributions in one map-side-combined pass).
    """
    from cassandra_extractor_spark.operators.dedup import materialize_once
    from cassandra_extractor_spark.operators.text import shared_token_stream
    from cassandra_extractor_spark.sources.catalog import load_table

    b = DSIR_BUCKETS
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    feats = materialize_once(
        shared_token_stream(spark, sf_dir)
        .where(F.col("nxt").isNotNull())
        .select(
            "doc_id",
            (
                _md5_hash64(F.concat_ws(" ", F.col("tok"), F.col("nxt")), "dsir") % b
            ).alias("f"),
        )
    )
    target_ids = d.where(F.col("lang") == DSIR_TARGET_LANG).select(
        "doc_id", F.lit(1).alias("is_t")
    )
    # one pass counts BOTH distributions: every feature row counts
    # toward c_r, and toward c_t iff its doc carries the broadcast
    # target flag (target ⊆ raw, so no occupied bucket is missed)
    counts = (
        feats.join(F.broadcast(target_ids), "doc_id", "left")
        .groupBy("f")
        .agg(
            F.count("*").alias("c_r"),
            F.sum(F.coalesce(F.col("is_t"), F.lit(0))).alias("c_t"),
        )
    )
    totals = counts.agg(
        F.sum("c_r").alias("tot_r"), F.sum("c_t").alias("tot_t")
    )
    term = F.log(
        ((F.col("c_t") + 1).cast("double") / (F.col("tot_t") + b).cast("double"))
        / ((F.col("c_r") + 1).cast("double") / (F.col("tot_r") + b).cast("double"))
    )
    bucket_table = counts.crossJoin(F.broadcast(totals)).select("f", term.alias("term"))
    per_doc = (
        feats.join(F.broadcast(bucket_table), "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum(F.col("term").cast("decimal(38,18)")).cast("double").alias("logw_raw"),
        )
    )
    return (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long").alias("n_feats"),
            F.round(F.coalesce(F.col("logw_raw"), F.lit(0.0)), 6).alias("logw"),
            (F.coalesce(F.col("logw_raw"), F.lit(0.0)) > 0).alias("keep"),
        )
        .orderBy("doc_id")
    )


def ns_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile winsorization (clip to per-group [p01, p99]) — the
    standard outlier treatment before a numeric feature enters
    training, with the clip report a pipeline logs: per event_type,
    how many values clipped at each tail and the post-clip sum.

    Exactness: values integerize to cents; the bounds are discrete
    quantiles from the mergeable GK sketch at max accuracy (== DuckDB
    ``quantile_disc``, the q44b/q89 equivalence); clipping and the
    final sums are pure integer ops.

    Scale shape: pass 1 computes one (p01, p99) row per group (sketch
    partials merge map-side, one tiny shuffle); the bounds frame —
    |groups| rows — broadcasts into pass 2's scan, which clips and
    re-aggregates map-side.  No window over raw rows, no sort, the
    fact table is scanned exactly twice (once per pass) — and pass 1's
    scan prunes to two columns.
    """
    acc = 2147483647
    e = load_table(spark, "events", sf_dir).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    bounds = e.groupBy("event_type").agg(
        F.percentile_approx("cents", 0.01, acc).alias("lo"),
        F.percentile_approx("cents", 0.99, acc).alias("hi"),
    )
    clipped = e.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "cents",
        "lo",
        "hi",
        F.greatest(F.col("lo"), F.least(F.col("hi"), F.col("cents"))).alias("w"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            # when/otherwise, not a bare boolean cast: a NULL value makes
            # the cast NULL (all-NULL group sums to NULL) while the
            # oracle's CASE falls to ELSE 0
            F.sum(F.when(F.col("cents") < F.col("lo"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_low"),
            F.sum(F.when(F.col("cents") > F.col("hi"), 1).otherwise(0))
            .cast("long")
            .alias("n_clip_high"),
            F.min("lo").alias("lo_cents"),
            F.min("hi").alias("hi_cents"),
            F.sum("w").alias("sum_winsorized_cents"),
        )
        .orderBy("event_type")
    )


SAMPLE_K_PER_GROUP = 20  #: exact per-group sample size


def ns_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-k uniform sample per group (k docs per source) — the
    companion to rate-based sampling when downstream needs a fixed
    budget per stratum (eval panels, per-domain inspection sets,
    labeling batches).  Rate gates (``ns_sample_stratified``) only hit
    k in expectation; this ranks each group by a deterministic
    md5-derived key and keeps the first k — exact count, reproducible
    on any engine or cluster size, no RNG state.

    Scale shape: one hash exchange on the group key + an in-partition
    TOP-K window (rank ≤ k cuts early under AQE); group count × k
    rows survive.  With heavily skewed groups the window is still
    linear per partition — no global sort, no collect.
    """
    from pyspark.sql import Window as W

    d = load_table(spark, "documents", sf_dir)
    # zero-padded hash key: string order == numeric order, so the
    # oracle's lpad spelling is bit-identical
    key = F.lpad(
        (_md5_hash64(F.col("doc_id").cast("string"), "kpg") % 1_000_000_000)
        .cast("string"),
        9,
        "0",
    )
    w = W.partitionBy("source").orderBy(key.asc(), F.col("doc_id").asc())
    return (
        d.select("doc_id", "source", key.alias("k"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= SAMPLE_K_PER_GROUP)
        .select("source", "rank", "doc_id")
        .orderBy("source", "rank")
    )


DP_EPSILON = 1.0  #: Laplace privacy budget for the noisy release
DP_U_MOD = 1_000_003  #: uniform grid size (odd denominator ⇒ u ≠ 0.5 exactly)


def ns_dp_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private event-type histogram: each true count
    is released with Laplace(1/ε) noise — the privacy-preserving stats
    release a data marketplace runs before sharing usage numbers.

    The Laplace draw is DETERMINISTIC (md5-derived uniform u ∈ (0,1),
    inverse-CDF  −(1/ε)·sgn(u−½)·ln(1−2|u−½|)), so the release is
    reproducible and exactly oracle-checkable — the statistical
    properties are those of Laplace noise over the key domain, while
    reruns never leak extra budget by re-drawing.  u lives on an
    odd-denominator grid, so u = ½ (infinite noise) is unreachable.

    Scale shape: one map-side-combined count per key + a per-row noise
    expression — no shuffle beyond the aggregate.
    """
    ev = load_table(spark, "events", sf_dir)
    counts = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    u = (
        (_md5_hash64(F.col("event_type"), "dp") % DP_U_MOD + 1).cast("double")
        / F.lit(float(DP_U_MOD + 2))
    )
    centered = u - F.lit(0.5)
    lap = (
        F.lit(-1.0 / DP_EPSILON)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        "event_type",
        "n",
        F.round(F.col("n") + lap, 6).alias("noisy_n"),
    ).orderBy("event_type")


NEYMAN_BUDGET = 1000  #: total sample budget allocated across strata


def ns_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified sample allocation: budget B split
    across event-type strata ∝ N_h·S_h (stratum size × stddev) — the
    survey-sampling rule that minimizes estimator variance, used to
    size per-source annotation batches.

    S_h comes from the EXACT integer sufficient statistics (cents,
    DECIMAL(38,0) sums — the q104 pattern), so the only floats are one
    sqrt (IEEE-correctly-rounded, hence engine-identical) and the
    final proportional split; the weight total accumulates in
    DECIMAL(38,18) (order-independent across strata) and the
    allocation uses the portable floor spelling.

    Scale shape: one map-side-combined aggregate (five sums per
    stratum) + a broadcast single-row total — the fact table is read
    once.
    """
    from cassandra_extractor_spark.operators.dedup import materialize_once

    ev = load_table(spark, "events", sf_dir).where(F.col("value").isNotNull())
    base = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("x")
    )
    agg = base.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_h"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(38,0)")).alias("sxx"),
    )
    nd = F.col("n_h").cast("double")
    var = (
        (nd * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double"))
        / (nd * (nd - F.lit(1.0)))
    )
    sd = F.when((F.col("n_h") >= 2) & (var > 0), F.sqrt(var)).otherwise(F.lit(0.0))
    weighted = materialize_once(
        agg.select("event_type", "n_h", (nd * sd).alias("w"))
    )
    # wtot must be BIT-identical on both engines: a decimal detour is
    # NOT (Spark casts double→decimal via the shortest-repr string,
    # DuckDB via the binary expansion — √3 differs by ~1e-16, enough to
    # flip floor(B·w/wtot) at the exact-budget boundary, found by the
    # differential harness).  A sequential fold in event_type order is
    # order-deterministic AND bitwise-portable (aggregate ≡ list_reduce).
    total = weighted.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("event_type", "w"))),
            F.lit(0.0),
            lambda a, s: a + s["w"],
        ).alias("wtot")
    )
    return (
        weighted.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n_h",
            F.round(F.col("w") / F.lit(100.0), 6).alias("weight"),
            F.when(
                F.col("wtot") > 0,
                F.floor(
                    F.lit(float(NEYMAN_BUDGET))
                    * F.col("w")
                    / F.col("wtot").cast("double")
                ).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("alloc"),
        )
        .orderBy("event_type")
    )


WATERFILL_BUDGET_DEN = 2  #: token budget = total_tokens // 2 (integer-exact)


def ns_waterfill_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfilling per-domain token caps: given a global token budget
    ``B = total_tokens // 2``, find the single integer cap ``C`` such
    that keeping ``min(tokens_d, C)`` tokens from every domain (here:
    ``lang``) spends at most the budget with the largest possible cap —
    the classic "cap over-represented sources, keep the tail whole"
    mixture rule of LLM data recipes (the per-source clamp step of a
    temperature/mixture pipeline, cf. ``ns_temperature_sample`` which
    REWEIGHTS instead of capping).

    Closed form, integer-exact end to end: with domains sorted by token
    count ascending, the boundary position ``k`` (domains before it
    kept whole, the rest capped) satisfies
    ``C = (B - prefix_tokens_{k-1}) div (n_domains - k + 1)`` with
    ``n_{k-1} <= C < n_k`` — a unique row, selected by a window over
    the per-domain aggregate.  No floats anywhere except the final
    reported ``kept_frac``; Spark's ``div`` and the oracle's ``//``
    agree on every surviving row because the numerator is non-negative
    exactly where the validity filter can pass.

    100 TB shape: one corpus scan to per-domain token totals (map-side
    combined to n_domains rows), then windows/joins over that
    n_domains-row frame — bounded by construction (domains are a
    labeling, not data).  The cap broadcast-joins back to the domain
    table; applying it to documents would be one more codegen'd filter.
    """
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.operators.dedup import materialize_once
    from cassandra_extractor_spark.operators.text import shared_text_quality

    # per-doc token counts from the session quality frame (identical
    # size(tokens(text)) expression) — the corpus text is never read
    # here (optimization r14)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang").join(
        shared_text_quality(spark, sf_dir).select("doc_id", "n_tokens"), "doc_id"
    )
    # n_domains rows, referenced by three branches (totals, the ranked
    # boundary search, the output) — materialize so the corpus token
    # pass runs once, not once per reference
    per = materialize_once(
        d.groupBy("lang").agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("lang_tokens"),
        )
    )
    tot = per.agg(
        F.sum("lang_tokens").cast("long").alias("total_tokens"),
        F.count("*").cast("long").alias("n_domains"),
    )
    w = W.orderBy("lang_tokens", "lang")
    ranked = per.crossJoin(F.broadcast(tot)).select(
        "lang_tokens",
        "total_tokens",
        "n_domains",
        F.row_number().over(w).cast("long").alias("i"),
        F.coalesce(
            F.sum("lang_tokens").over(w.rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0),
        )
        .cast("long")
        .alias("p_prev"),
        F.coalesce(F.lag("lang_tokens").over(w), F.lit(0)).cast("long").alias("n_prev"),
    )
    cand = ranked.select(
        "lang_tokens",
        "n_prev",
        F.expr(
            f"((total_tokens div {WATERFILL_BUDGET_DEN}) - p_prev)"
            " div (n_domains - i + 1)"
        ).alias("cand"),
    )
    cap = cand.where(
        (F.col("cand") < F.col("lang_tokens")) & (F.col("cand") >= F.col("n_prev"))
    ).select(F.col("cand").alias("cap"))
    return (
        per.crossJoin(F.broadcast(cap))
        .select(
            "lang",
            "n_docs",
            "lang_tokens",
            "cap",
            F.least(F.col("lang_tokens"), F.col("cap")).cast("long").alias("kept_tokens"),
            F.round(
                F.least(F.col("lang_tokens"), F.col("cap")).cast("double")
                / F.col("lang_tokens").cast("double"),
                6,
            ).alias("kept_frac"),
            (F.col("lang_tokens") > F.col("cap")).alias("capped"),
        )
        .orderBy("lang")
    )


DRM_BUCKETS = 1024  #: hashed-unigram feature space for domain reweighting
DRM_ETA = 1.0  #: exponentiated-gradient step size (one DoReMi-style step)


def ns_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One DoReMi-style domain-reweighting step (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): up-weight domains the corpus-average model explains
    poorly.  The per-domain excess-loss signal here is the hashed-
    unigram KL divergence ``KL(domain || corpus)`` with Laplace
    smoothing over ``DRM_BUCKETS`` md5-hashed buckets (the DSIR hashing
    trick, ``ns_dsir_select``), and the update is the exponentiated-
    gradient step ``w_d ∝ share_d · exp(eta · KL_d)``, normalized.
    Like ``ns_kmeans_step``/``ns_kcenter_step``, this is the per-
    iteration primitive — a training loop re-estimates losses under the
    reweighted proxy and repeats.

    Exactness: the KL sum runs over the FULL fixed bucket grid
    (n_domains × 1024 rows, generated, so zero-count buckets contribute
    their closed-form smoothing mass on both engines), each term is one
    double quotient-of-quotients and ONE ``ln``, and both the KL and
    the weight normalizer accumulate through DECIMAL(38,18) so the sums
    are order-independent (the ``ns_corpus_stats`` trick).

    100 TB shape: one corpus explode (map-local) collapsed map-side to
    ≤ n_domains × 1024 count rows; every downstream frame is fixed-size
    regardless of corpus volume.  No corpus-sized shuffle at all — the
    groupBy key is (lang, f) with heavy map-side combine.
    """
    from cassandra_extractor_spark.operators.text import tokens

    from cassandra_extractor_spark.operators.dedup import materialize_once

    b = DRM_BUCKETS
    d = load_table(spark, "documents", sf_dir).select("doc_id", "lang", "text")
    feats = d.select(
        "lang", F.explode(tokens(F.col("text"))).alias("tok")
    ).select("lang", (_md5_hash64(F.col("tok"), "drm") % b).alias("f"))
    # ≤ n_domains×1024 rows, referenced by every downstream branch
    # (per-domain totals, corpus totals, the grid join) — materialize
    # so the corpus explode runs ONCE, not once per reference
    lf = materialize_once(
        feats.groupBy("lang", "f").agg(F.count("*").cast("long").alias("c_lf"))
    )
    pl = lf.groupBy("lang").agg(F.sum("c_lf").cast("long").alias("tot_l"))
    cf = lf.groupBy("f").agg(F.sum("c_lf").cast("long").alias("c_f"))
    tot = pl.agg(F.sum("tot_l").cast("long").alias("tot"))
    grid = spark.range(b).select(F.col("id").alias("f")).crossJoin(F.broadcast(pl))
    p_lf = (F.coalesce(F.col("c_lf"), F.lit(0)) + 1).cast("double") / (
        F.col("tot_l") + b
    ).cast("double")
    p_cf = (F.coalesce(F.col("c_f"), F.lit(0)) + 1).cast("double") / (
        F.col("tot") + b
    ).cast("double")
    cells = (
        grid.join(lf, ["lang", "f"], "left")
        .join(F.broadcast(cf), "f", "left")
        .crossJoin(F.broadcast(tot))
        .select("lang", (p_lf * F.log(p_lf / p_cf)).alias("term"))
    )
    kl = cells.groupBy("lang").agg(
        F.sum(F.col("term").cast("decimal(38,18)")).cast("double").alias("kl")
    )
    nd = d.groupBy("lang").agg(F.count("*").cast("long").alias("n_docs"))
    wr = (
        pl.join(kl, "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "tot_l",
            "kl",
            (F.col("tot_l").cast("double") / F.col("tot").cast("double")).alias("share"),
            (
                (F.col("tot_l").cast("double") / F.col("tot").cast("double"))
                * F.exp(F.lit(DRM_ETA) * F.col("kl"))
            ).alias("w_raw"),
        )
    )
    ws = wr.agg(
        F.sum(F.col("w_raw").cast("decimal(38,18)")).cast("double").alias("w_sum")
    )
    return (
        wr.join(F.broadcast(nd), "lang")
        .crossJoin(F.broadcast(ws))
        .select(
            "lang",
            "n_docs",
            F.col("tot_l").alias("lang_tokens"),
            F.round("share", 6).alias("share"),
            F.round("kl", 6).alias("kl"),
            F.round(F.col("w_raw") / F.col("w_sum"), 6).alias("weight"),
        )
        .orderBy("lang")
    )
