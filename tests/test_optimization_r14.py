"""Round-14 optimization guards: the session-shared quality frames
(``shared_text_quality`` / ``shared_clf_scores`` / ``shared_rep_flags``)
stay value-identical to the pre-r14 per-consumer spellings, and the
sharing the optimization bought is pinned so it can't silently regress.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_extractor_spark.operators.text import (
    EN_STOPWORDS,
    REP_DUP_TOKEN_MAX,
    REP_TOP_BIGRAM_MAX,
    distinct_tokens,
    token_stream,
    tokens,
)
from cassandra_extractor_spark.sources.catalog import load_table


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_text_quality_matches_from_scratch_spelling(spark, sf_dir):
    """ns_text_quality (now a projection of the session-shared frame)
    must equal the pre-r14 direct spelling row for row."""
    from cassandra_extractor_spark.operators.text import ns_text_quality

    d = load_table(spark, "documents", sf_dir)
    text = F.col("text")
    toksd = distinct_tokens(text)
    n_tok = F.size(tokens(text)).cast("double")
    stop_hits = F.size(
        F.array_intersect(toksd, F.array(*[F.lit(w) for w in EN_STOPWORDS]))
    ).cast("double")
    stop_ratio = stop_hits / F.size(toksd).cast("double")
    len_sat = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    n_ch = F.length(text).cast("double")
    punct_ratio = F.when(
        n_ch > 0,
        F.length(F.regexp_replace(text, r"[A-Za-z0-9 ]", "")).cast("double") / n_ch,
    ).otherwise(F.lit(0.0))
    score = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * len_sat
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
    )
    ref = d.select(
        "doc_id",
        F.size(tokens(text)).cast("long").alias("n_tokens"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality"),
    ).orderBy("doc_id")
    assert _rows(ns_text_quality(spark, sf_dir)) == _rows(ref)


def test_repetition_filter_matches_from_scratch_spelling(spark, sf_dir):
    """ns_repetition_filter (per-doc counts now from the shared quality
    frame, verdicts session-memoized) vs the pre-r14 spelling that
    re-tokenized the corpus for its base counts."""
    from cassandra_extractor_spark.operators.text import ns_repetition_filter

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = d.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.size(distinct_tokens(F.col("text"))).cast("long").alias("n_distinct"),
    )
    stream = token_stream(d)
    bigrams = stream.where(F.col("nxt").isNotNull()).select(
        "doc_id", F.concat_ws(" ", "tok", "nxt").alias("sh")
    )
    top_bigram = (
        bigrams.groupBy("doc_id", "sh")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"), F.sum("c").alias("n_bigrams"))
    )
    dup_frac = F.round(
        F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double"),
        6,
    )
    bigram_frac = F.round(
        F.coalesce(
            F.col("top_bigram_n").cast("double") / F.col("n_bigrams").cast("double"),
            F.lit(0.0),
        ),
        6,
    )
    ref = (
        base.join(top_bigram, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            dup_frac.alias("dup_token_frac"),
            bigram_frac.alias("top_bigram_frac"),
        )
        .withColumn(
            "keep",
            (F.col("dup_token_frac") <= REP_DUP_TOKEN_MAX)
            & (F.col("top_bigram_frac") <= REP_TOP_BIGRAM_MAX),
        )
        .orderBy("doc_id")
    )
    assert _rows(ns_repetition_filter(spark, sf_dir)) == _rows(ref)


def test_quality_classifier_matches_explicit_stream_path(spark, sf_dir):
    """The memoized default path must equal the explicit-stream path
    (which builds the scored frame from scratch)."""
    from cassandra_extractor_spark.operators.text import ns_quality_classifier

    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    got = ns_quality_classifier(spark, sf_dir)
    ref = ns_quality_classifier(spark, sf_dir, _stream=token_stream(d))
    assert _rows(got) == _rows(ref)


def test_shared_pairs_match_direct_self_joins(spark, sf_dir):
    """The single-join pair base (r14) must reproduce BOTH bucket
    policies of ``lsh_candidate_pairs`` over the same bands exactly —
    including a cap small enough to actually trigger the star topology
    on this corpus."""
    from cassandra_extractor_spark.operators.dedup import (
        invalidate_dedup_chain,
        lsh_candidate_pairs,
        shared_bands,
        shared_pairs,
    )

    invalidate_dedup_chain(spark)
    bands = shared_bands(spark, sf_dir)
    for cap in (None, 64, 2):
        got = sorted(
            (r["d1"], r["d2"])
            for r in shared_pairs(spark, sf_dir, max_bucket=cap).collect()
        )
        ref = sorted(
            (r["d1"], r["d2"])
            for r in lsh_candidate_pairs(bands, max_bucket=cap).collect()
        )
        assert got == ref, f"cap={cap}: {len(got)} vs {len(ref)} pairs"
        assert len(got) == len(set(got))  # distinct survived the refactor


def test_cell_rank_argmax_matches_window_spelling(spark, sf_dir):
    """The keep=1 struct-min argmax (r14) must assign every corpus
    vector to the SAME cell as the row_number-window spelling it
    replaced — including the tie-break to the smallest centroid id —
    and its plan must carry the map-side partial aggregate instead of
    a window over the N×K scored product."""
    from pyspark.sql import Window as W

    from cassandra_extractor_spark.operators.similarity import (
        N_IVF_CENTROIDS,
        N_QUERIES,
        _cell_rank,
        _centroids,
        _split_corpus_queries,
        cosine_prenormed,
        shared_embeddings,
    )

    e = shared_embeddings(spark, sf_dir)
    cent = _centroids(e, N_QUERIES, N_IVF_CENTROIDS)
    corpus, _ = _split_corpus_queries(e, N_QUERIES)
    got_df = _cell_rank(corpus, cent, "n_id", "n_emb", "n_nrm", 1)
    scored = corpus.crossJoin(F.broadcast(cent)).select(
        F.col("n_id"),
        "c_id",
        cosine_prenormed(
            F.col("n_emb"), F.col("c_emb"), F.col("n_nrm"), F.col("c_nrm")
        ).alias("csim"),
    )
    w = W.partitionBy("n_id").orderBy(F.col("csim").desc(), F.col("c_id"))
    ref_df = (
        scored.withColumn("crank", F.row_number().over(w))
        .where(F.col("crank") <= 1)
        .select("n_id", "c_id")
    )
    got = sorted(tuple(r) for r in got_df.collect())
    ref = sorted(tuple(r) for r in ref_df.collect())
    assert got == ref
    plan = got_df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan[:2000]
    assert "partial_min" in plan, plan[:2000]


def test_q116_spearman_single_corpus_exchange(spark, sf_dir):
    """Pins q116's floor claim (r13 verdict #9) so the query exits the
    examined-and-left list permanently: the (flag, price) marginal is
    THE one corpus-volume shuffle and it is referenced exactly once
    downstream — the executed plan must read lineitem exactly THREE
    times (qty-rank marginal, bucket-total marginal, price marginal),
    each scan pruned to the three needed columns.  A double-referenced
    marginal (the pre-r9 shape Catalyst cannot dedupe) would show up
    as a fourth scan."""
    from cassandra_extractor_spark.operators.relational import q116_spearman

    df = q116_spearman(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    scans = [
        ln
        for ln in plan.splitlines()
        if "Scan" in ln and "lineitem" in ln
    ]
    assert len(scans) == 3, plan[:3000]
    for ln in scans:
        assert "l_shipdate" not in ln and "l_orderkey" not in ln, ln
    # and the plan needs no materialization barrier: no checkpoint scan
    assert "ExistingRDD" not in plan, plan[:3000]


def test_neardup_embedding_single_arrow_eval(spark, sf_dir):
    """ADVICE r13: ``_dot_arrow_once`` relies on asNondeterministic()
    purely as an optimizer barrier against duplicate evaluation under
    the pushed filter.  Pin the intended shape — exactly ONE
    ArrowEvalPython node, zero row-at-a-time BatchEvalPython — so an
    optimizer change or a misuse of the kernel in a join/grouping
    context surfaces here immediately."""
    from cassandra_extractor_spark.operators.dedup import ns_neardup_embedding

    df = ns_neardup_embedding(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1, plan[:3000]
    assert "BatchEvalPython" not in plan, plan[:3000]


def test_two_level_money_sums_survive_single_partition(spark, sf_dir):
    """Overflow guard for the long-micros partial-sum pattern (r13
    verdict #6 / ADVICE): the adversarial partitioning — EVERY lineitem
    row in ONE partition, the worst case a skew-blown 100 TB partition
    can present at this data's value range — must still produce sums
    bit-identical to the one-level DECIMAL(18,6) aggregation, and the
    failure mode past 2^63 must be LOUD (ANSI on), never a silent wrap."""
    from cassandra_extractor_spark.operators.relational import (
        _money,
        _money_micros,
    )

    # the repo never disables ANSI; the overflow argument in
    # _money_micros depends on it (overflow ⇒ ARITHMETIC_OVERFLOW abort)
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    li = load_table(spark, "lineitem", sf_dir).coalesce(1)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    two_level = (
        li.groupBy("l_returnflag", F.spark_partition_id().alias("pid"))
        .agg(
            F.sum(_money_micros(F.col("l_extendedprice"))).alias("mp"),
            F.sum(_money_micros(disc_price)).alias("mdp"),
        )
        .groupBy("l_returnflag")
        .agg(
            (
                F.sum(F.col("mp").cast("decimal(38,0)")).cast("decimal(38,6)")
                / F.lit(1_000_000)
            )
            .cast("decimal(28,6)")
            .alias("sp"),
            (
                F.sum(F.col("mdp").cast("decimal(38,0)")).cast("decimal(38,6)")
                / F.lit(1_000_000)
            )
            .cast("decimal(28,6)")
            .alias("sdp"),
        )
    )
    one_level = li.groupBy("l_returnflag").agg(
        F.sum(_money(F.col("l_extendedprice"))).alias("sp"),
        F.sum(_money(disc_price)).alias("sdp"),
    )
    got = {r["l_returnflag"]: (r["sp"], r["sdp"]) for r in two_level.collect()}
    ref = {r["l_returnflag"]: (r["sp"], r["sdp"]) for r in one_level.collect()}
    assert got == ref

    # LOUD failure past the bound: a long sum that exceeds 2^63 raises
    # under ANSI instead of wrapping to a corrupt money total
    big = spark.range(3).select(F.lit(2**62).alias("v"))
    try:
        big.agg(F.sum("v")).collect()
        raised = False
    except Exception:
        raised = True
    assert raised, "long-sum overflow must abort loudly under ANSI"


def test_quality_frames_built_once_per_session(spark, sf_dir):
    """The funnel builds the three shared quality memos; gate agreement
    and the training corpus must REUSE the same materialized objects
    (no rebuild), and the funnel's executed plan must carry no quality
    subtree: at most one documents scan, pruned to doc_id (the spine),
    with the tokenize+score expressions absent."""
    from cassandra_extractor_spark.operators.dedup import invalidate_dedup_chain
    from cassandra_extractor_spark.operators.extraction import (
        ns_filter_funnel,
        ns_gate_agreement,
        ns_training_corpus,
    )

    invalidate_dedup_chain(spark)
    funnel = ns_filter_funnel(spark, sf_dir)  # builds chain + quality memos
    cache = spark.__dict__["_ce_dedup_chain"]
    tq_obj = cache[("text_quality", sf_dir)]
    clf_obj = cache[("clf_scores", sf_dir)]
    rep_obj = cache[("rep_flags", sf_dir)]
    plan = funnel._jdf.queryExecution().executedPlan().toString()
    assert "array_intersect" not in plan, plan[:2000]
    assert "regexp_replace" not in plan, plan[:2000]
    for line in plan.splitlines():
        if "ReadSchema" in line and "documents" in line:
            assert "text" not in line, line
    ns_gate_agreement(spark, sf_dir).write.format("noop").mode("overwrite").save()
    ns_training_corpus(spark, sf_dir).write.format("noop").mode("overwrite").save()
    assert cache[("text_quality", sf_dir)] is tq_obj
    assert cache[("clf_scores", sf_dir)] is clf_obj
    assert cache[("rep_flags", sf_dir)] is rep_obj


def test_ngram_novelty_matches_join_back_spelling(spark, sf_dir):
    """ns_ngram_novelty (batch 3: grams from the session shingle frame,
    first-owner join-back replaced by a doc-keyed count over the
    first-owner aggregate) must equal the pre-r14 from-scratch spelling
    — private tokenize+explode+distinct, MIN per gram, gram-volume join
    back — row for row."""
    from cassandra_extractor_spark.operators.relational import divr_sql
    from cassandra_extractor_spark.operators.text import NOVELTY_N, ns_ngram_novelty

    d = load_table(spark, "documents", sf_dir)
    t = d.select("doc_id", tokens(F.col("text")).alias("toks"))
    grams = (
        t.where(F.size("toks") >= NOVELTY_N)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(1), F.size("toks") - (NOVELTY_N - 1))
            ).alias("i"),
            "toks",
        )
        .select(
            "doc_id",
            F.concat_ws(
                " ",
                *[F.element_at("toks", F.col("i") + k) for k in range(NOVELTY_N)],
            ).alias("gram"),
        )
        .distinct()
    )
    first = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    ref = (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.when(
                F.col("n_grams") > 0,
                F.expr(divr_sql("n_novel * 10000", "n_grams")).cast("double")
                / F.lit(10_000.0),
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )
    assert _rows(ns_ngram_novelty(spark, sf_dir)) == _rows(ref)


def test_token_count_consumers_never_read_text(spark, sf_dir):
    """The batch-3 conversions (per-doc token counts from the session
    quality frame / token stream / shingle frame instead of a private
    corpus tokenize) must keep the text column OUT of every documents
    ReadSchema in the executed plan — the structural 100 TB win is that
    these queries never read corpus text at all."""
    from cassandra_extractor_spark.operators.dedup import ns_substring_dedup
    from cassandra_extractor_spark.operators.extraction import ns_corpus_drift
    from cassandra_extractor_spark.operators.sampling import (
        ns_mixture_sample,
        ns_temperature_sample,
        ns_waterfill_cap,
    )
    from cassandra_extractor_spark.operators.text import ns_entropy, ns_ngram_novelty

    for fn in (
        ns_entropy,
        ns_ngram_novelty,
        ns_substring_dedup,
        ns_corpus_drift,
        ns_waterfill_cap,
        ns_mixture_sample,
        ns_temperature_sample,
    ):
        plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if "ReadSchema" in line and "documents" in line:
                assert "text" not in line, (fn.__name__, line)
