import sys
sys.path.insert(0, "/root/repo")
from cassandra_extractor_spark.session import get_spark
from cassandra_extractor_spark.registry import QUERIES
spark = get_spark("explain")
sf = "/root/testdata/sf0.01"

SECTIONS = [
    ("q02_filter", "Predicate + projection pushdown",
     "The filter and the 2-column projection must reach the parquet scan: look for `PushedFilters` and a pruned `ReadSchema`. At 100 TB this is the difference between scanning 2 columns of the matching row groups and scanning everything."),
    ("q19_multiway_join", "Join strategy (TPC-H Q5 shape)",
     "customer⋈orders⋈lineitem⋈nation. At sf0.01 AQE converts all three to broadcast joins (small build sides); at 100 TB the big joins become sort-merge on the shuffled keys while `nation` stays broadcast — the plan is AQE's choice per actual sizes, not hand-scheduled."),
    ("q13_group_agg", "Partial aggregation",
     "Two `HashAggregate` nodes (partial then final) around the exchange: map-side combine shrinks the shuffle to #groups × #partitions rows regardless of input size."),
    ("ns_ann_cosine_topk", "Broadcast query side, corpus never shuffles",
     "`BroadcastNestedLoopJoin` with the tiny query set broadcast; the corpus is scanned once with no exchange before scoring. The only shuffle is the final per-query top-k window over candidates."),
    ("ns_dedup_minhash_lsh", "Signature pipeline in codegen, one digest per shingle",
     "posexplode → window lead → ONE md5 per shingle split into (h1, h2) → the 8 Kirsch-Mitzenmacher permutations as codegen integer arithmetic → map-side-combined min-agg, then a self-join shuffled on uniform band signatures. The md5-per-permutation spelling this replaced spent ~85% of the pass in digests; nothing per-row runs in Python."),
    ("q34_asof_join", "As-of join as a single-pass window",
     "One exchange + sort per user_id, a running-max window, no self-join: the O(n) formulation that replaces the O(n²)-per-key naive as-of."),
    ("q51_conditional_agg", "N conditional metrics, one scan, one shuffle",
     "count_if + two sum-CASE metrics compute in a single partial/final HashAggregate pair — no self-join, no second scan. The naive per-status-join formulation would scan orders three times and shuffle each."),
    ("q58_explode", "Lateral explode stays inside the scan stage",
     "posexplode(slice(...)) runs in the same WholeStageCodegen span as the parquet scan — array flattening adds zero exchanges; output rows stream straight to the sink."),
    ("q63_sliding_window", "Time-range sliding window, one exchange per key",
     "The trailing-hour count is a RANGE frame over epoch millis: one hash exchange + sort per user_id, then a linear frame scan — the batch analogue of a streaming sliding window, with no self-join and no re-scan per window position."),
    ("ns_decontaminate", "Eval-gram set broadcast, corpus never shuffles for the probe",
     "The held-out benchmark's distinct 5-grams are tiny relative to the corpus, so the contamination check is a `BroadcastHashJoin`: one corpus scan probes a broadcast hash set; only the contaminated survivors shuffle into the per-doc count. No corpus-sized exchange at any scale."),
    ("ns_mixture_sample", "Per-source rate table broadcast back as a filter",
     "Per-source token totals reduce to a few-row frame (one row per domain); the computed keep-rates broadcast-join back onto the corpus and the md5 gate filters in the scan stage. Look for two map-side-combined HashAggregate pairs and a `BroadcastHashJoin` — zero corpus-sized shuffles, no driver collect."),
    ("ns_sequence_pack", "Packing is one partitioned window, no global sort",
     "The running token sum partitions by source shard: one hash exchange on source, an in-partition sort, a linear frame scan. A global-order packing would serialize on a single partition; per-shard packing is what real pipelines do and what scales."),
    ("ns_quality_classifier", "Median cut is a one-row aggregate broadcast back",
     "The percentile threshold reduces the scored corpus to ONE row (a mergeable quantile sketch: partial per partition, merged once), which rides back over the scores as a `BroadcastNestedLoopJoin` of a single row — there is NO Window operator in this plan at all. The r02 formulation ranked with an empty-partition ROW_NUMBER window, serializing the corpus through one partition; this shape scales with the corpus. Accuracy is the memory/exactness knob: max here for oracle parity, ~1e4 in production for O(accuracy) state."),
    ("q44b_quantile_disc", "Quantiles via mergeable sketch, not a single-reducer sort",
     "`percentile_approx` computes Greenwald-Khanna summaries partial-then-final like any algebraic aggregate — contrast exact `percentile()` (q44), which buffers every value of the column on one reducer and only survives because it is a single global aggregate. The sketch's memory is O(accuracy), independent of row count."),
    ("ns_kmeans_step", "Lloyd-step mean is a streaming decimal-sum aggregate",
     "Centroids broadcast (BroadcastNestedLoopJoin of 16 rows), assignment is a map-side argmax window keyed by vec_id, and the per-(cluster, dim) mean is a plain HashAggregate over DECIMAL(38,18) sums — exact, order-independent, CONSTANT memory per aggregation buffer. The r03 spelling used collect_list+sorted-fold for oracle parity, which buffers a whole cluster's values in one ObjectHashAggregate buffer; the decimal trick gets bit-stable cross-engine hashing from a streaming aggregate instead (asserted: no ObjectHashAggregate in this plan)."),
    ("ns_lm_fluency_bucket", "Corpus LM scoring with broadcast tercile thresholds",
     "The bigram stream is materialized once and feeds three hash aggregations (doc-side pre-agg, bigram counts, prefix counts); the doc-model join happens AFTER per-(doc, bigram) combination so stop-bigram skew multiplies against counts, not raw occurrences. All arithmetic is integer `div` — no libm in the plan, so the driver hash is partition-order-proof. The head/middle/tail cut is the classifier trick: two one-row percentile_approx sketches broadcast back; no global sort window anywhere."),
    ("ns_cdc_chunk", "Content-defined chunking is one explode + one per-doc window",
     "Boundary selection is a codegen'd md5 predicate on each token; chunk ids are a running sum over a window PARTITIONED BY doc_id (map-local after the explode — never a global sort), and the chunk rollup is a map-side-combined HashAggregate. One corpus pass end to end; the chunking is shift-resistant (see the behavior test), which is what makes chunk-keyed dedup stable under document edits."),
    ("ns_corpus_drift", "Drift monitor: two aggregations, languages-sized output",
     "Per-language token masses for both snapshots come out of ONE map-side-combined aggregation (the old-snapshot mass is a conditional sum in the same HashAggregate, not a second scan); the smoothed totals are a languages-sized driver scalar, and the KL terms are a fixed-order double expression rounded at 6 — the engine-parity discipline every float op here follows. Output is K rows regardless of corpus size."),
    ("ns_sample_uniform", "Deterministic sampling is a scan-stage filter",
     "The md5 hash gate compiles to a codegen'd filter inside the scan stage — no RNG state, no shuffle caused by the sampling itself (the one Exchange below is the oracle contract's total ORDER BY, absent in pipeline use). At 100 TB the sample costs one pass and parallelizes perfectly; the same rows come back on any cluster size or rerun."),
    ("ns_substring_dedup", "Substring dedup: inverted index + per-doc interval union",
     "The distributed spelling of suffix-array dedup: one explode emits (doc, pos, md5-k-gram) — map-only; gram counts are a partial/final HashAggregate on the uniform hash key (no skew); the join back moves only duplicated-span starts; and the interval union is a gaps-and-islands window PARTITIONED BY doc_id (map-local sort, never global). The gram stream is localCheckpointed once so counts and join-back don't recompute the explode. No cartesian anywhere — the all-pairs formulation this replaces is quadratic in corpus size."),
    ("ns_dsir_select", "DSIR: fixed-size count tables broadcast onto the feature stream",
     "The hashing trick caps both distribution models at 1024 rows regardless of corpus size: raw and target counts are map-side-combined aggregations DOWN to the bucket space, the log-ratio table broadcast-joins back (look for BroadcastHashJoin — a shuffle join on 1024 keys would put ~1/1024 of the corpus on one reducer), and the per-doc sum runs through DECIMAL(38,18) so the hash is partition-order-proof."),
    ("ns_bm25", "BM25: corpus stats reduce to broadcast scalars",
     "df (3 rows) and avgdl (1 row) broadcast back over the term stream; the query-term filter is a literal array probe BEFORE the aggregation, so non-query tokens never leave the scan stage. Scoring is a codegen'd double expression; the per-doc sum is decimal (order-independent). Two corpus passes (stats, scores), zero corpus-sized shuffles."),
    ("ns_dedup_prefix_jaccard", "Lossless set-similarity join: prefixes exclude skew",
     "The global rarity order costs one vocabulary-sized aggregation; each doc's candidate surface shrinks to its p = n−ceil(t·n)+1 RAREST shingles, so the self-join key distribution is anti-skewed by construction — hot boilerplate shingles are common, hence never prefix members. The exact verify join touches only surviving candidates. 100% recall at the threshold (prefix theorem), which is why the oracle is the plain exact spelling — compare ns_dedup_minhash_lsh, whose probabilistic candidates need recall tests instead."),
    ("q83_cdc_apply", "MERGE INTO without a table format",
     "The change stream reduces to latest-per-key with one window (the only changes-sized exchange), then ONE full-outer sort-merge join applies insert/update/delete/keep simultaneously — no per-branch scans, no collect. At 100 TB both sides partition on the key; AQE picks broadcast when the reduced change set is small, which is the common nightly-merge case."),
    ("ns_chunk_dedup", "Chunk dedup: two bounded aggregations after one window",
     "Explode → per-doc running-sum chunk ids (window partitioned on doc_id — map-local after one exchange) → chunk fingerprint aggregation (buffer bounded by chunk size, ~16 tokens) → per-fingerprint stats aggregation (map-side combined on the uniform md5 key). No pairwise chunk comparison exists anywhere — duplication falls out of the groupBy, the same way exact doc dedup does, at passage granularity."),
    ("ns_heavy_hitters", "Heavy hitters: sketch shuffle, not domain shuffle",
     "The count-min pass aggregates the token stream DOWN to ≤32 k cells map-side (one partial/final HashAggregate pair on uniform cell ids — no token-domain shuffle, no skew); the flattened sketch returns as a one-row broadcast and the candidate predicate is four element_at lookups inside the probe scan stage. Only survivors (true heavies + bounded false positives) reach the exact-count aggregation. The naive plan's shuffle grows with the distinct-token domain; this one's is fixed at the sketch size plus the survivor stream."),
    ("ns_line_filter", "Line filtering is per-row array arithmetic",
     "split → filter(lambda) → array_join all evaluate inside the scan stage's projection — zero exchanges except the oracle-contract ORDER BY. The exploded spelling would shuffle every line of the corpus to rebuild document order; this plan never takes a line out of its row, so 100 TB of documents filter in one map pass."),
    ("q78_bloom_join", "Runtime Bloom filter prunes the probe scan",
     "The 16 KiB word array (built by a map-side-combined bit_or aggregation, driver-bounded at 2048 longs regardless of build rows) rides a one-row broadcast; the k bit_get membership tests sit in the probe side's scan stage BEFORE the join exchange, so only candidate rows (true matches + ~0.4% false positives) shuffle. The exact broadcast join afterwards removes false positives — correctness never depends on the filter. This is Spark's InjectRuntimeFilter made explicit and statistics-independent."),
    ("q76_rolling_zscore", "Sliding-frame outlier flag with zero float folds",
     "One exchange + sort per user_id, then a bounded 20-row frame computing integer SUM/COUNT — the z² comparison is a cross-multiplied integer inequality, so no accumulation-order float hazard exists on any engine or partitioning. Sliding double-sums are the classic cross-engine divergence (Spark rescans the frame; DuckDB subtracts via segment tree); integerizing first makes the operator deterministic AND cheaper."),
    ("q80_interval_merge", "Interval union without an interval self-join",
     "Two ordered windows per user_id (running MAX finds island starts, running SUM assigns ids) + one bounded aggregate: O(n log n) per key vs the quadratic pairwise-overlap join a naive formulation uses. All timestamps are integer epoch seconds — hash-stable."),
    ("q72_funnel", "Ordered funnel: every shuffle shares the user_id key",
     "Step N is a filtered min-aggregation joined to step N-1's output — all exchanges hash on user_id, so AQE reuses the partitioning across the chain instead of re-shuffling; the strictly-after predicate is a plain filter between join and aggregate. Step counts union three one-row aggregates. No window over the full event stream, no collect."),
    ("ns_pca_power_iter", "Gram-free power iteration: corpus maps once, d rows shuffle",
     "The d×d Gram matrix never materializes: each row contributes x[j]·(xᵀv₀) via one codegen'd fold + explode, the per-dim decimal sums are a map-side-combined HashAggregate down to d=64 rows, and the norm/sign stats ride back as a one-row broadcast. The d-row frame is localCheckpointed once so its two consumers (loadings and stats) don't re-run the corpus pass. k iterations = k such passes — no driver-side linear algebra at any scale."),
    ("ns_assoc_rules", "Bounded-basket pair join with Apriori pruning",
     "Baskets are bounded (~4-7 items), so the within-order self-join is linear in the corpus, not quadratic; the min-support HAVING prunes before the support joins, item supports broadcast back (vocabulary-sized), and the top-100 selection is a TakeOrderedAndProject — the rank window then runs over 100 rows, not the rule space. At 100 TB both self-join sides hash on l_orderkey (co-partitioned)."),
    ("ns_bpe_pair_counts", "BPE pair counting runs over the vocabulary, not the corpus",
     "The token stream collapses to DISTINCT words with counts first (Zipf: vocabulary ≪ corpus), so the per-character explode touches |vocab|·avg_len rows; pair counts are a second map-side-combined aggregate weighted by word frequency, and the deterministic top-50 is a TakeOrderedAndProject. This is the standard two-level trick every BPE trainer uses, in DataFrame form."),
    ("tpch_q05", "TPC-H Q5: six-table join, AQE picks the strategy per side",
     "The full local-supplier-volume join: nation and region broadcast unconditionally (tiny dims), customer/orders/lineitem/supplier shuffle on their keys with AQE converting to broadcast where the filtered side is small at this SF — at 100 TB the fact joins become sort-merge on the same exchanges while the dims stay broadcast. The local-supplier predicate (c_nationkey = s_nationkey) rides the supplier join condition, not a post-filter, so candidate rows never materialize."),
    ("q106_attribution", "Attribution range join is time-bucketed, never theta",
     "Each conversion probes exactly TWO (user, bucket) keys (bucket = ms div lookback, exploded), so the conversion↔touch join is an equi-join with the exact range predicate applied after — shuffle volume is 2× conversions + touches, independent of window length in rows. Credits are integer micro-cents via the portable floor spelling; the channel rollup is map-side combined."),
    ("q102_interpolate", "Gap interpolation: two lazy unbounded frames, one exchange",
     "One hash exchange + sort per user_id; the IGNORE NULLS last/first endpoints evaluate incrementally over the sorted partition (no self-join, no per-gap scan), and value+timestamp ride the same conditional column so the neighbor pair can never disagree. The interpolation itself is a codegen'd double expression of exact integers."),
]

out = ["# EXPLAIN — captured physical plans (sf0.01, local[32], AQE on)",
       "",
       "Generated by `tools/gen_explain.py` (`python tools/gen_explain.py > EXPLAIN.md`).",
       "Each section: why the plan is the one you want at 100 TB, then the",
       "actual executed plan (post-AQE).", ""]
for name, title, why in SECTIONS:
    df = QUERIES[name](spark, sf)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if len(plan) > 4000:
        plan = plan[:4000] + "\n... (truncated)"
    out.append(f"## {name} — {title}\n\n{why}\n\n```\n{plan}\n```\n")
print("\n".join(out))
