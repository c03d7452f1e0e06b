"""Differential property testing: random event tables run through the
SAME registered Spark query and its DuckDB oracle, compared with the
driver's own canonicalization (imported from tools/check.py).

This is the adversarial complement to the fixed-corpus gate: hypothesis
searches the input space (timestamp ties, negative values, singleton
and empty groups, unicode-free but hostile strings) for any divergence
the synthetic testdata happens not to contain.
"""

from __future__ import annotations

import datetime as dt
import importlib.util
import pathlib
import sys

import duckdb
import pandas as pd
import pytest
from hypothesis import HealthCheck, assume, given, settings, strategies as st

# Long-running suite (r13 verdict #2: the full suite outgrew the
# driver pytest window) — deselected by default via pytest.ini
# addopts; the full gate runs it explicitly with `-m ""`.
pytestmark = pytest.mark.slow

_ROOT = str(pathlib.Path(__file__).resolve().parents[1])
sys.path.insert(0, _ROOT)

spec = importlib.util.spec_from_file_location("check", f"{_ROOT}/tools/check.py")
check = importlib.util.module_from_spec(spec)
spec.loader.exec_module(check)

from cassandra_extractor_spark.registry import ORACLES, QUERIES  # noqa: E402
from cassandra_extractor_spark.oracles_ns import NS_ORACLES  # noqa: E402

#: event-table queries under differential test (name → oracle source)
EVENT_QUERIES = [
    # round 10
    "q124_cusum_changepoint",
    "q122_hist_quantile",
    "q87_dense_timeseries",
    "q90_time_rollup",
    "q92_ohlc_resample",
    "q82_rolling_median",
    "q102_interpolate",
    "q104_autocorr",
    "q106_attribution",
    "q76_rolling_zscore",
    "q108_ewma",
    "q109_cusum",
    "q110_markov_transitions",
    "ns_dp_noise",
    "ns_neyman_allocation",
    "q114_bounce_rate",
    "q115_runs_test",
    "q119_ab_proportions",
    "q121_ks_test",
    "ns_winsorize",
    "q35_time_bucket",
    "q63_sliding_window",
    "q72_funnel",
    "q75_path_analysis",
    "ns_sessionize",
    "ns_sample_stratified",
    "q64_regression",
    # round-7b coverage audit: every remaining single-table events op
    "q08_hwm_filter",
    "q10_epoch_millis",
    "q31_json_extract",
    "q32_event_agg",
    "q33_range_join",
    "q34_asof_join",
    "q61_json_keys",
    "q71_fill_forward",
    "q73_retention_cohorts",
    "q74_latency_bands",
    "q79_window_distinct",
    "q80_interval_merge",
    "q85_interval_lookup",
    "q95_event_pattern",
    "ns_tablespec_pipeline",
]

#: differential depth: default examples per (query, family) are kept
#: small for the CI-speed suite; set SPARK_GRAFT_DIFF_EXAMPLES to run a
#: deeper hunt (e.g. 40) — used for the per-round divergence sweep
import os as _os

_EXAMPLES = int(_os.environ.get("SPARK_GRAFT_DIFF_EXAMPLES", "0"))

_T0 = dt.datetime(2024, 1, 1)

_row = st.tuples(
    st.integers(min_value=0, max_value=3 * 86400),  # ts offset (seconds)
    st.integers(min_value=0, max_value=5),  # user_id
    st.sampled_from(["view", "click", "purchase", "refund"]),
    st.one_of(  # value in cents, sometimes NULL
        st.none(), st.integers(min_value=-99999, max_value=99999)
    ),
)


def _oracle_for(name: str) -> str:
    return ORACLES.get(name) or NS_ORACLES[name]


@st.composite
def _mirrored_event_rows(draw):
    """Event rows built so every (user, event_type, ts) group's value
    sum — and every regression/covariance numerator over them — cancels
    EXACTLY: each drawn row is emitted twice, second copy with the
    value negated at the SAME timestamp.  Σ(x−x̄)·y over such pairs is
    identically zero, so q64's slope, q104's autocorr numerator and
    q108/q109-style folded sums all land on the round(±ε) signed-zero
    knife edge (PARITY #10) by construction — the events/orders
    counterpart of `_cancelling_vec` (round-6 verdict item 7)."""
    base = draw(st.lists(_row, min_size=1, max_size=20))
    mirrored = [
        (t, u, e, None if v is None else -v) for (t, u, e, v) in base
    ]
    return base + mirrored


#: mix organic row lists with exactly-cancelling ones (~1 in 3)
_adv_event_rows = st.one_of(
    st.lists(_row, min_size=0, max_size=40),
    st.lists(_row, min_size=0, max_size=40),
    _mirrored_event_rows(),
)


@pytest.mark.parametrize("name", EVENT_QUERIES)
@settings(
    max_examples=_EXAMPLES or 6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=_adv_event_rows)
def test_event_query_differential(spark, tmp_path_factory, name, rows):
    # Documented engine divergence (PARITY.md): Spark's ROLLUP on an
    # EMPTY relation emits 0 rows; DuckDB (per the SQL standard's
    # grand-total grouping set) emits one all-NULL row with count 0.
    # Driver data is never empty; the differential test honors the
    # documented boundary instead of hiding it.
    assume(rows or name != "q90_time_rollup")
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("diff")
    # explicit schema: an EMPTY pandas object column would otherwise be
    # written as parquet `null` type and break string comparisons
    table = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array(
                [_T0 + dt.timedelta(seconds=r[0]) for r in rows],
                type=pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows], type=pa.string()),
            "value": pa.array(
                [None if r[3] is None else r[3] / 100.0 for r in rows],
                type=pa.float64(),
            ),
            # real JSON derived from the drawn fields (hypothesis-varied
            # without widening the row strategy) — exercises the JSON
            # extraction ops; event_type is a safe enum, so embedding it
            # raw keeps the document valid
            "props": pa.array(
                [
                    '{"t": "%s", "v": %s}'
                    % (r[2], "null" if r[3] is None else r[3] / 100.0)
                    for r in rows
                ],
                type=pa.string(),
            ),
        }
    )
    pq.write_table(table, d / "events.parquet")

    sdf = QUERIES[name](spark, str(d)).toPandas()
    s_rows = check.pandas_rows(sdf)
    s_n, s_hash = check.canon_hash(list(sdf.columns), s_rows)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{d / 'events.parquet'}'"
    )
    odf = con.sql(_oracle_for(name)).fetchdf()
    o_rows = check.pandas_rows(odf)
    o_n, o_hash = check.canon_hash(list(odf.columns), o_rows)

    assert (s_n, s_hash) == (o_n, o_hash), (
        name,
        sorted(s_rows)[:5],
        sorted(o_rows)[:5],
    )


ORDER_QUERIES = [
    # round 12: paired signed-rank — mirrored rows drive d to exact
    # zeros (the exclusion branch) and tie-heavy |d| groups
    "q127_wilcoxon_signed_rank",
    # round 10
    "q123_mann_whitney",
    "q125_theil_index",
    "q126_cramers_v",
    "q38_approx_distinct",
    "q99_share_of_total",
    "q13_group_agg",
    "q26_rollup",
    "q91_grouping_id",
    "q89_grouped_quantiles",
    "q94_rank_distributions",
    "q96_relational_division",
    "q97_constraint_audit",
    "q98_incremental_rollup",
    "q100_crosstab_chi2",
    "q101_weighted_median",
    "q103_benford",
    "q105_skyline",
    "ns_assoc_rules",
    "tpch_q01",
    "tpch_q06",
    "tpch_q18",
    "tpch_q12",
    "tpch_q22",
    # round 7 additions from the six completing TPC-H 22 — mirrored
    # lineitems push Q9's profit to exactly −cost (negative divr
    # rounding) and Q17's money sum to exactly 0; dangling FKs
    # exercise Q13's ON-clause left join and Q21's per-order EXISTS
    # decorrelation.  Q7/Q8 are omitted: their 1995-96 date windows
    # never intersect the fixture's 1997-98 domain (q107/q06 boundary
    # assumptions), so they'd be vacuously empty here — their
    # adversarial coverage is the 3-SF oracle gate instead.
    "tpch_q09",
    "tpch_q13",
    "tpch_q17",
    "tpch_q21",
    "q107_full_outer_reconcile",
    "q111_mom_growth",
    "q112_not_in_nulls",
    "q116_spearman",
    "q117_gini",
    "q118_seasonal_decompose",
    "q120_ltv_curve",
    # round-7b coverage audit: every remaining single-table orders /
    # lineitem op joins the adversarial family
    "q01_projection",
    "q02_filter",
    "q04_count",
    "q05_filtered_count",
    "q06_sort_limit",
    "q07_offset_page",
    "q11_expression",
    "q12_json_serialize",
    "q14_having",
    "q20_distinct",
    "q21_count_distinct",
    "q22_window_rank",
    "q23_window_running_sum",
    "q27_dedup",
    "q28_date_funcs",
    "q30_case",
    "q36_cube",
    "q37_grouping_sets",
    "q40_scalar_subquery",
    "q42_pivot",
    "q44_percentile",
    "q44b_quantile_disc",
    "q45_stats",
    "q46_recursive_cte",
    "q50_lag_lead",
    "q51_conditional_agg",
    "q53_ntile",
    "q54_date_arith",
    "q55_range_frame",
    "q56_first_last",
    "q59_except_all",
    "q62_histogram",
    "q66_grouped_median",
    "q67_grouped_mode",
    "q69_median_abs_dev",
    "q70_equidepth_hist",
    "q77_zorder_key",
    "q81_rank_metrics",
    "q84_scd2_history",
    "q86_sequence_gaps",
    "q93_column_profile",
    # multi-table shapes whose hypothesis-varied side (orders /
    # lineitem) drives the result; static-dim-only ops (q24, q43,
    # tpch_q02/q11/q16) are omitted — their inputs never vary here —
    # and 1993-96-windowed TPC-H (q03/q04/q05/q10/q14/q15/q20, plus
    # the q07/q08 note above) is vacuously empty on the fixture's
    # 1997-98 date domain, so their adversarial gate stays the
    # three-scale oracle sweep
    "q15_inner_join",
    "q16_left_join",
    "q17_semi_join",
    "q18_anti_join",
    "q19_multiway_join",
    "q39_exists_subquery",
    "q41_cte",
    "q60_not_exists",
    "q78_bloom_join",
    "q83_cdc_apply",
    "q88_salted_join",
    "q113_percent_of_parent",
    "tpch_q19",
]

_order_row = st.tuples(
    st.integers(min_value=0, max_value=9),  # custkey
    st.sampled_from(["O", "F", "P"]),
    st.integers(min_value=-500000, max_value=500000),  # totalprice cents
    st.sampled_from(["1-URGENT", "2-HIGH", "3-MEDIUM"]),
    st.integers(min_value=0, max_value=27),  # orderdate day offset (2-D skyline needs variety)
)
_li_row = st.tuples(
    st.integers(min_value=0, max_value=60),  # l_orderkey (may dangle -> FK)
    st.integers(min_value=0, max_value=20),  # partkey
    st.integers(min_value=1, max_value=7),  # linenumber
    st.integers(min_value=-99999, max_value=999999),  # extendedprice cents
    st.sampled_from(["A", "N", "R"]),  # returnflag
    st.sampled_from(["F", "O"]),  # linestatus
    st.integers(min_value=0, max_value=60),  # quantity
    st.integers(min_value=0, max_value=10),  # discount (%, /100)
    st.integers(min_value=0, max_value=8),  # tax (%, /100)
    st.integers(min_value=0, max_value=27),  # shipdate day offset
    st.integers(min_value=0, max_value=5),  # suppkey (matches dim)
)


@st.composite
def _mirrored_order_rows(draw):
    """Orders whose per-(custkey, status, priority, date) totalprice
    sums cancel exactly — every drawn row re-emitted with negated
    cents — pushing share-of-total, MoM growth, Gini and chi²-style
    rounded rationals onto the signed-zero knife edge by construction."""
    base = draw(st.lists(_order_row, min_size=1, max_size=20))
    return base + [(ck, s, -c, p, d) for (ck, s, c, p, d) in base]


@st.composite
def _mirrored_li_rows(draw):
    """Lineitems re-emitted with negated extendedprice at identical
    quantity/discount/tax: price·(1−disc)·(1+tax) products cancel
    pairwise, so every revenue decimal sum in the TPC-H shapes is
    exactly zero."""
    base = draw(st.lists(_li_row, min_size=1, max_size=20))
    return base + [
        (ok, pk, ln, -ep, rf, ls, q, di, tx, sd, sk)
        for (ok, pk, ln, ep, rf, ls, q, di, tx, sd, sk) in base
    ]


_adv_order_rows = st.one_of(
    st.lists(_order_row, min_size=1, max_size=40),
    st.lists(_order_row, min_size=1, max_size=40),
    _mirrored_order_rows(),
)
_adv_li_rows = st.one_of(
    st.lists(_li_row, min_size=0, max_size=40),
    st.lists(_li_row, min_size=0, max_size=40),
    _mirrored_li_rows(),
)


@pytest.mark.parametrize("name", ORDER_QUERIES)
@settings(
    max_examples=_EXAMPLES or 6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(orows=_adv_order_rows, lrows=_adv_li_rows)
def test_order_query_differential(spark, tmp_path_factory, name, orows, lrows):
    # documented empty-relation ROLLUP divergence (see PARITY.md and
    # the event-family guard above)
    assume(lrows or name not in {"q26_rollup", "q91_grouping_id", "q36_cube"})
    d = tmp_path_factory.mktemp("diffo")
    pd.DataFrame(
        {
            "o_orderkey": pd.Series(range(1, len(orows) + 1), dtype="int64"),
            "o_custkey": pd.Series([r[0] for r in orows], dtype="int64"),
            "o_orderstatus": pd.Series([r[1] for r in orows], dtype="object"),
            "o_totalprice": pd.Series([r[2] / 100.0 for r in orows], dtype="float64"),
            # span the 1997/1998 snapshot boundary (q107) and two
            # months per year (q111 lag; q105 still sees 28 distinct
            # dates for 2-D dominance variety).  timestamp[us], the
            # real testdata physical type — the TPC-H year()/interval
            # arithmetic (q07/q08/q09/q21) needs a real timestamp.
            "o_orderdate": pd.Series(
                pd.to_datetime(
                    [
                        f"{1997 + (r[4] % 2)}-{r[4] // 14 + 1:02d}-{r[4] % 14 + 1:02d}"
                        for r in orows
                    ]
                )
            ).astype("datetime64[us]"),
            "o_orderpriority": pd.Series([r[3] for r in orows], dtype="object"),
        }
    ).to_parquet(d / "orders.parquet", index=False)
    # small fixed customer dimension matching the o_custkey domain
    pd.DataFrame(
        {
            "c_custkey": pd.Series(range(10), dtype="int64"),
            "c_name": pd.Series([f"Customer#{i}" for i in range(10)], dtype="object"),
            "c_nationkey": pd.Series([i % 3 for i in range(10)], dtype="int32"),
            "c_acctbal": pd.Series([100.0 * i for i in range(10)], dtype="float64"),
            "c_mktsegment": pd.Series(
                ["BUILDING" if i % 2 else "MACHINERY" for i in range(10)],
                dtype="object",
            ),
        }
    ).to_parquet(d / "customer.parquet", index=False)
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([r[0] for r in lrows], type=pa.int64()),
                "l_partkey": pa.array([r[1] for r in lrows], type=pa.int64()),
                "l_linenumber": pa.array([r[2] for r in lrows], type=pa.int32()),
                "l_extendedprice": pa.array(
                    [r[3] / 100.0 for r in lrows], type=pa.float64()
                ),
                "l_returnflag": pa.array([r[4] for r in lrows], type=pa.string()),
                "l_linestatus": pa.array([r[5] for r in lrows], type=pa.string()),
                "l_quantity": pa.array(
                    [float(r[6]) for r in lrows], type=pa.float64()
                ),
                "l_discount": pa.array(
                    [r[7] / 100.0 for r in lrows], type=pa.float64()
                ),
                "l_tax": pa.array([r[8] / 100.0 for r in lrows], type=pa.float64()),
                # split across the tpch_q06 boundary (1997 vs 1998) so
                # the date-range filter sees both populated and empty
                "l_shipdate": pa.array(
                    [
                        dt.datetime(1997 if r[9] < 14 else 1998, 3, r[9] % 14 + 1)
                        for r in lrows
                    ],
                    type=pa.timestamp("us"),
                ),
                "l_suppkey": pa.array([r[10] for r in lrows], type=pa.int64()),
            }
        ),
        d / "lineitem.parquet",
    )
    # fixed dimensions for the TPC-H shapes that join beyond
    # orders/customer/lineitem (q07/q08/q09/q13/q17/q21): part names
    # include the Q9 color token, brands include Q17's, nation names
    # cover Q7's pair, Q8's market nation and Q21's filter, supplier
    # balances include negatives (the Q16-style exclusion class)
    _names = ["red widget", "blue bolt", "hot gear", "cold ring", "red rod"]
    _brands = ["Brand#13", "Brand#14", "Brand#15"]
    _types = ["ECONOMY", "LARGE", "MEDIUM"]
    pd.DataFrame(
        {
            "p_partkey": pd.Series(range(21), dtype="int64"),
            "p_name": pd.Series([_names[i % 5] for i in range(21)], dtype="object"),
            "p_brand": pd.Series([_brands[i % 3] for i in range(21)], dtype="object"),
            "p_type": pd.Series([_types[i % 3] for i in range(21)], dtype="object"),
            "p_size": pd.Series([(i * 7) % 50 + 1 for i in range(21)], dtype="int32"),
            "p_retailprice": pd.Series(
                [100.0 + i for i in range(21)], dtype="float64"
            ),
        }
    ).to_parquet(d / "part.parquet", index=False)
    pd.DataFrame(
        {
            "s_suppkey": pd.Series(range(6), dtype="int64"),
            "s_name": pd.Series([f"Supplier#{i}" for i in range(6)], dtype="object"),
            "s_nationkey": pd.Series([i % 3 for i in range(6)], dtype="int32"),
            "s_acctbal": pd.Series([(i - 2) * 50.0 for i in range(6)], dtype="float64"),
        }
    ).to_parquet(d / "supplier.parquet", index=False)
    pd.DataFrame(
        {
            "n_nationkey": pd.Series(range(3), dtype="int32"),
            "n_name": pd.Series(
                ["NATION_8", "NATION_19", "NATION_15"], dtype="object"
            ),
            "n_regionkey": pd.Series([0, 1, 0], dtype="int32"),
        }
    ).to_parquet(d / "nation.parquet", index=False)
    pd.DataFrame(
        {
            "r_regionkey": pd.Series(range(2), dtype="int32"),
            "r_name": pd.Series(["AMERICA", "ASIA"], dtype="object"),
        }
    ).to_parquet(d / "region.parquet", index=False)

    sdf = QUERIES[name](spark, str(d)).toPandas()
    s_hash = check.canon_hash(list(sdf.columns), check.pandas_rows(sdf))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{d / 'orders.parquet'}'")
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{d / 'lineitem.parquet'}'")
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{d / 'customer.parquet'}'")
    for dim in ("part", "supplier", "nation", "region"):
        con.execute(
            f"CREATE VIEW {dim} AS SELECT * FROM '{d / (dim + '.parquet')}'"
        )
    odf = con.sql(_oracle_for(name)).fetchdf()
    o_hash = check.canon_hash(list(odf.columns), check.pandas_rows(odf))

    assert s_hash == o_hash, (name, len(sdf), len(odf))


DOC_QUERIES = [
    # round 12 (single-domain degenerate cases; the multi-domain
    # stress lives in test_domain_mixture_differential below)
    "ns_waterfill_cap",
    "ns_domain_reweight",
    "ns_sketch_shard_merge",
    # round 11 (ns_bm25_store builds its posting + doclen stores from
    # the generated corpus per example — the store path itself under
    # hostile text, compared against ns_bm25's oracle SQL)
    "ns_bm25_store",
    # round 10
    "ns_top_dup_spans",
    "ns_quality_by_dup",
    "ns_vocab_growth",
    "ns_dedup_savings",
    "ns_boolean_retrieval",
    "ns_length_outliers",
    "ns_preference_pairs",
    "ns_tokenizer_fertility",
    "ns_token_count",
    "ns_text_normalize",
    "ns_entropy",
    "ns_doc_fingerprint",
    "ns_dup_ngram_coverage",
    "ns_line_filter",
    "ns_lang_id",
    "ns_text_quality",
    "ns_pii_scrub",
    "ns_winnowing",
    "ns_tfidf",
    "ns_top_terms",
    "ns_boilerplate",
    "ns_dedup_simhash",
    "ns_dedup_minhash_lsh",
    "ns_sample_uniform",
    "ns_split_assign",
    "ns_mixture_sample",
    "ns_temperature_sample",
    "ns_decontaminate",
    "ns_doc_chunk",
    "ns_bpe_pair_counts",
    "ns_cluster_canonical",
    "ns_sample_k_per_group",
    # round-7b coverage audit: every remaining single-table documents op
    "ns_ngram_pmi",
    "ns_dedup_exact",
    "ns_dedup_fingerprint",
    "ns_dedup_prefix_jaccard",
    "ns_dedup_jaccard",
    "ns_dedup_containment",
    "ns_dedup_clusters",
    "ns_multimodal_meta",
    "ns_corpus_select",
    "ns_corpus_stats",
    "ns_repetition_filter",
    "ns_sequence_pack",
    "ns_quality_classifier",
    "ns_lm_fluency_bucket",
    "ns_cdc_chunk",
    "ns_corpus_drift",
    "ns_pagerank",
    "ns_triangle_count",
    "ns_training_corpus",
    "ns_vocab_oov",
    "ns_topk_per_source",
    "ns_corpus_diff",
    "ns_data_audit",
    "ns_substring_dedup",
    "ns_shard_layout",
    "ns_dsir_select",
    "ns_bm25",
    "ns_cross_split_leakage",
    "ns_heavy_hitters",
    "ns_chunk_dedup",
    "ns_filter_funnel",
    "ns_gate_agreement",
    "ns_neardup_editdist",
    "ns_cluster_size_hist",
    "ns_pack_fragmentation",
    "ns_classifier_calibration",
    "ns_quality_token_frontier",
    "ns_budget_select",
    "ns_lsh_recall",
    "ns_source_dedup_matrix",
    "ns_minhash_calibration",
    "ns_bigram_lm",
    "ns_cms_estimate",
    "ns_hll_manual",
    "ns_label_propagation",
    "ns_ngram_novelty",
    "ns_span_corruption",
    "ns_hll_set_ops",
    "ns_simpson_diversity",
    "ns_zipf_fit",
]

#: hostile text: every whitespace class the two regex engines disagree
#: on historically (tab, CR, LF, vertical tab, NBSP), plus repeats to
#: exercise dedup/ngram paths
_text = st.text(
    alphabet="ab xyZ.,!?\t\n\r\x0b -0123",
    min_size=0,
    max_size=80,
)


@pytest.mark.parametrize("name", DOC_QUERIES)
@settings(
    max_examples=_EXAMPLES or 5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(_text, min_size=1, max_size=12))
def test_doc_query_differential(spark, tmp_path_factory, name, texts):
    d = tmp_path_factory.mktemp("diffd")
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(texts)), dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series(["en"] * len(texts), dtype="object"),
            "source": pd.Series(["web"] * len(texts), dtype="object"),
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(d / "documents.parquet", index=False)

    try:
        sdf = QUERIES[name](spark, str(d)).toPandas()
        s_hash = check.canon_hash(list(sdf.columns), check.pandas_rows(sdf))

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d / 'documents.parquet'}'"
        )
        odf = con.sql(_oracle_for(name)).fetchdf()
        o_hash = check.canon_hash(list(odf.columns), check.pandas_rows(odf))

        assert s_hash == o_hash, (name, len(sdf), len(odf))
    finally:
        # evict this tmp corpus's chain/store entries AND drop any
        # session BM25 store tables it built — without this every
        # hypothesis example of ns_bm25_store leaves two managed
        # tables orphaned in the warehouse
        from cassandra_extractor_spark.operators.dedup import invalidate_dedup_chain

        invalidate_dedup_chain(spark, str(d))


@settings(
    max_examples=_EXAMPLES or 8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            _text,
            st.sampled_from(["en", "de", "zh", "xx"]),
            st.sampled_from(["web", "book", "code"]),
        ),
        min_size=1,
        max_size=16,
    )
)
def test_domain_mixture_differential(spark, tmp_path_factory, rows):
    """Hostile MULTI-domain corpora for the round-12 mixture/sketch
    ops: random lang labels stress the waterfilling boundary cases
    (ties, single domain, every-domain-capped) and the ln/exp parity
    of the exponentiated-gradient update; random source labels stress
    the shard-merge audit (empty shards, one-doc shards, shards whose
    docs are all <3 tokens) — the main doc differential keeps both
    labels fixed, which degenerates all three to one domain/shard."""
    d = tmp_path_factory.mktemp("diffm")
    texts = [t for t, _, _ in rows]
    pd.DataFrame(
        {
            "doc_id": pd.Series(range(len(rows)), dtype="int64"),
            "text": pd.Series(texts, dtype="object"),
            "lang": pd.Series([l for _, l, _ in rows], dtype="object"),
            "source": pd.Series([s for _, _, s in rows], dtype="object"),
            "n_chars": pd.Series([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(d / "documents.parquet", index=False)
    try:
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d / 'documents.parquet'}'"
        )
        for name in (
            "ns_waterfill_cap",
            "ns_domain_reweight",
            "ns_sketch_shard_merge",
        ):
            sdf = QUERIES[name](spark, str(d)).toPandas()
            s_hash = check.canon_hash(list(sdf.columns), check.pandas_rows(sdf))
            odf = con.sql(_oracle_for(name)).fetchdf()
            o_hash = check.canon_hash(list(odf.columns), check.pandas_rows(odf))
            assert s_hash == o_hash, (name, len(sdf), len(odf))
    finally:
        # the shard audit builds chain entries for the tmp corpus —
        # evict them so the LRU isn't churned by hypothesis examples
        from cassandra_extractor_spark.operators.dedup import invalidate_dedup_chain

        invalidate_dedup_chain(spark, str(d))


EMB_QUERIES = [
    # round 11
    "ns_kcenter_step",
    # round 10
    "ns_ann_symmetry",
    "ns_ann_cell_balance",
    "ns_ann_mrr",
    "ns_knn_classifier",
    "ns_cluster_purity",
    "ns_kmeans_step",
    "ns_semantic_dedup",
    "ns_neardup_embedding",
    "ns_embedding_audit",
    "ns_embedding_quantize",
    "ns_ann_cosine_topk",
    "ns_ann_ivf",
    "ns_ann_recall",
    "ns_hard_negatives",
    "ns_pca_power_iter",
    "ns_ranking_ndcg",
    "ns_embedding_centering",
    "ns_random_projection",
    "ns_linear_probe_step",
    "ns_mi_feature_select",
    # round-7b coverage audit: remaining single-table embeddings ops
    "q57_array_funcs",
    "q58_explode",
]

#: ops whose documented contract is the testdata's fixed DIM=64
#: (PQ sub-slices 8×8; the LSH plane matrix is 64-wide) — they get
#: their own 64-dim generator below instead of the 6-dim one
EMB64_QUERIES = [
    "ns_ann_pq",
    "ns_ann_lsh_bucketed",
    "ns_ann_ivfpq",
    "ns_ann_ivfpq_recall",
]

_vec = st.lists(
    st.integers(min_value=-2000, max_value=2000).map(lambda v: v / 1000.0),
    min_size=6,
    max_size=6,
)

from cassandra_extractor_spark.operators.similarity import (  # noqa: E402
    JL_DIMS as _JL_DIMS,
    _jl_sign as _jl,
)


@st.composite
def _cancelling_vec(draw):
    """Vector built so its ±1-signed sum under a REAL JL sign row is
    exactly zero in decimal: round(±1e-16·scale) then hits the signed
    -0.0/+0.0 split unless normalized (PARITY #10).  This generates by
    construction the input class hypothesis previously found by luck
    (round-5 ns_random_projection falsification)."""
    j = draw(st.integers(min_value=0, max_value=_JL_DIMS - 1))
    signs = [_jl(j, d) for d in range(1, 7)]
    # |Σ of 5 components| ≤ 5·400 = 2000, so the balancing tail always
    # fits the value domain — no filtering (hypothesis health check)
    head = [draw(st.integers(min_value=-400, max_value=400)) for _ in range(5)]
    tail = -signs[5] * sum(s * a for s, a in zip(signs, head))
    return [v / 1000.0 for v in head + [tail]]


#: mix organic vectors with exactly-cancelling ones (~1 in 3)
_adv_vec = st.one_of(_vec, _vec, _cancelling_vec())


@pytest.mark.parametrize("name", EMB_QUERIES)
@settings(
    max_examples=_EXAMPLES or 5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(_adv_vec, min_size=12, max_size=30))
def test_embedding_query_differential(spark, tmp_path_factory, name, vecs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("diffe")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vecs))], type=pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")

    sdf = QUERIES[name](spark, str(d)).toPandas()
    s_hash = check.canon_hash(list(sdf.columns), check.pandas_rows(sdf))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d / 'embeddings.parquet'}'")
    odf = con.sql(_oracle_for(name)).fetchdf()
    o_hash = check.canon_hash(list(odf.columns), check.pandas_rows(odf))

    assert s_hash == o_hash, (name, len(sdf), len(odf))


_vec64 = st.lists(
    st.integers(min_value=-2000, max_value=2000).map(lambda v: v / 1000.0),
    min_size=64,
    max_size=64,
)


@pytest.mark.parametrize("name", EMB64_QUERIES)
@settings(
    max_examples=_EXAMPLES or 5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(vecs=st.lists(_vec64, min_size=12, max_size=20))
def test_embedding64_query_differential(spark, tmp_path_factory, name, vecs):
    """The fixed-DIM=64 ops (PQ sub-slices, LSH plane matrix) under
    their documented embedding width — same compare as the 6-dim
    family, contract-respecting inputs."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("diffe64")
    table = pa.table(
        {
            "vec_id": pa.array(range(len(vecs)), type=pa.int64()),
            "embedding": pa.array(vecs, type=pa.list_(pa.float32())),
            "label": pa.array([i % 3 for i in range(len(vecs))], type=pa.int32()),
        }
    )
    pq.write_table(table, d / "embeddings.parquet")

    sdf = QUERIES[name](spark, str(d)).toPandas()
    s_hash = check.canon_hash(list(sdf.columns), check.pandas_rows(sdf))

    con = duckdb.connect()
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{d / 'embeddings.parquet'}'")
    odf = con.sql(_oracle_for(name)).fetchdf()
    o_hash = check.canon_hash(list(odf.columns), check.pandas_rows(odf))

    assert s_hash == o_hash, (name, len(sdf), len(odf))
