"""Round-13 optimization guards: the respelled operators stay
value-identical to their pre-optimization spellings, and the plan
properties the optimizations bought are asserted so they can't
silently regress.

- tpch_q01 / q13_group_agg / q19_multiway_join: two-level money
  aggregation — per-partition LONG micro-unit partials merged through
  DECIMAL(38,0) instead of per-input-row non-compact DECIMAL(28,6)
  buffer updates (see the tpch_q01 comment).
- ns_cms_estimate / ns_boilerplate: both plan branches read the
  session-shared materialized token/shingle frame instead of each
  re-running the corpus explode (Catalyst does not dedupe common
  subplans).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cassandra_extractor_spark.operators.relational import _money, _t
from cassandra_extractor_spark.operators.tpch import Q1_CUTOFF


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_tpch_q01_matches_one_level_decimal_sum(spark, sf_dir):
    """Value-identity against the pre-r13 one-level decimal spelling
    (sums only — the downstream rounding/div logic is shared code)."""
    from cassandra_extractor_spark.operators.tpch import tpch_q01

    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= Q1_CUTOFF)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    ref = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("sq"),
            F.sum(_money(F.col("l_extendedprice"))).alias("sp"),
            F.sum(_money(disc_price)).alias("sdp"),
            F.sum(_money(charge)).alias("sch"),
            F.count("*").cast("long").alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sq").cast("double").alias("sum_qty"),
            F.round("sp", 2).cast("double").alias("sum_base_price"),
            F.round("sdp", 2).cast("double").alias("sum_disc_price"),
            F.round("sch", 2).cast("double").alias("sum_charge"),
            F.col("n").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    got = tpch_q01(spark, sf_dir).select(
        "l_returnflag",
        "l_linestatus",
        "sum_qty",
        "sum_base_price",
        "sum_disc_price",
        "sum_charge",
        "count_order",
    )
    assert _rows(got) == _rows(ref)


def test_q13_q19_match_one_level_decimal_sum(spark, sf_dir):
    from cassandra_extractor_spark.operators.relational import (
        q13_group_agg,
        q19_multiway_join,
    )

    ref13 = (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(_money(F.col("l_extendedprice"))), 2)
            .cast("double")
            .alias("sum_price"),
            F.count("*").alias("cnt"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    assert _rows(q13_group_agg(spark, sf_dir)) == _rows(ref13)

    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    n = _t(spark, sf_dir, "nation")
    ref19 = (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2
            )
            .cast("double")
            .alias("rev")
        )
        .orderBy("n_name")
    )
    assert _rows(q19_multiway_join(spark, sf_dir)) == _rows(ref19)


@pytest.mark.parametrize(
    "qname", ["tpch_q01", "q13_group_agg", "q19_multiway_join"]
)
def test_two_level_money_plan_shape(spark, sf_dir, qname):
    """The optimized plans must carry NO wide-decimal partial sum over
    the input rows: partials are long sums keyed by spark_partition_id;
    only the (groups × partitions)-row merge sums decimal(38,0)."""
    from cassandra_extractor_spark.registry import QUERIES

    df = QUERIES[qname](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper(), plan[:2000]
    # structural check (ADVICE r13: no paren-count string matching):
    # pull each partial_sum's FULL argument via balanced-paren
    # extraction and classify it.  The two-level spelling's row-level
    # partials are long sums (the micros cast); a reappearing one-level
    # spelling shows up as a partial_sum whose argument is a
    # decimal(18,6) cast with no bigint cast around it.  If the plan
    # printer ever renames partial_sum the extraction comes back empty
    # and the first assert fails loudly instead of silently guarding
    # nothing.
    args, i = [], 0
    while True:
        j = plan.find("partial_sum(", i)
        if j < 0:
            break
        k = j + len("partial_sum(")
        depth, m = 1, k
        while depth and m < len(plan):
            if plan[m] == "(":
                depth += 1
            elif plan[m] == ")":
                depth -= 1
            m += 1
        args.append(plan[k : m - 1])
        i = m
    assert args, "no partial_sum nodes found — plan printer changed?"
    assert any("bigint" in a for a in args), (
        "long micro-unit partials missing:\n" + "\n".join(args)
    )
    for a in args:
        if "decimal(18,6)" in a:
            assert "bigint" in a, (
                "per-row decimal partial sum reappeared: " + a
            )


@pytest.mark.parametrize("qname", ["ns_cms_estimate", "ns_boilerplate"])
def test_shared_frame_plans_scan_no_documents_text(spark, sf_dir, qname):
    """Both heavy branches read the session-shared materialized frame —
    the executed plan must never re-tokenize the corpus, i.e. no scan
    of the documents ``text`` column.  (ns_boilerplate keeps ONE
    column-pruned doc_id-only scan for the shingle-less-docs left
    join; ns_cms_estimate has no documents scan at all.)"""
    from cassandra_extractor_spark.registry import QUERIES

    df = QUERIES[qname](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    if qname == "ns_cms_estimate":
        assert "documents.parquet" not in plan, plan[:2000]
    else:
        # the doc_id left-join scan survives, pruned to doc_id only
        assert plan.count("documents.parquet") >= 1
        for line in plan.splitlines():
            if "ReadSchema" in line and "documents" in line:
                assert "text" not in line, line
        # and the corpus re-tokenization is gone: no explode anywhere
        assert "explode" not in plan.lower(), plan[:2000]


def test_cms_and_boilerplate_match_from_scratch_spelling(spark, sf_dir):
    """Value-identity against the pre-r13 direct-explode spellings."""
    from cassandra_extractor_spark.operators.dedup import (
        _md5_hash64,
        exploded_shingles,
    )
    from cassandra_extractor_spark.operators.text import (
        BOILERPLATE_MIN_DOCS,
        CMSQ_ROWS,
        CMSQ_TOP,
        CMSQ_WIDTH,
        ns_boilerplate,
        ns_cms_estimate,
        tokens,
    )
    from cassandra_extractor_spark.sources.catalog import load_table

    d = load_table(spark, "documents", sf_dir)
    toks = d.select(F.explode(tokens(F.col("text"))).alias("tok"))

    def bucket(r):
        return F.pmod(_md5_hash64(F.col("tok"), f"cms{r}"), F.lit(CMSQ_WIDTH))

    cells = (
        toks.select(
            F.explode(
                F.array(
                    *[
                        F.struct(F.lit(r).alias("r"), bucket(r).alias("b"))
                        for r in range(CMSQ_ROWS)
                    ]
                )
            ).alias("cell")
        )
        .select("cell.r", "cell.b")
        .groupBy("r", "b")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").cast("long").alias("true_n"))
        .orderBy(F.col("true_n").desc(), "tok")
        .limit(CMSQ_TOP)
    )
    probes = top.select(
        "tok",
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), bucket(r).alias("b"))
                    for r in range(CMSQ_ROWS)
                ]
            )
        ).alias("p"),
    ).select("tok", "true_n", "p.r", "p.b")
    ref_cms = (
        probes.join(F.broadcast(cells), ["r", "b"])
        .groupBy("tok", "true_n")
        .agg(F.min("cnt").alias("est_n"))
        .orderBy(F.col("true_n").desc(), "tok")
    )
    assert _rows(ns_cms_estimate(spark, sf_dir)) == _rows(ref_cms)

    sh = exploded_shingles(d).distinct()
    common = (
        sh.groupBy("sh")
        .agg(F.count("*").alias("nd"))
        .where(F.col("nd") >= BOILERPLATE_MIN_DOCS)
        .select("sh", F.lit(1).alias("is_bp"))
    )
    per_doc = (
        sh.join(F.broadcast(common), "sh", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_sh"),
            F.sum(F.when(F.col("is_bp").isNull(), 0).otherwise(1))
            .cast("long")
            .alias("n_bp"),
        )
    )
    ref_bp = (
        d.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_sh", F.lit(0)).alias("n_sh"),
            F.coalesce("n_bp", F.lit(0)).alias("n_bp"),
            (
                F.coalesce("n_bp", F.lit(0)) * 2 <= F.coalesce("n_sh", F.lit(0))
            ).alias("keep"),
        )
        .orderBy("doc_id")
    )
    assert _rows(ns_boilerplate(spark, sf_dir)) == _rows(ref_bp)


@pytest.mark.parametrize("kernel", ["dot", "l2sq"])
def test_arrow_fold_kernels_bit_identical_to_hof_fold(spark, kernel):
    """The Arrow-vectorized fold kernels must be BIT-identical to the
    interpreted zip_with/aggregate folds they replaced at the
    candidate-pair/corpus-encode hotspots — including the edge cases:
    null arrays, unequal lengths (fold → NULL), empty arrays (fold
    init 0.0), mixed widths in one batch, NaN/Inf elements, and
    catastrophic-cancellation sums where any reassociation would
    change the low bits."""
    import math
    import struct

    if kernel == "dot":
        from cassandra_extractor_spark.operators.dedup import dot_batch as dot
        from cassandra_extractor_spark.operators.dedup import dot as dot_hof
    else:
        from cassandra_extractor_spark.operators.similarity import (
            _l2sq_batch as dot,
            _l2sq as dot_hof,
        )

    rows = [
        ([0.1] * 64, [0.3] * 64),
        ([1e16, 1.0, -1e16, 1.0], [1.0, 1.0, 1.0, 1.0]),  # cancellation
        ([0.1, 0.2, 0.3, 0.4, 0.5, 0.6], [-0.6, 0.5, -0.4, 0.3, -0.2, 0.1]),
        ([float("nan"), 1.0], [1.0, 1.0]),
        ([float("inf"), 1.0], [1.0, -1.0]),
        ([], []),
        (None, [1.0, 2.0]),
        ([1.0, 2.0], None),
        ([1.0, 2.0, 3.0], [1.0, 2.0]),  # unequal → NULL
        ([-0.0, 0.0], [0.0, -0.0]),  # signed-zero init path
        ([1e-308, 1e-308], [1e-308, 1e-308]),  # subnormal products
    ]
    df = spark.createDataFrame(rows, "x: array<double>, y: array<double>")
    got = df.select(dot(F.col("x"), F.col("y")).alias("d")).collect()
    ref = df.select(dot_hof(F.col("x"), F.col("y")).alias("d")).collect()

    def bits(v):
        if v is None:
            return None
        return struct.pack("<d", v)  # NaN payload + signed zero visible

    assert [bits(r["d"]) for r in got] == [bits(r["d"]) for r in ref]
    # sanity on the known cases
    assert got[5]["d"] == 0.0 and got[6]["d"] is None and got[8]["d"] is None
    assert math.isnan(got[3]["d"])
