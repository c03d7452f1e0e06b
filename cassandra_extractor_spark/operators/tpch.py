"""Faithful TPC-H query adaptations over the synthetic star schema.

The relational registry already exercises every operator class in
isolation (q01-q106); these are the CLASSIC composed benchmark shapes
— the queries a user migrating an analytics workload actually runs —
adapted only where the synthetic schema lacks a TPC-H column (no
partsupp table, no l_shipmode/l_commitdate, abbreviated p_type
domain).  Money arithmetic follows the repo's exact-decimal pattern
(`relational._money`): products are deterministic double expressions,
sums accumulate in DECIMAL(18,6) (order-independent), and the final
ROUND(..., 2) agrees bit-for-bit with the oracle.

Plan notes (the 100 TB shapes, verified via EXPLAIN at sf0.01):
- Q1/Q6 are single-scan map-side-combined aggregates with the date
  filter pushed to parquet.
- Q3/Q10/Q18 shuffle on the join keys with AQE choosing broadcast for
  the dimension sides; top-k outputs are TakeOrderedAndProject.
- Q5 joins six tables; nation/region broadcast, the local-supplier
  condition (c_nationkey = s_nationkey) rides the supplier join.
- Q14's promo share is two conditional decimal sums in ONE aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cassandra_extractor_spark.operators.relational import _money, _t, divr_sql

Q1_CUTOFF = "2000-09-02"
Q3_DATE = "1998-03-15"
Q3_SEGMENT = "BUILDING"
Q5_REGION = "ASIA"
Q5_FROM, Q5_TO = "1996-01-01", "1997-01-01"
Q6_FROM, Q6_TO = "1997-01-01", "1998-01-01"
Q6_DISC_LO, Q6_DISC_HI = 0.05, 0.07
Q6_QTY = 24
Q10_FROM, Q10_TO = "1996-10-01", "1997-01-01"
Q14_FROM, Q14_TO = "1997-09-01", "1997-10-01"
Q18_QTY = 300


def tpch_q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary report (full column set).

    The averages are EXACT-INTEGER rounded (``divr_sql``): sum/count is
    a rational, and rounding its double can land on a .5 boundary where
    Spark (shortest-repr HALF_UP) and DuckDB (binary) disagree — the
    differential harness found avg_price = 4925.11/2 doing exactly
    that.  Micros-scaled decimal sums + truncating div dodge the
    boundary; the final units→double division by 10^k is identical
    IEEE on both engines.
    """
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= Q1_CUTOFF)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    # Two-level exact-decimal aggregation (optimization r13, guide §1.2
    # "per-task work"): Spark sums DECIMAL(18,6) into a DECIMAL(28,6)
    # buffer, and precision > 18 leaves the Decimal compact-long fast
    # path — every one of the 5 money sums paid a BigDecimal
    # deserialize/add/reserialize per input row.  Each row's money value
    # IS an exact integer count of 1e-6 units (the _money cast defines
    # it), so the per-partition partial sums accumulate as plain LONGs
    # (codegen primitive) and only the per-partition subtotals — a few
    # rows per group — merge through DECIMAL(38,0).  Values are
    # bit-identical: the micro-unit extraction keeps the exact
    # double→DECIMAL(18,6) cast semantics, long addition of micro units
    # is associative/exact, and the final micros→DECIMAL(28,6) rescale
    # is exact (≤ 6 fractional digits by construction).  Measured 2.5 s
    # → 1.34 s at sf0.1 (the all-double floor is 0.34 s; the remaining
    # cost is the per-row exact decimal casts the oracle contract
    # requires).  Overflow bound: |micros| ≤ 1e12/row ⇒ a partition of
    # ≤ ~9.2e6 max-value rows stays < 2^63; the merged totals are
    # decimal.  Failure mode is LOUD (ANSI on — the repo never disables
    # Spark 4's default): an overflowing partial raises
    # ARITHMETIC_OVERFLOW instead of wrapping, so a skew-blown
    # partition aborts rather than corrupting money sums — see
    # relational._money_micros and the single-partition guard test in
    # tests/test_optimization_r14.py.
    micros = lambda c: (_money(c) * F.lit(1_000_000)).cast("long")  # noqa: E731
    dec38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    partial = li.groupBy(
        "l_returnflag", "l_linestatus", F.spark_partition_id().alias("pid")
    ).agg(
        F.sum(micros(F.col("l_quantity"))).alias("mq"),
        F.sum(micros(F.col("l_extendedprice"))).alias("mp"),
        F.sum(micros(disc_price)).alias("mdp"),
        F.sum(micros(charge)).alias("mch"),
        F.sum(micros(F.col("l_discount"))).alias("md"),
        F.count("*").alias("pc"),
    )
    # exact rescale micros → the DECIMAL(28,6) the one-level sum produced
    unm = lambda c: (F.col(c).cast("decimal(38,6)") / F.lit(1_000_000)).cast(  # noqa: E731
        "decimal(28,6)"
    )
    agg = (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec38("mq")).alias("sqm"),
            F.sum(dec38("mp")).alias("spm"),
            F.sum(dec38("mdp")).alias("sdpm"),
            F.sum(dec38("mch")).alias("schm"),
            F.sum(dec38("md")).alias("sdm"),
            F.sum("pc").cast("long").alias("count_order"),
        )
        .withColumn(
            "d2", (F.col("count_order") * F.lit(10_000)).cast("decimal(38,0)")
        )
        .withColumn(
            "d4", (F.col("count_order") * F.lit(100)).cast("decimal(38,0)")
        )
    )
    return agg.select(
        "l_returnflag",
        "l_linestatus",
        unm("sqm").cast("double").alias("sum_qty"),
        F.round(unm("spm"), 2).cast("double").alias("sum_base_price"),
        F.round(unm("sdpm"), 2).cast("double").alias("sum_disc_price"),
        F.round(unm("schm"), 2).cast("double").alias("sum_charge"),
        (F.expr(divr_sql("sqm", "d2")).cast("double") / F.lit(100.0)).alias(
            "avg_qty"
        ),
        (F.expr(divr_sql("spm", "d2")).cast("double") / F.lit(100.0)).alias(
            "avg_price"
        ),
        (F.expr(divr_sql("sdm", "d4")).cast("double") / F.lit(10_000.0)).alias(
            "avg_disc"
        ),
        "count_order",
    ).orderBy("l_returnflag", "l_linestatus")


def tpch_q03(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shipping-priority: top-10 unshipped-order revenue."""
    c = _t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == Q3_SEGMENT)
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") < Q3_DATE)
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > Q3_DATE)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
        .agg(F.round(F.sum(_money(rev)), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def tpch_q05(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 local-supplier volume: the full six-table join."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q5_FROM) & (F.col("o_orderdate") < Q5_TO)
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q5_REGION)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(_money(rev)), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def tpch_q06(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 forecast-revenue change: one pushdown-filtered scan."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q6_FROM)
        & (F.col("l_shipdate") < Q6_TO)
        & (F.col("l_discount") >= Q6_DISC_LO)
        & (F.col("l_discount") <= Q6_DISC_HI)
        & (F.col("l_quantity") < Q6_QTY)
    )
    return li.agg(
        F.round(
            F.sum(_money(F.col("l_extendedprice") * F.col("l_discount"))), 2
        )
        .cast("double")
        .alias("revenue"),
        F.count("*").cast("long").alias("n_lines"),
    )


def tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 returned-item reporting: top-20 lossy customers."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q10_FROM) & (F.col("o_orderdate") < Q10_TO)
    )
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(_money(rev)), 2).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 promotion effect: promo revenue share in percent."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q14_FROM) & (F.col("l_shipdate") < Q14_TO)
    )
    p = _t(spark, sf_dir, "part")
    rev = _money(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(F.sum(promo).alias("pr"), F.sum(rev).alias("tr"))
        # 100·pr/tr is an exact rational: round it in integer 1e-4
        # units (divr_sql) — never through round(double) (see tpch_q01)
        .withColumn("prm", (F.col("pr") * F.lit(1_000_000)).cast("decimal(38,0)"))
        # tr = 0 yields NULL output, but ANSI mode evaluates div's
        # denominator eagerly — substitute a harmless 1
        .withColumn(
            "trm",
            F.when(F.col("tr") != 0, F.col("tr") * F.lit(1_000_000))
            .otherwise(F.lit(1))
            .cast("decimal(38,0)"),
        )
    )
    return agg.select(
        F.when(
            F.col("tr") != 0,
            F.expr(divr_sql("prm * 1000000", "trm")).cast("double")
            / F.lit(10_000.0),
        ).alias("promo_revenue_pct")
    )


def tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 large-volume customers (sum(qty) > threshold)."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("total_qty"))
        .where(F.col("total_qty") > Q18_QTY)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.to_date("o_orderdate").alias("o_orderdate"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
    )


Q4_FROM, Q4_TO = "1996-07-01", "1996-10-01"
Q12_FROM, Q12_TO = "1997-01-01", "1998-01-01"
Q12_CLASSES = ("A", "R")
Q12_HIGH = ("1-URGENT", "2-HIGH")
Q15_FROM, Q15_TO = "1997-01-01", "1997-04-01"
Q19_BRANCHES = (
    ("Brand#12", 1, 5, 1, 11),
    ("Brand#23", 1, 10, 10, 20),
    ("Brand#34", 1, 15, 20, 30),
)
Q22_LAPSE = "2000-01-01"


def tpch_q04(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 order-priority checking.

    Adaptation: the synthetic lineitem has no l_commitdate /
    l_receiptdate, so the Q4 lateness EXISTS becomes "some item
    shipped after the order date" (l_shipdate > o_orderdate) — the
    same correlated-semijoin shape with a non-equi conjunct riding
    the join.  Plan: date filter pushed to the orders scan, LEFT SEMI
    join on l_orderkey with AQE free to broadcast the filtered
    orders side, map-side-combined count.
    """
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q4_FROM) & (F.col("o_orderdate") < Q4_TO)
    )
    li = _t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").cast("long").alias("order_count"))
        .orderBy("o_orderpriority")
    )


def tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shipping-priority split.

    Adaptation: no l_shipmode column, so the two-mode IN filter and
    grouping run on l_returnflag ('A','R'), and the receipt-year
    filter runs on l_shipdate — identical join + dual conditional
    count shape.  The priority split is two conditional integer sums
    in ONE aggregate (single scan, map-side combined); the
    orders↔lineitem join shuffles on the order key.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin(*Q12_CLASSES)
        & (F.col("l_shipdate") >= Q12_FROM)
        & (F.col("l_shipdate") < Q12_TO)
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin(*Q12_HIGH)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("ship_class")
    )


def tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 top supplier (view + scalar-max subquery).

    Per-supplier quarterly revenue accumulates in DECIMAL(18,6) and
    rounds to cents BEFORE the max comparison, so the argmax is an
    exact decimal equality on both engines.  Plan: one map-side-
    combined aggregate over the date-pruned lineitem scan; the
    single-row MAX broadcasts back (scalar subquery → broadcast
    nested loop), and the supplier dimension joins broadcast.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q15_FROM) & (F.col("l_shipdate") < Q15_TO)
    )
    s = _t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2
        ).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(top, revenue.total_revenue == top.mx)
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 discounted revenue under a disjunctive predicate.

    Adaptation: no p_container, so each OR branch pairs a brand with
    a p_size band and an l_quantity band (same three-branch
    disjunction over join-mixed columns).  The part-only conjuncts
    (brand IN, size ≥ 1) are pushed below the join as a pre-filter so
    the joined row set is already brand-restricted; the full
    disjunction applies post-join.  Revenue is one decimal sum.
    """
    brands = sorted({b for b, *_ in Q19_BRANCHES})
    p = _t(spark, sf_dir, "part").where(F.col("p_brand").isin(brands))
    li = _t(spark, sf_dir, "lineitem")
    j = li.join(p, li.l_partkey == p.p_partkey)
    cond = None
    for brand, size_lo, size_hi, qty_lo, qty_hi in Q19_BRANCHES:
        c = (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(size_lo, size_hi)
            & F.col("l_quantity").between(qty_lo, qty_hi)
        )
        cond = c if cond is None else (cond | c)
    return j.where(cond).agg(
        F.round(
            F.sum(_money(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2
        )
        .cast("double")
        .alias("revenue")
    )


def tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 global sales opportunity.

    Adaptation: no c_phone, so the country code is c_nationkey and
    the candidate set is every nation; and because every synthetic
    customer has at least one order, "no orders" becomes "no orders
    since Q22_LAPSE" (lapsed customers — the realistic churn variant
    of the same anti-join).  Otherwise the same shape:
    positive-balance customers above the positive-balance average,
    minus recently-active customers, rolled up per country.  The
    above-average test is the exact integer cross-multiplication
    cents·n > total_cents (no engine-dependent double average), the
    single-row global aggregate broadcasts back, and the orders
    exclusion is a LEFT ANTI join on the customer key.
    """
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
    )
    pos = c.where(F.col("bal_cents") > 0)
    glob = pos.agg(
        F.count("*").cast("long").alias("n_pos"),
        F.sum(F.col("bal_cents").cast("decimal(38,0)")).alias("total_cents"),
    )
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderdate") >= Q22_LAPSE)
    rich = pos.crossJoin(F.broadcast(glob)).where(
        F.col("bal_cents").cast("decimal(38,0)") * F.col("n_pos")
        > F.col("total_cents")
    )
    return (
        rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.sum("bal_cents").cast("long").alias("totacctbal_cents"),
        )
        .orderBy("cntrycode")
    )



# --- round 7: the partsupp quartet (Q2 / Q11 / Q16 / Q20) ------------
#
# /root/testdata ships no partsupp table, so these four queries DERIVE
# one deterministically from the keys that do exist — pure integer
# arithmetic over part × {0,1,2,3} (4 suppliers per part, as in the
# TPC-H spec), identical expression by expression to the oracle's CTE
# (registry.PARTSUPP_CTE), so both engines see the same relation:
#
#   ps_suppkey     = (p_partkey*13 + i*29) % count(supplier)
#   ps_availqty    = (p_partkey*17 + i*31) % 9999 + 1
#   ps_cost_cents  = (p_partkey*29 + i*37) % 99901 + 100
#
# 29 is coprime to every supplier count (10/100/1000 across SFs), so
# the four suppliers of a part are always distinct.  Supply cost is
# kept in INTEGER CENTS end to end — min/equality/sum/compare are all
# exact, sidestepping every cross-engine double hazard (PARITY #7-10).

PS_FANOUT = 4
Q2_SIZE_MAX = 15
Q2_TYPE = "LARGE"
Q2_REGION = "EUROPE"
Q11_NATION = "NATION_13"  # has suppliers at every test SF
Q11_AVG_MULT = 2  # HAVING sum > 2 × the average part value (spec: 0.0001/SF)
Q16_BRAND = "Brand#15"
Q16_TYPE_PREFIX = "MEDIUM"
Q16_SIZES = [1, 4, 9, 16, 25, 36, 49, 50]
Q20_NAME_PREFIX = "hot "
Q20_FROM, Q20_TO = "1997-01-01", "1998-01-01"


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp relation (see module comment above).

    Plan shape: a map-only projection of ``part`` exploded ×4 with the
    1-row supplier count broadcast in — no shuffle; at 100 TB this is
    exactly how a generated dimension should enter the plan (generate
    beside the fact scan, never materialize driver-side).
    """
    nsupp = F.broadcast(
        _t(spark, sf_dir, "supplier").agg(F.count("*").cast("long").alias("nsupp"))
    )
    return (
        _t(spark, sf_dir, "part")
        .select("p_partkey")
        .crossJoin(nsupp)
        .select(
            "p_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(PS_FANOUT)])).alias("i"),
            "nsupp",
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 13 + F.col("i") * 29) % F.col("nsupp"))
            .cast("long")
            .alias("ps_suppkey"),
            ((F.col("p_partkey") * 17 + F.col("i") * 31) % 9999 + 1)
            .cast("long")
            .alias("ps_availqty"),
            ((F.col("p_partkey") * 29 + F.col("i") * 37) % 99901 + 100)
            .cast("long")
            .alias("ps_cost_cents"),
        )
    )


def tpch_q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 minimum-cost supplier (correlated scalar subquery).

    Adaptation: derived partsupp; p_brand stands in for the absent
    p_mfgr; the part filter is p_type = :t AND p_size <= :s (the
    synthetic p_type domain has no '%BRASS'-style suffixes).  The
    correlated MIN decorrelates the standard way: aggregate the
    region-restricted partsupp per partkey, then join back on
    (partkey, cost) — cost in integer cents so the equality is exact.
    The part filter is applied BEFORE the MIN (the correlated
    subquery only ever runs for filtered partkeys), so at 100 TB the
    aggregate sees |filtered parts|·4 rows, not the whole regional
    partsupp.  Region/nation/supplier/part are broadcast dimensions;
    the only shuffle is the per-partkey MIN.
    """
    ps = _partsupp(spark, sf_dir)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q2_REGION)
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_type") == Q2_TYPE) & (F.col("p_size") <= Q2_SIZE_MAX)
    )
    rs = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select(
            "ps_partkey",
            "ps_suppkey",
            "ps_cost_cents",
            "s_name",
            "s_acctbal",
            "n_name",
            "p_partkey",
            "p_brand",
        )
    )
    mn = rs.groupBy("ps_partkey").agg(F.min("ps_cost_cents").alias("min_cents"))
    return (
        rs.join(mn, ["ps_partkey"])
        .where(F.col("ps_cost_cents") == F.col("min_cents"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_brand",
            F.col("ps_cost_cents").alias("supplycost_cents"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


def tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 important stock (group HAVING vs a global-fraction
    scalar).

    Adaptation: derived partsupp; nation literal from the synthetic
    domain; the spec's 0.0001/SF fraction scales with SF precisely
    because per-part shares shrink as the relation grows, so the
    SF-free equivalent is SELF-scaling: keep parts whose value
    exceeds Q11_AVG_MULT × the average part value.  Value is
    availqty·cost in integer cents; the HAVING is the exact
    cross-multiplication sum·n_parts > mult·total (no double
    average), with the 1-row global aggregate broadcast back — the
    same shape as Q22's above-average test.
    """
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q11_NATION)
    ps = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(s), F.col("ps_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_availqty") * F.col("ps_cost_cents")).alias("value_cents"),
        )
    )
    per_part = ps.groupBy("ps_partkey").agg(
        F.sum(F.col("value_cents").cast("decimal(38,0)")).alias("sum_cents")
    )
    glob = per_part.agg(
        F.sum("sum_cents").alias("total_cents"),
        F.count("*").cast("long").alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(glob))
        .where(
            F.col("sum_cents") * F.col("n_parts")
            > F.col("total_cents") * Q11_AVG_MULT
        )
        .select(
            "ps_partkey",
            (F.col("sum_cents").cast("double") / 100.0).alias("value"),
        )
        .orderBy(F.desc("value"), "ps_partkey")
    )


def tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 parts/supplier relationship (COUNT DISTINCT after a
    NOT IN exclusion).

    Adaptation: derived partsupp; the "customer complaints" supplier
    exclusion keys on s_acctbal < 0 (no s_comment column).  The
    supplier NOT IN list is NULL-free by construction, so it is a
    plain broadcast anti join; the distinct supplier count shuffles
    once on the (brand, type, size) group key.
    """
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select("s_suppkey")
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != Q16_BRAND)
        & ~F.col("p_type").startswith(Q16_TYPE_PREFIX)
        & F.col("p_size").isin(Q16_SIZES)
    )
    return (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(bad), F.col("ps_suppkey") == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), F.col("ps_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 potential part promotion (nested IN chain over a
    correlated half-of-shipped-quantity scalar).

    Adaptation: derived partsupp; p_name LIKE 'hot %' stands in for
    'forest%'; n_name for the absent s_address.  The correlated
    SUM(l_quantity) decorrelates to a grouped aggregate on
    (l_partkey, l_suppkey) joined back on both keys; quantities are
    integral doubles so the BIGINT sum and the availqty·2 > sum
    comparison are exact.  An empty correlation group means the spec's
    0.5·NULL comparison is false — the inner join encodes exactly
    that.  The candidate-supplier set is DISTINCT before the final
    supplier/nation broadcast joins.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q20_FROM) & (F.col("l_shipdate") < Q20_TO)
    )
    qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq")
    )
    hot = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").startswith(Q20_NAME_PREFIX))
        .select("p_partkey")
    )
    cand = (
        _partsupp(spark, sf_dir)
        .join(F.broadcast(hot), F.col("ps_partkey") == hot.p_partkey)
        .join(
            qty,
            (F.col("ps_partkey") == qty.l_partkey)
            & (F.col("ps_suppkey") == qty.l_suppkey),
        )
        .where(F.col("ps_availqty") * 2 > F.col("sq"))
        .select("ps_suppkey")
        .distinct()
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        cand.join(s, cand.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(F.col("s_suppkey"), "s_name", "n_name")
        .orderBy("s_suppkey")
    )


#: The oracle-side mirror of ``_partsupp`` — expression by expression
#: the same integer arithmetic, so both engines derive the identical
#: relation.  Interpolated as the leading CTE of the Q2/Q11/Q16/Q20
#: oracles in registry.ORACLES.
PARTSUPP_CTE = (
    "partsupp AS (SELECT p_partkey AS ps_partkey, "
    "(p_partkey * 13 + i * 29) % (SELECT COUNT(*) FROM supplier) AS ps_suppkey, "
    "(p_partkey * 17 + i * 31) % 9999 + 1 AS ps_availqty, "
    "(p_partkey * 29 + i * 37) % 99901 + 100 AS ps_cost_cents "
    "FROM part CROSS JOIN (VALUES (0), (1), (2), (3)) AS gen(i))"
)


# --- round 7 (cont.): the remaining six — full TPC-H 22 --------------
#
# Adaptations (same policy as the module header — only where the
# synthetic schema lacks a column, each noted on the query):
# - Q13's o_comment NOT LIKE '%special%requests%' → an o_orderpriority
#   exclusion (the only free-text-ish orders column here).
# - Q17's p_container equality → p_brand alone carries the
#   part-selection role (no container column).
# - Q21's l_receiptdate > l_commitdate "late" predicate → shipped
#   more than Q21_LATE_DAYS after the order date (the only two dates
#   the schema has); exact timestamp+interval arithmetic on both
#   engines.
# - Nation literals come from the supplier-bearing-at-every-SF set
#   {3,8,12,13,15,18,19,20,21,24} (see Q11_NATION).

Q7_NATION_A, Q7_NATION_B = "NATION_8", "NATION_19"
Q7_FROM, Q7_TO = "1995-01-01", "1997-01-01"
Q8_REGION = "AMERICA"
Q8_NATION = "NATION_15"
Q8_TYPE = "ECONOMY"
Q8_FROM, Q8_TO = "1995-01-01", "1997-01-01"
Q9_NAME_SUBSTR = "red"
Q13_EXCLUDED_PRIORITY = "1-URGENT"
Q17_BRAND = "Brand#13"
Q21_NATION = "NATION_19"
Q21_LATE_DAYS = 90


def tpch_q07(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 volume shipping: revenue between two nations by
    direction and ship year.

    Plan shape: both nation frames are 2-row broadcasts that prune
    supplier/customer before the fact joins; the pair-direction
    predicate ((A,B) or (B,A)) rides the last join, so at 100 TB the
    only big shuffles are lineitem⋈orders and orders⋈customer on
    their natural keys.
    """
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= Q7_FROM) & (F.col("l_shipdate") < Q7_TO)
    )
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    pair = [Q7_NATION_A, Q7_NATION_B]
    n1 = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = (
        _t(spark, sf_dir, "nation")
        .where(F.col("n_name").isin(pair))
        .select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    )
    rev = _money(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def tpch_q08(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 national market share: one nation's share of regional
    revenue for a part type, by order year.

    The share is an exact rational of two DECIMAL(18,6) sums, rounded
    in integer 1e-6 units (``divr_sql``) — the Q14 pattern — never
    through round(double).
    """
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == Q8_TYPE)
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= Q8_FROM) & (F.col("o_orderdate") < Q8_TO)
    )
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    n1 = (
        _t(spark, sf_dir, "nation")
        .select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_regionkey").alias("n2_region")
    )
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == Q8_REGION)
    rev = _money(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    nat = F.when(F.col("supp_nation") == Q8_NATION, rev).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .join(F.broadcast(r), F.col("n2_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.sum(nat).alias("ns"), F.sum(rev).alias("ts"))
        .withColumn("nsm", (F.col("ns") * F.lit(1_000_000)).cast("decimal(38,0)"))
        .withColumn(
            "tsm",
            F.when(F.col("ts") != 0, F.col("ts") * F.lit(1_000_000))
            .otherwise(F.lit(1))
            .cast("decimal(38,0)"),
        )
    )
    return agg.select(
        "o_year",
        F.when(
            F.col("ts") != 0,
            F.expr(divr_sql("nsm * 1000000", "tsm")).cast("double")
            / F.lit(1_000_000.0),
        ).alias("mkt_share"),
    ).orderBy("o_year")


def tpch_q09(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 product-type profit: revenue minus supply cost by
    supplier nation and order year, for parts whose name contains a
    color token.

    Supply cost comes from the derived partsupp in INTEGER CENTS and
    quantities are integral doubles, so the cost side of the profit
    is an exact integer; the revenue side is the DECIMAL(18,6) money
    sum.  Profit = revenue − cost is computed in integer micros and
    rounded to cents with ``divr_sql`` (profit can be negative —
    divr rounds half away from zero on both engines).
    """
    ps = _partsupp(spark, sf_dir)
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like(f"%{Q9_NAME_SUBSTR}%"))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = _money(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    cost_cents = (
        F.col("ps_cost_cents") * F.col("l_quantity").cast("long")
    ).cast("decimal(38,0)")
    agg = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(
            ps,
            (li.l_partkey == ps.ps_partkey) & (li.l_suppkey == ps.ps_suppkey),
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(rev).alias("sr"), F.sum(cost_cents).alias("sc"))
        .withColumn(
            "pm",
            (F.col("sr") * F.lit(1_000_000)).cast("decimal(38,0)")
            - F.col("sc") * F.lit(10_000),
        )
    )
    return agg.select(
        "nation",
        "o_year",
        (F.expr(divr_sql("pm", "10000")).cast("double") / F.lit(100.0)).alias(
            "sum_profit"
        ),
    ).orderBy("nation", F.desc("o_year"))


def tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 customer order-count distribution (left join with
    the order filter in the JOIN condition, then a count-of-counts).

    Adaptation: the o_comment NOT LIKE exclusion becomes an
    o_orderpriority exclusion.  Filtering orders BEFORE the left
    join is exactly the spec's ON-clause placement — customers with
    no surviving orders stay, with c_count 0.  Pure integer outputs.
    """
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != Q13_EXCLUDED_PRIORITY
    )
    c = _t(spark, sf_dir, "customer")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").cast("long").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").cast("long").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 small-quantity-order revenue: average yearly revenue
    lost if small orders (quantity < 20% of the part's average) were
    not taken.

    Adaptation: p_brand alone selects the parts (no p_container).
    The correlated 0.2·AVG(l_quantity) decorrelates to a per-part
    (sum, count) aggregate joined back; with integral quantities the
    test qty < sum/(5·cnt) is the exact integer cross-multiplication
    qty·5·cnt < sum.  The /7.0 output is rounded in integer units.
    """
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")
    )
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("sq"),
        F.count("*").cast("long").alias("cnt"),
    )
    small = li.join(per_part, li.l_partkey == F.col("pk")).where(
        F.col("l_quantity").cast("long") * 5 * F.col("cnt") < F.col("sq")
    )
    agg = small.agg(F.sum(_money(F.col("l_extendedprice"))).alias("sp")).withColumn(
        "spm", (F.col("sp") * F.lit(1_000_000)).cast("decimal(38,0)")
    )
    return agg.select(
        F.when(
            F.col("sp").isNotNull(),
            F.expr(divr_sql("spm", "70000")).cast("double") / F.lit(100.0),
        ).alias("avg_yearly")
    )


def tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 suppliers who kept orders waiting: late lineitems in
    multi-supplier finished orders where ONLY this supplier was late.

    Adaptation: "late" is l_shipdate > o_orderdate + Q21_LATE_DAYS
    (no receipt/commit dates).  The EXISTS / NOT-EXISTS pair
    decorrelates to one per-order aggregate — distinct suppliers ≥ 2
    (some other supplier exists) and distinct LATE suppliers = 1
    (l1's own supplier being late, nobody else) — so the plan is a
    single extra shuffle on l_orderkey instead of two correlated
    probes; the oracle keeps the spec's EXISTS spelling, pinning the
    decorrelation's equivalence.
    """
    o = (
        _t(spark, sf_dir, "orders")
        .where(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    lo = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .withColumn(
            "late",
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr(f"INTERVAL {Q21_LATE_DAYS} DAY"),
        )
    )
    stats = lo.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("nsupp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("nlate"),
    )
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == Q21_NATION)
    return (
        lo.where(F.col("late"))
        .join(
            stats.where((F.col("nsupp") >= 2) & (F.col("nlate") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
