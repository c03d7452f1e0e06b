"""Scale techniques: bucketed shuffle-free joins, salted skew handling."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from cassandra_extractor_spark.operators.scale import (
    read_bucketed,
    salted_aggregate,
    salted_join,
    write_bucketed,
)
from cassandra_extractor_spark.sources.catalog import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    customer = load_table(spark, "customer", sf_dir)
    write_bucketed(orders, "orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"])
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", ["o_custkey"], 8,
        sort_cols=["o_custkey"],
    )
    a, b = read_bucketed(spark, "orders_b"), read_bucketed(spark, "customer_b")
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle either side
        assert joined.count() == orders.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_layout_optimized_write_prunes_files(spark, sf_dir, tmp_path):
    from cassandra_extractor_spark.operators.scale import files_touched, write_layout_optimized

    orders = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "orders_ranged")
    write_layout_optimized(orders, path, "o_orderkey", num_files=16)
    back = spark.read.parquet(path)
    total = files_touched(back)
    narrow = files_touched(back.where((F.col("o_orderkey") >= 100) & (F.col("o_orderkey") < 200)))
    assert total >= 8  # layout actually split into many files
    assert narrow <= 2  # narrow key range touches ~1 file, not all
    # correctness preserved
    assert back.count() == orders.count()


def _skewed(spark):
    # 10k rows of one hot key + 100 spread keys
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    rest = spark.range(100).select((F.col("id") + 2).alias("k"), F.col("id").alias("v"))
    return hot.union(rest)


def test_salted_join_matches_plain(spark):
    left = _skewed(spark)
    right = spark.createDataFrame([Row(k=1, name="hot"), Row(k=50, name="cold")])
    plain = left.join(right, "k").groupBy("name").count().collect()
    salted = salted_join(left, right, "k").groupBy("name").count().collect()
    assert sorted((r["name"], r["count"]) for r in plain) == sorted(
        (r["name"], r["count"]) for r in salted
    )


def test_salted_aggregate_matches_plain(spark):
    df = _skewed(spark)
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("c")).collect()
    }
    salted = {
        r["k"]: (r["sum_v"], r["count_v"])
        for r in salted_aggregate(df, "k", {"v": "sum"}).join(
            salted_aggregate(df, "k", {"v": "count"}), "k"
        ).collect()
    }
    assert plain == salted
