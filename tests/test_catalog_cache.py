"""Plan-cache behavior of sources.catalog.load_table: LRU cap (the
hypothesis differential sweeps feed thousands of one-shot tmp dirs
through one session — an unbounded map retains a JVM analyzed plan for
each forever) and the in-place-rewrite invalidation hook."""

from __future__ import annotations

import pandas as pd


def _write(spark, d, n=3):
    d.mkdir(parents=True, exist_ok=True)
    spark.createDataFrame(
        pd.DataFrame({"r_regionkey": range(n), "r_name": ["x"] * n})
    ).write.mode("overwrite").parquet(str(d / "region.parquet"))


def test_load_table_memoizes_and_caps(spark, tmp_path):
    from cassandra_extractor_spark.sources.catalog import (
        _TABLE_CACHE_CAP,
        load_table,
    )

    base = tmp_path / "sfA"
    _write(spark, base)
    df1 = load_table(spark, "region", str(base))
    assert load_table(spark, "region", str(base)) is df1  # memo hit
    # two spellings of the same dir share one cache entry
    assert load_table(spark, "region", str(base) + "/") is df1
    assert load_table(spark, "region", str(base / ".")) is df1

    # churn through > cap one-shot dirs: the cache must stay bounded
    for i in range(_TABLE_CACHE_CAP + 5):
        d = tmp_path / f"tmp{i}"
        _write(spark, d, n=1)
        load_table(spark, "region", str(d))
    cache = spark.__dict__["_ce_table_plans"]
    assert len(cache) <= _TABLE_CACHE_CAP

    # LRU: the hot entry was evicted by the churn (inserted first),
    # but re-loading just re-reads — correctness unaffected
    assert load_table(spark, "region", str(base)).count() == 3


def test_invalidate_table_cache_unpins_file_listing(spark, tmp_path):
    from cassandra_extractor_spark.sources.catalog import (
        invalidate_table_cache,
        load_table,
    )

    d = tmp_path / "sfB"
    _write(spark, d, n=2)
    assert load_table(spark, "region", str(d)).count() == 2
    _write(spark, d, n=5)  # rewrite IN PLACE
    invalidate_table_cache(spark, str(d))
    assert load_table(spark, "region", str(d)).count() == 5
    invalidate_table_cache(spark)  # full clear is a no-op-safe call
    assert spark.__dict__["_ce_table_plans"] == {}
