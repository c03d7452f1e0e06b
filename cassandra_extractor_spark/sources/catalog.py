"""Source catalog: parquet test tables + Cassandra production source.

The reference scans one Cassandra table per extraction
(``datacrawler.py:133-184`` builds ``SELECT JSON <cols> FROM <table>``
with paging).  Spark-first mapping: one table → one DataFrame, with
projection/predicate pushdown delegated to the data source (parquet
footer stats locally; the Spark Cassandra Connector's CQL pushdown in
production).  No user-level paging code exists here at all — Spark
partitions (token ranges / parquet row groups) replace the reference's
page loop.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    """Load one test table as a DataFrame (parquet path).

    Filters/projections applied by callers are pushed into the parquet
    scan by Catalyst (check ``PushedFilters`` / ``ReadSchema`` in
    ``df.explain("formatted")``).
    """
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # timestamp semantics (literals, date_trunc, year/month) must be UTC
    # regardless of the caller-provided session's timezone — the oracle
    # treats the naive parquet timestamps as UTC
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), unreadable by default;
        # set here (runtime-settable) so any caller-provided session works
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # Memoize the ANALYZED PLAN per (session, dir, table): spark.read
    # .parquet is a ~0.1 s JVM round-trip (file listing + footer schema)
    # that a 241-query suite pays thousands of times over.  DataFrames
    # are immutable, so handing the same object to every caller is safe;
    # execution still scans parquet — this caches no data.  It DOES pin
    # the file listing, which is correct here because catalog tables
    # are immutable snapshot dirs (mutable paths go through
    # read_source/readStream, never this entry point; callers that DO
    # rewrite a directory in place must call invalidate_table_cache).
    # The cache lives ON the session object, so a stopped/replaced
    # session can never leak stale JVM handles through the module, and
    # it is LRU-capped: the hypothesis differential sweeps feed
    # thousands of one-shot tmp dirs through one session, and an
    # unbounded map would retain a Python handle + JVM analyzed plan
    # for every one of them for the session's lifetime.
    cache: dict = spark.__dict__.setdefault("_ce_table_plans", {})
    # normalize so two spellings of one directory (trailing slash,
    # relative vs absolute) share one cache entry — and so a later
    # invalidate_table_cache with a different spelling still hits it
    key = (_norm_dir(sf_dir), name)
    if key in cache:
        cache[key] = cache.pop(key)  # move-to-end: mark most recent
        return cache[key]
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # parquet TIMESTAMP(NANOS) read as long ns (see session.py conf);
        # Spark timestamps are µs precision → truncate ns → µs
        # integer div: double division would lose precision on ~1.7e18 ns
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    # tz-naive parquet timestamps (isAdjustedToUTC=false) load as
    # TIMESTAMP_NTZ under Spark's default inferTimestampNTZ; downstream
    # operators use unix_millis/unix_micros, which require TIMESTAMP.
    # With the session tz pinned to UTC above, NTZ→TIMESTAMP is a pure
    # reinterpretation of the wall time as a UTC instant — exactly how
    # the DuckDB oracle treats the same naive values.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz_cols:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz_cols})
    while len(cache) >= _TABLE_CACHE_CAP:
        cache.pop(next(iter(cache)))  # evict least-recently-used
    cache[key] = df
    return df


def _norm_dir(sf_dir: str) -> str:
    """One canonical spelling per directory for cache keys (realpath:
    absolute, symlink-free, no trailing slash) — only for LOCAL paths;
    URI-schemed paths (s3a://, hdfs://) pass through untouched since
    os.path would mangle the double slash."""
    return sf_dir if "://" in sf_dir else os.path.realpath(sf_dir)


#: LRU cap for the per-session analyzed-plan cache: 3 standard sf dirs
#: × 10 tables fit with headroom; one-shot differential tmp dirs churn
#: through the tail without evicting the hot standard entries.
_TABLE_CACHE_CAP = 64


def invalidate_table_cache(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Drop memoized table plans — required after rewriting a catalog
    directory IN PLACE (the cache pins the file listing).  With
    ``sf_dir`` drops that directory's entries; without, drops all."""
    cache = spark.__dict__.get("_ce_table_plans")
    if cache:
        if sf_dir is None:
            cache.clear()
        else:
            norm = _norm_dir(sf_dir)
            for key in [k for k in cache if k[0] == norm]:
                del cache[key]
    # the shared dedup/token-stream chain caches MATERIALIZED data over
    # these tables — stale blocks are worse than a stale file listing
    from cassandra_extractor_spark.operators.dedup import invalidate_dedup_chain

    invalidate_dedup_chain(spark, sf_dir)


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    options: dict[str, str] | None = None,
) -> DataFrame:
    """Generic file source (parquet/json/csv/orc) — the test-path
    analogue of swapping Cassandra for another origin; projection and
    eligible predicates still push into the scan."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if fmt == "csv" and "header" not in (options or {}):
        reader = reader.option("header", "true").option("inferSchema", schema is None)
    return reader.format(fmt).load(path)


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every test table as a temp view for the SQL entry point."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)
