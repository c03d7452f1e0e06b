"""Sink round-trips and templating (SURVEY §5.2.4)."""

from __future__ import annotations

import json

from pyspark.sql import Row

from cassandra_extractor_spark.sinks.fanout import fan_out
from cassandra_extractor_spark.sinks.jdbc import JdbcSinkConfig, ensure_partitions, partition_ddl
from cassandra_extractor_spark.sinks.jsonl import write_json_array_file, write_jsonl
from cassandra_extractor_spark.sinks.kafka import (
    KafkaSinkConfig,
    prepare_kafka_frame,
    weighted_partition_col,
)
from cassandra_extractor_spark.sinks.s3 import S3SinkConfig, prepare_s3_frame

from pyspark.sql import functions as F


def _df(spark):
    return spark.createDataFrame(
        [Row(id=i, name=f"n{i}", part="a" if i % 2 else "b") for i in range(10)]
    )


def test_jsonl_roundtrip(spark, tmp_path):
    df = _df(spark)
    path = str(tmp_path / "out")
    write_jsonl(df, path)
    back = spark.read.json(path)
    assert back.count() == 10
    assert sorted(back.columns) == ["id", "name", "part"]


def test_json_array_file(spark, tmp_path):
    path = str(tmp_path / "arr.json")
    n = write_json_array_file(_df(spark).orderBy("id"), path)
    assert n == 10
    data = json.load(open(path))
    assert isinstance(data, list) and len(data) == 10
    assert data[0]["id"] == 0


def test_kafka_frame(spark):
    cfg = KafkaSinkConfig(
        bootstrap_servers="b:9092",
        topic="t",
        topic_prefix="pre-",
        key_template="%(id)d",
        header_columns=["part"],
        partition_weights={0: 3, 1: 1},
    )
    assert cfg.full_topic == "pre-t"
    frame = prepare_kafka_frame(_df(spark), cfg)
    assert set(frame.columns) == {"key", "value", "headers", "partition"}
    rows = frame.collect()
    assert all(r["partition"] in (0, 1) for r in rows)
    assert json.loads(rows[0]["value"])["name"].startswith("n")


def test_weighted_partition_distribution(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("k"))
    out = df.select(weighted_partition_col({0: 3, 1: 1}, F.col("k")).alias("p"))
    counts = {r["p"]: r["cnt"] for r in out.groupBy("p").agg(F.count("*").alias("cnt")).collect()}
    ratio = counts[0] / counts[1]
    assert 2.5 < ratio < 3.6  # ~3:1 weighting


def test_jdbc_partition_ddl(spark):
    df = _df(spark)
    cfg = JdbcSinkConfig(url="jdbc:x", table="tgt", partition_column="part")
    issued: list[str] = []
    stmts = ensure_partitions(df, cfg, issued.append)
    assert sorted(stmts) == sorted(issued)
    assert any("FOR VALUES IN ('a')" in s for s in issued)
    assert any("PARTITION OF tgt" in s for s in issued)
    assert partition_ddl("t", "c", ["x'y"])[0].count("''") == 1  # escaping


def test_s3_frame_keying(spark):
    cfg = S3SinkConfig(bucket="b", key_template="exports/%(id)d.json")
    frame = prepare_s3_frame(_df(spark), cfg)
    rows = {r["key"]: r["body"] for r in frame.collect()}
    assert "exports/3.json" in rows
    assert json.loads(rows["exports/3.json"])["name"] == "n3"


def test_fanout_isolated_failures(spark, tmp_path):
    df = _df(spark)
    seen = {}

    def good(d):
        seen["good"] = d.count()

    def bad(d):
        raise ValueError("boom")

    res = fan_out(df, {"good": good, "bad": bad})
    assert res["good"] is None
    assert isinstance(res["bad"], ValueError)
    assert seen["good"] == 10


def test_jdbc_partition_ddl_hostile_values():
    """Data-derived identifiers are whitelisted: quotes/semicolons/parens
    cannot reach the DDL as raw SQL."""
    from cassandra_extractor_spark.sinks.jdbc import partition_ddl

    stmts = partition_ddl("t", "region", ["us-east", "x'); DROP TABLE t; --"])
    assert stmts[0].startswith("CREATE TABLE IF NOT EXISTS t_p_us_east_")
    # identifier fully sanitized, literal single-quotes doubled
    assert "t_p_x____drop_table_t____" in stmts[1]
    assert "IN ('x''); DROP TABLE t; --')" in stmts[1]
    # nothing outside [a-z0-9_] in any generated identifier
    import re
    for s in stmts:
        ident = s.split()[5]
        assert re.fullmatch(r"[a-z0-9_]+", ident), ident


def test_jdbc_partition_ddl_sanitized_collisions_stay_distinct():
    """Distinct raw values whose whitelisted slugs collide ('v1.x' vs
    'v1_x') must yield distinct partition identifiers — otherwise the
    second CREATE .. IF NOT EXISTS silently no-ops and rows with the
    second value have no partition at insert time."""
    from cassandra_extractor_spark.sinks.jdbc import partition_ddl

    stmts = partition_ddl("t", "region", ["v1.x", "v1_x"])
    idents = {s.split()[5] for s in stmts}
    assert len(idents) == 2, idents


def test_jdbc_partition_ddl_long_values_keep_digest_within_63_chars():
    """Long values: the slug is truncated before the digest so the
    identifier fits Postgres's 63-char limit WITH the digest intact —
    otherwise silent server-side truncation cuts the digest off and
    long values whose first 63 chars agree collide again."""
    from cassandra_extractor_spark.sinks.jdbc import partition_ddl

    base = "tenant-" + "x" * 80
    stmts = partition_ddl("t", "region", [base + "-alpha", base + "-beta"])
    idents = [s.split()[5] for s in stmts]
    assert all(len(i) <= 63 for i in idents), idents
    assert len(set(idents)) == 2, idents  # digest survives, keeps them distinct


def test_kafka_producer_options_pass_through():
    """producer_options map to kafka.*-prefixed writer options (the
    reference's flush policies -> linger.ms/batch.size/acks configs);
    already-prefixed keys are not double-prefixed."""
    from cassandra_extractor_spark.sinks.kafka import (
        KafkaSinkConfig,
        kafka_writer_options,
    )

    cfg = KafkaSinkConfig(
        bootstrap_servers="b:9092",
        topic="t",
        topic_prefix="pre.",
        producer_options={
            "linger.ms": "50",
            "acks": "all",
            "kafka.batch.size": "65536",
        },
    )
    opts = kafka_writer_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "b:9092"
    assert opts["topic"] == "pre.t"
    assert opts["kafka.linger.ms"] == "50"
    assert opts["kafka.acks"] == "all"
    assert opts["kafka.batch.size"] == "65536"
    assert "kafka.kafka.batch.size" not in opts


def test_kafka_fractional_linger_rejected_and_reference_acks():
    """The reference derives linger.ms from flush_latency with a
    FRACTIONAL default (0.5 ms, kafkaworker.py) — a librdkafka-only
    capability: Spark's built-in Kafka sink uses the JAVA producer,
    which parses linger.ms as a Long, so '0.5' would throw
    ConfigException at producer construction.  The config must reject
    fractional values UP FRONT with the explanation, accept
    whole-valued floats (emitted as integer text), and pass acks='-1'
    through verbatim (NOT an implied default)."""
    import pytest

    from cassandra_extractor_spark.sinks.kafka import (
        KafkaSinkConfig,
        kafka_writer_options,
    )

    cfg = KafkaSinkConfig(
        bootstrap_servers="b:9092", topic="t", acks="-1", linger_ms=2.0
    )
    opts = kafka_writer_options(cfg)
    assert opts["kafka.acks"] == "-1"
    assert opts["kafka.linger.ms"] == "2"  # whole float → integer text

    with pytest.raises(ValueError, match="Java producer"):
        kafka_writer_options(
            KafkaSinkConfig(bootstrap_servers="b:9092", topic="t", linger_ms=0.5)
        )
    # no implied defaults: omitting the fields emits no kafka.acks/linger
    bare = kafka_writer_options(KafkaSinkConfig(bootstrap_servers="b:9092", topic="t"))
    assert "kafka.acks" not in bare and "kafka.linger.ms" not in bare


def test_kafka_error_split_missing_jar_vs_runtime():
    """Only the missing-jar failure is rewritten to the setup hint;
    runtime failures (auth/broker) propagate unchanged."""
    from cassandra_extractor_spark.sinks.kafka import map_kafka_error

    jar = Exception("[DATA_SOURCE_NOT_FOUND] Failed to find data source: kafka")
    mapped = map_kafka_error(jar)
    assert isinstance(mapped, RuntimeError) and "spark-sql-kafka" in str(mapped)
    assert mapped.__cause__ is jar

    runtime = Exception("TimeoutException: Topic t not present in metadata")
    assert map_kafka_error(runtime) is runtime


def test_write_kafka_missing_jar_raises_setup_hint(spark):
    """End-to-end through write_kafka: with no kafka jar on the
    classpath the save fails and surfaces as the setup-hint
    RuntimeError."""
    import pytest

    from cassandra_extractor_spark.sinks.kafka import KafkaSinkConfig, write_kafka

    df = spark.createDataFrame([("a", 1)], "k string, v int")
    with pytest.raises(RuntimeError, match="spark-sql-kafka") as ei:
        write_kafka(df, KafkaSinkConfig(bootstrap_servers="b:9092", topic="t"))
    # the actual Spark failure must survive on the cause chain — a
    # regression here drops the real Kafka error from tracebacks
    cause = ei.value.__cause__
    assert cause is not None and cause is not ei.value
    assert "kafka" in str(cause).lower() or "DATA_SOURCE" in str(cause)


def test_kafka_acks_linger_first_class_fields(spark, tmp_path, monkeypatch):
    """K1 delivery knobs (reference flush/ack policy,
    kafkaworker.py:85-106): the first-class ``acks``/``linger_ms``
    fields must reach the writer option map — through the REAL
    write_kafka path (file transport) — and win over the same key in
    the generic producer_options map.  Broker-side behavior is config
    pass-through (no broker in the sandbox; see README parity notes)."""
    from cassandra_extractor_spark.sinks import kafka as K

    cfg = K.KafkaSinkConfig(
        bootstrap_servers=f"file://{tmp_path}",
        topic="t",
        acks="all",
        linger_ms=25,
        producer_options={"acks": "0", "batch.size": "65536"},
    )
    opts = K.kafka_writer_options(cfg)
    assert opts["kafka.acks"] == "all"  # explicit field beats the map
    assert opts["kafka.linger.ms"] == "25"
    assert opts["kafka.batch.size"] == "65536"

    seen: list[dict[str, str]] = []
    from cassandra_extractor_spark.sinks import kafka_file as KF

    real = KF.write_file_transport

    def capture(frame, o):
        seen.append(dict(o))
        return real(frame, o)

    monkeypatch.setattr(KF, "write_file_transport", capture)
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    K.write_kafka(df, cfg)
    assert seen and seen[0]["kafka.acks"] == "all"
    assert seen[0]["kafka.linger.ms"] == "25"
    out = KF.read_kafka_log(spark, cfg.bootstrap_servers, "t")
    assert out.count() == 1
