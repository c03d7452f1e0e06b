"""LIVE sink round-trips — real writers against real (embedded/local)
services: Derby through Spark's actual JDBC write path, moto's S3
server through the per-record boto3 path, and the bulk JSON path to a
filesystem prefix.  These retire the 'compile-only sink tests' gap:
every assertion reads back what the production writer wrote."""

from __future__ import annotations

import json
import tempfile

import pytest

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_props() -> dict:
    return {"driver": DERBY_DRIVER}


def test_write_jdbc_live_derby_round_trip(spark):
    """write_jdbc → embedded Derby (on Spark's classpath) → read back.
    Exercises the real df.write.jdbc executor path: type mapping,
    batching, mode=overwrite table creation."""
    from cassandra_extractor_spark.sinks.jdbc import JdbcSinkConfig, write_jdbc

    tmp = tempfile.mkdtemp()
    url = f"jdbc:derby:{tmp}/db;create=true"
    df = spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.0)],
        "id long, name string, score double",
    )
    write_jdbc(df, JdbcSinkConfig(url=url, table="live_t", mode="overwrite",
                                  properties=_derby_props()))
    back = spark.read.jdbc(url, "live_t", properties=_derby_props())
    got = sorted((r[0], r[1], r[2]) for r in back.collect())
    assert got == [(1, "alpha", 1.5), (2, "beta", -2.0), (3, None, 0.0)]


def test_write_jdbc_live_derby_append_accumulates(spark):
    from cassandra_extractor_spark.sinks.jdbc import JdbcSinkConfig, write_jdbc

    tmp = tempfile.mkdtemp()
    url = f"jdbc:derby:{tmp}/db;create=true"
    df = spark.createDataFrame([(1, "a")], "id long, name string")
    cfg = JdbcSinkConfig(url=url, table="acc_t", mode="overwrite", properties=_derby_props())
    write_jdbc(df, cfg)
    cfg2 = JdbcSinkConfig(url=url, table="acc_t", mode="append", properties=_derby_props())
    write_jdbc(spark.createDataFrame([(2, "b")], "id long, name string"), cfg2)
    back = spark.read.jdbc(url, "acc_t", properties=_derby_props())
    assert back.count() == 2


@pytest.fixture(scope="module")
def moto_s3():
    moto = pytest.importorskip("moto.server")
    srv = moto.ThreadedMotoServer(port=0, verbose=False)
    srv.start()
    port = srv._server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    srv.stop()


def _s3_client(endpoint: str):
    import boto3

    return boto3.client(
        "s3", endpoint_url=endpoint, region_name="us-east-1",
        aws_access_key_id="test", aws_secret_access_key="test",
    )


def test_write_s3_per_record_live(spark, moto_s3):
    """Per-record mode: executor-side boto3 put_object per row against
    a real S3 API (moto server).  Asserts the reference's exact
    key-per-record layout (s3worker.py:18-24): templated keys, JSON
    bodies, uuid default-id injection."""
    boto3 = pytest.importorskip("boto3")  # noqa: F841
    from cassandra_extractor_spark.sinks.s3 import S3SinkConfig, write_s3

    client = _s3_client(moto_s3)
    client.create_bucket(Bucket="live-bucket")
    df = spark.createDataFrame([(10, "x"), (20, "y")], "id long, name string")
    cfg = S3SinkConfig(
        bucket="live-bucket",
        key_template="exports/%(id)d.json",
        per_record=True,
        inject_default_id=False,
        endpoint_url=moto_s3,
        region="us-east-1",
        access_key="test",
        secret_key="test",
    )
    write_s3(df, cfg)
    keys = {o["Key"] for o in client.list_objects_v2(Bucket="live-bucket")["Contents"]}
    assert keys == {"exports/10.json", "exports/20.json"}
    body = json.loads(client.get_object(Bucket="live-bucket", Key="exports/10.json")["Body"].read())
    assert body == {"id": 10, "name": "x"}


def test_write_s3_bulk_mode_filesystem_prefix(spark):
    """Bulk mode through the same writer, targeting a filesystem prefix
    (the s3a:// path is the same Hadoop FS API with a different
    scheme): one JSONL object per partition, (key, body) schema."""
    from cassandra_extractor_spark.sinks.s3 import S3SinkConfig, write_s3

    tmp = tempfile.mkdtemp()
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    cfg = S3SinkConfig(bucket="unused", key_template="exports/%(id)d.json",
                       inject_default_id=False)
    write_s3(df, cfg, path_prefix=f"file://{tmp}/out")
    back = spark.read.json(f"file://{tmp}/out")
    rows = {r["key"]: json.loads(r["body"]) for r in back.collect()}
    assert rows == {
        "exports/1.json": {"id": 1, "name": "a"},
        "exports/2.json": {"id": 2, "name": "b"},
    }


# --- Kafka file-transport round-trips (K1 live path, round 7) --------
#
# No broker/jar exists in the sandbox, so the transport is a
# directory-backed topic log (sinks/kafka_file.py) reached through the
# REAL write_kafka entry point — template rendering, key/headers
# compilation, WRR partition column, option map, and binary
# serialization are the production path; only the socket is replaced.


def _kafka_cfg(tmp, **kw):
    from cassandra_extractor_spark.sinks.kafka import KafkaSinkConfig

    base = dict(
        bootstrap_servers=f"file://{tmp}",
        topic="orders",
        topic_prefix="t_",
        key_template="%(id)s",
        header_columns=["name"],
        partition_weights={0: 3, 1: 1},
        producer_options={"linger.ms": "5", "acks": "all"},
    )
    base.update(kw)
    return KafkaSinkConfig(**base)


def test_write_kafka_file_transport_round_trip(spark):
    """Produce through write_kafka, consume with read_kafka_log, and
    check every record facet a consumer would see: decoded key/value,
    header key+bytes, partition ∈ weights, per-partition offsets
    contiguous from 0."""
    import tempfile

    from cassandra_extractor_spark.sinks.kafka import write_kafka
    from cassandra_extractor_spark.sinks.kafka_file import read_kafka_log

    tmp = tempfile.mkdtemp()
    cfg = _kafka_cfg(tmp)
    df = spark.createDataFrame(
        [(i, f"name_{i}") for i in range(40)], "id long, name string"
    )
    write_kafka(df, cfg)
    back = read_kafka_log(spark, cfg.bootstrap_servers, cfg.full_topic)
    rows = back.collect()
    assert len(rows) == 40
    assert {r["topic"] for r in rows} == {"t_orders"}
    by_key = {}
    for r in rows:
        key = r["key"].decode()
        payload = json.loads(r["value"].decode())
        assert payload["id"] == int(key)
        assert [(h["key"], bytes(h["value"]).decode()) for h in r["headers"]] == [
            ("name", payload["name"])
        ]
        assert r["partition"] in (0, 1)
        by_key[int(key)] = r["partition"]
    assert by_key.keys() == set(range(40))
    # offsets contiguous per partition
    for p in {r["partition"] for r in rows}:
        offs = sorted(r["offset"] for r in rows if r["partition"] == p)
        assert offs == list(range(len(offs)))


def test_write_kafka_file_transport_wrr_matches_column(spark):
    """The partition each record lands on IS the weighted-round-robin
    column value: recompute weighted_partition_col over the same keys
    and compare record by record; distribution follows the weights."""
    import tempfile

    from pyspark.sql import functions as F

    from cassandra_extractor_spark.sinks.kafka import (
        weighted_partition_col,
        write_kafka,
    )
    from cassandra_extractor_spark.sinks.kafka_file import read_kafka_log

    tmp = tempfile.mkdtemp()
    weights = {0: 3, 1: 1}
    cfg = _kafka_cfg(tmp, partition_weights=weights)
    df = spark.createDataFrame([(i, f"n{i}") for i in range(400)], "id long, name string")
    write_kafka(df, cfg)
    back = read_kafka_log(spark, cfg.bootstrap_servers, cfg.full_topic)
    got = {
        int(r["key"].decode()): r["partition"] for r in back.collect()
    }
    expected = {
        r["id"]: r["p"]
        for r in df.select(
            "id",
            weighted_partition_col(
                weights, F.col("id").cast("string")
            ).alias("p"),
        ).collect()
    }
    assert got == expected
    n0 = sum(1 for p in got.values() if p == 0)
    assert 0.6 < n0 / len(got) < 0.9  # ~3:1 weighting


def test_write_kafka_file_transport_append_segments(spark):
    """Two produces append two segments; offsets stay contiguous
    across them (consumer invariant), earlier records keep their
    offsets."""
    import tempfile

    from cassandra_extractor_spark.sinks.kafka import write_kafka
    from cassandra_extractor_spark.sinks.kafka_file import read_kafka_log

    tmp = tempfile.mkdtemp()
    cfg = _kafka_cfg(tmp, partition_weights=None, key_template=None,
                     header_columns=[])
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string")
    df2 = spark.createDataFrame([(3, "c")], "id long, name string")
    write_kafka(df1, cfg)
    write_kafka(df2, cfg)
    back = read_kafka_log(spark, cfg.bootstrap_servers, cfg.full_topic)
    rows = sorted(back.collect(), key=lambda r: r["offset"])
    assert [r["offset"] for r in rows] == [0, 1, 2]
    ids = [json.loads(r["value"].decode())["id"] for r in rows]
    assert sorted(ids[:2]) == [1, 2] and ids[2] == 3  # append order kept
    assert all(r["key"] is None for r in rows)


def test_kafka_frame_contract_rejects_bad_columns(spark):
    from cassandra_extractor_spark.sinks.kafka_file import validate_kafka_frame

    no_value = spark.createDataFrame([(1,)], "key string")
    with pytest.raises(ValueError, match="required column 'value'"):
        validate_kafka_frame(no_value)
    extra = spark.createDataFrame([("v", 1)], "value string, junk int")
    with pytest.raises(ValueError, match="unsupported column 'junk'"):
        validate_kafka_frame(extra)
    bad_type = spark.createDataFrame([("v", "x")], "value string, partition string")
    with pytest.raises(ValueError, match="partition.*type string"):
        validate_kafka_frame(bad_type)
