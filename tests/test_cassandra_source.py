"""Option-contract tests for the Cassandra source.

The sandbox has no Cassandra server and no connector jar, so the
production read path (ref: datacrawler.py:110-184) can never execute
here.  What CAN be pinned is the exact option map handed to
``spark.read.format("org.apache.spark.sql.cassandra")`` — the
Spark Cassandra Connector's documented option names.  A silent rename
in ``CassandraSource.spark_options`` would break the production path
with zero sandbox-test signal; these tests make that loud.

Option names cross-checked against the connector's public reference
(spark-cassandra-connector docs/reference.md): connection.host/port,
auth.username/password, input.consistency.level,
input.fetch.size_in_rows, connection.timeoutMS.
"""

from __future__ import annotations

import pytest

from cassandra_extractor_spark.sources.cassandra import (
    CASSANDRA_FORMAT,
    CassandraSource,
)


def test_fully_populated_option_map_exact() -> None:
    src = CassandraSource(
        keyspace="ks",
        table="events",
        contact_points=["10.0.0.1", "10.0.0.2"],
        port=9043,
        username="crawler",
        password="s3cret",
        consistency_level="LOCAL_QUORUM",
        fetch_size=5000,
        connect_timeout=30,
    )
    assert src.spark_options() == {
        "keyspace": "ks",
        "table": "events",
        "spark.cassandra.connection.host": "10.0.0.1,10.0.0.2",
        "spark.cassandra.connection.port": "9043",
        "spark.cassandra.input.consistency.level": "LOCAL_QUORUM",
        "spark.cassandra.input.fetch.size_in_rows": "5000",
        "spark.cassandra.connection.timeoutMS": "30000",
        "spark.cassandra.auth.username": "crawler",
        "spark.cassandra.auth.password": "s3cret",
    }


def test_defaults_match_reference_config() -> None:
    """Reference defaults (app.py:296-316): LOCAL_ONE consistency,
    10k fetch pages, 200s connect timeout, localhost contact point."""
    opts = CassandraSource(keyspace="ks", table="t").spark_options()
    assert opts["spark.cassandra.connection.host"] == "127.0.0.1"
    assert opts["spark.cassandra.connection.port"] == "9042"
    assert opts["spark.cassandra.input.consistency.level"] == "LOCAL_ONE"
    assert opts["spark.cassandra.input.fetch.size_in_rows"] == "10000"
    assert opts["spark.cassandra.connection.timeoutMS"] == "200000"


def test_no_auth_keys_without_credentials() -> None:
    """Anonymous connections must not emit empty auth options — the
    connector treats a present-but-empty username as an auth attempt."""
    opts = CassandraSource(keyspace="ks", table="t").spark_options()
    assert not any(k.startswith("spark.cassandra.auth.") for k in opts)


def test_all_option_names_are_documented_connector_names() -> None:
    """Every emitted ``spark.cassandra.*`` key must be one of the
    connector's documented names — catches typo'd or invented options
    that the connector would silently ignore at runtime."""
    documented = {
        "spark.cassandra.connection.host",
        "spark.cassandra.connection.port",
        "spark.cassandra.connection.timeoutMS",
        "spark.cassandra.auth.username",
        "spark.cassandra.auth.password",
        "spark.cassandra.input.consistency.level",
        "spark.cassandra.input.fetch.size_in_rows",
    }
    src = CassandraSource(
        keyspace="ks", table="t", username="u", password="p"
    )
    emitted = {k for k in src.spark_options() if k.startswith("spark.cassandra.")}
    assert emitted <= documented


def test_read_without_connector_raises_setup_hint(spark) -> None:
    """Without the connector jar the read must fail loudly with the
    spark.jars.packages hint, not a bare ClassNotFoundException."""
    from cassandra_extractor_spark.sources.cassandra import read_cassandra

    with pytest.raises(RuntimeError, match="spark-cassandra-connector"):
        read_cassandra(spark, CassandraSource(keyspace="ks", table="t"))
    assert CASSANDRA_FORMAT == "org.apache.spark.sql.cassandra"
