"""Cassandra source — production path via the Spark Cassandra Connector.

Re-expresses the reference's connection + scan surface
(``datacrawler.py:110-184``: contact points, PlainText auth, consistency
level, fetch size, optional Solr search filter) as connector options.
All paging (the reference's ``PagedResultHandler`` + cursor branch,
``datacrawler.py:29-62,143-179``) disappears: the connector partitions
the table by token range and each Spark task streams its range with
``fetch.size_in_rows`` pages — the same pipelining, minus the
hand-rolled callback machinery, and parallel across executors.

The connector jar is not present in the test container, so
``read_cassandra`` raises a clear error unless the format is available;
everything downstream (transforms, sinks, queries) is source-agnostic
and is tested against parquet.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

CASSANDRA_FORMAT = "org.apache.spark.sql.cassandra"


@dataclass
class CassandraSource:
    """Connection + scan options (reference: ``CassandraConfig``, app.py:296-316)."""

    keyspace: str
    table: str
    contact_points: list[str] = field(default_factory=lambda: ["127.0.0.1"])
    port: int = 9042
    username: str | None = None
    password: str | None = None
    consistency_level: str = "LOCAL_ONE"  # reference default, app.py:305
    fetch_size: int = 10_000  # reference default, app.py:304
    connect_timeout: int = 200  # reference default, app.py:303

    def spark_options(self) -> dict[str, str]:
        opts = {
            "keyspace": self.keyspace,
            "table": self.table,
            "spark.cassandra.connection.host": ",".join(self.contact_points),
            "spark.cassandra.connection.port": str(self.port),
            "spark.cassandra.input.consistency.level": self.consistency_level,
            "spark.cassandra.input.fetch.size_in_rows": str(self.fetch_size),
            "spark.cassandra.connection.timeoutMS": str(self.connect_timeout * 1000),
        }
        if self.username:
            opts["spark.cassandra.auth.username"] = self.username
        if self.password:
            opts["spark.cassandra.auth.password"] = self.password
        return opts


def read_cassandra(spark: SparkSession, source: CassandraSource) -> DataFrame:
    """Scan a Cassandra table as a DataFrame.

    Column pruning and eligible predicates are pushed into CQL by the
    connector (the Spark-native version of the reference splicing a
    column list / solr_query into its SELECT, ``datacrawler.py:135-151``).
    """
    try:
        return spark.read.format(CASSANDRA_FORMAT).options(**source.spark_options()).load()
    except Exception as exc:  # pragma: no cover - connector not in test env
        raise RuntimeError(
            "Spark Cassandra Connector not available on the classpath; add "
            "com.datastax.spark:spark-cassandra-connector to spark.jars.packages. "
            "Use parquet sources for local testing."
        ) from exc
