"""Registry consistency: the driver contract depends on QUERIES and
ORACLES staying aligned — every oracle points at a real query, and
since round 4 EVERY query has an oracle (the HLL q38 checks an
accuracy contract instead of sketch equality, SURVEY §2.9)."""

from cassandra_extractor_spark.registry import ORACLES, QUERIES


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def test_every_query_has_an_oracle():
    assert set(QUERIES) - set(ORACLES) == set()


def test_oracles_are_nonempty_sql():
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
