"""Registry consistency: the driver contract depends on QUERIES and
ORACLES staying aligned (every oracle points at a real query; only the
two deliberately approximate operators lack an oracle — the driver
records a weaker rows-only check for those, SURVEY §2.9)."""

from cassandra_extractor_spark.registry import ORACLES, QUERIES

#: approximate-by-design operators where no exact SQL oracle exists
ROWS_ONLY = {"q38_approx_distinct"}  # HLL sketch: inherently engine-specific
# (deterministic hash sampling IS oracle-checked — the portable md5
# hash makes both engines pick identical rows)


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES), set(ORACLES) - set(QUERIES)


def test_only_approx_queries_lack_oracles():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY


def test_oracles_are_nonempty_sql():
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_queries_are_callable():
    for name, fn in QUERIES.items():
        assert callable(fn), name
