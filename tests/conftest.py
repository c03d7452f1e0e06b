from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from cassandra_extractor_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    sp = get_spark("tests", master="local[8]", shuffle_partitions=8)
    yield sp


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
