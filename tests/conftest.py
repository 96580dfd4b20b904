from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_pipeline_foundations_spark.session import get_spark  # noqa: E402
from data_pipeline_foundations_spark.tables import TABLES, table_path  # noqa: E402

SMOKE_SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SMOKE_SF


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for name in TABLES:
        p = table_path(SMOKE_SF, name)
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    yield con
    con.close()
