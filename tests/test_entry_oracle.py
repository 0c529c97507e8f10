"""The driver's correctness gate, automated: every __spark_entry__
queries() entry vs its oracle_sql() DuckDB recomputation at sf0.001.

This mirrors what the round driver does at sf0.01 (CORRECTNESS_r{N}.json):
row count + column names + order-insensitive canonical values.
"""

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.check_oracle import TABLES, canon  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("BDI_TEST_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason=f"testdata {SF_DIR} not present"
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.schema is not None


def test_every_query_has_an_oracle_or_documented_exemption():
    # every registry query is SQL-oracled — no rows-only exemptions left
    assert set(QUERIES) - set(ORACLES) == set()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        assert len(sdf) >= 0  # rows-only check, mirroring the driver
        return
    odf = duck.sql(ORACLES[name]).df()
    sc, oc = canon(sdf), canon(odf)
    assert list(sc.columns) == list(oc.columns)
    assert len(sc) == len(oc)
    assert sc.equals(oc), f"{name}: values differ from oracle"
