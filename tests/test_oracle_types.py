"""Standing invariant from the round-3 lesson (VERDICT r3 #1/#2).

DuckDB types SUM(BIGINT) — plain or windowed — as HUGEINT (int128),
and SUM(DECIMAL) widens precision.  Spark has no HUGEINT, so an oracle
whose RESULT schema carries HUGEINT/DECIMAL will hash-mismatch the
driver's typed-value compare even when every value is equal (that was
`harvest_report_consistency` in round 3).  This test walks ALL
registered oracles and asserts no result column surfaces as
HUGEINT/INT128 or DECIMAL — the fix at any hit is a one-line CAST in
the oracle SQL.

Type resolution uses DuckDB's relational planner (`con.sql(...).types`)
which binds the query without executing it, so the sweep is cheap.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from pudl_spark.plans.queries import ORACLES

ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR",
                               "/root/testdata/sf0.01")

_FORBIDDEN = ("HUGEINT", "INT128", "DECIMAL", "UHUGEINT")


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for p in sorted(glob.glob(os.path.join(ORACLE_SF_DIR, "*.parquet"))):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{p}')")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_result_types_sparkable(name, duck):
    rel = duck.sql(ORACLES[name])
    bad = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
           if any(f in str(t).upper() for f in _FORBIDDEN)]
    assert not bad, (
        f"{name}: oracle result columns typed un-Spark-able by DuckDB "
        f"{bad} — add an explicit CAST (e.g. AS BIGINT / AS DOUBLE) "
        f"in the oracle SQL so the driver's typed hash matches Spark")
