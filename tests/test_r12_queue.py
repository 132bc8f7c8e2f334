"""Differential evidence for the r12-queued queries: the same
plain-session-vs-DuckDB comparison tools/driver_sim.py runs, executed
at sf0.01 BEFORE registration, so the r12 prefix move ships
pre-verified."""

from __future__ import annotations

import importlib.util
import os

import duckdb
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.01"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _driver_sim():
    spec = importlib.util.spec_from_file_location(
        "driver_sim", os.path.join(REPO, "tools", "driver_sim.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ["doc_lsh_store_redelivery",
                                  "ivf_store_redelivery"])
def test_queued_query_matches_oracle(spark, name):
    from pudl_spark.plans import queued

    ds = _driver_sim()
    fn = getattr(queued, name)
    sql = getattr(queued, f"{name}_oracle")()
    sdf = fn(spark, SF).toPandas()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF}/{t}.parquet')")
    odf = con.execute(sql).df()
    assert len(sdf) > 0
    err = ds.compare(name, sdf, odf)
    assert err is None, err
