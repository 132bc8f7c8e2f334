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
                                  "ivf_store_redelivery",
                                  "doc_lsh_stream_pairs",
                                  "ivf_stream_matches",
                                  "ivf_store_reseed"])
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


def test_cross_split_oracle_defaults_unchanged():
    """The r11 `_lsh_cross_split_sql` generalization (pair_pred /
    extra_select for the staged streaming certification) must leave
    the default-arg strings — the REGISTERED store-query oracles —
    byte-identical to the pre-refactor form (frozen hashes)."""
    import hashlib

    from pudl_spark.plans.queries import _lsh_cross_split_sql

    frozen = {7: "7518f9781b6faeec5843222314fbe6328a5ccb2b"
                 "3b7425a2864430614ee996d7",
              43: "ad8e58bca4b1174392f1bf9302be77b5315b09f7"
                  "e62f2b095ba6cce7c9277f01"}
    for mod, want in frozen.items():
        got = hashlib.sha256(
            _lsh_cross_split_sql(mod).encode()).hexdigest()
        assert got == want, mod


@pytest.mark.parametrize("sf", ["/root/testdata/sf0.001", SF])
def test_oph_banded_from_sets_byte_identical(spark, sf):
    """The staged bands-from-sets derivation must equal the live
    text-shingling path row-for-row — the precondition VERDICT r9 #6
    set for the r12 build_lsh_store swap, and the divergence
    tripwire while the staged copy waits in queued.py."""
    from pudl_spark.functions.dedup import oph_banded, shingle_hash_sets
    from pudl_spark.plans.queued import oph_banded_from_sets
    from pudl_spark.catalog import read_parquet_table

    d = read_parquet_table(spark, f"{sf}/documents.parquet")
    live = sorted(map(tuple,
                      oph_banded(d, "doc_id", "text").collect()))
    staged = sorted(map(tuple, oph_banded_from_sets(
        shingle_hash_sets(d, "doc_id", "text")).collect()))
    assert staged == live and staged


def test_staged_unified_samplers_byte_identical(spark):
    """Both live samplers replayed through the staged unified
    scaffold must match row-for-row — including a NULL stratum and a
    stratum small enough to trip the shortfall guard — the
    precondition for the r12 sampling.py unification."""
    from pyspark.sql import functions as F

    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.functions.sampling import (
        bottomk_sample, weighted_bottomk_sample,
    )
    from pudl_spark.plans.queued import (
        bottomk_sample_staged, weighted_bottomk_sample_staged,
    )

    d = (read_parquet_table(spark, f"{SF}/documents.parquet")
         .select("doc_id",
                 # NULL stratum + a tiny stratum (guard path): lang
                 # NULL for doc_id % 11 == 0, a singleton stratum
                 # for doc_id == 1.
                 F.when(F.col("doc_id") == 1, F.lit("tiny"))
                 .when(F.col("doc_id") % 11 == 0, F.lit(None))
                 .otherwise(F.col("lang")).alias("lang"),
                 F.octet_length("text").alias("__w")))
    live_u = set(map(tuple, bottomk_sample(
        d, ["lang"], "doc_id", k=5).select(
        "lang", "doc_id", "smp_rank").collect()))
    staged_u = set(map(tuple, bottomk_sample_staged(
        d, ["lang"], "doc_id", k=5).select(
        "lang", "doc_id", "smp_rank").collect()))
    assert staged_u == live_u and staged_u
    live_w = set(map(tuple, weighted_bottomk_sample(
        d, ["lang"], "doc_id", "__w", k=5).select(
        "lang", "doc_id", "smp_rank").collect()))
    staged_w = set(map(tuple, weighted_bottomk_sample_staged(
        d, ["lang"], "doc_id", "__w", k=5).select(
        "lang", "doc_id", "smp_rank").collect()))
    assert staged_w == live_w and staged_w
    assert any(r[0] is None for r in staged_w)  # NULL stratum sampled
