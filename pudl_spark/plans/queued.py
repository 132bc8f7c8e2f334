"""Queries staged for the ROUND-12 driver prefix (r11 ships them
with full differential evidence but no registration: the r11 50-slot
prefix is exactly 7 touched + 43 r6 re-certs, and a new query must
sit in the prefix the round it registers — the standing rule).
`tests/test_r12_queue.py` runs each pair through the same
plain-session-vs-DuckDB comparison the driver uses, so r12's
registration is a move, not a rewrite.

Both stage the REDELIVERY convergence of the r11 idempotent appends
as hash-grade evidence: applying the same batch twice through the
exactly-once guards must leave a store that serves byte-identically
to a single append — the property the streaming loops' crash
recovery rests on (currently pinned by pytest parity tests only).
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir,
                                                  f"{name}.parquet"))


def doc_lsh_store_redelivery(spark, sf_dir):
    """Redelivered-batch convergence on the persisted LSH index:
    build on doc_id % 7 > 1, apply the % 7 == 1 slice TWICE through
    `dedup.append_to_lsh_store_idempotent` (a checkpoint redelivery
    replays exactly this), then probe the % 7 == 0 batch. The oracle
    is the ingest query's exact cross-split Jaccard verbatim — the
    hash certifies the doubly-applied store serves identically to a
    singly-appended one (no duplicated index rows inflating
    candidate multiplicity or corrupting set cardinalities).
    """
    import tempfile

    from pudl_spark.functions.dedup import (
        append_to_lsh_store_idempotent, build_lsh_store,
        lsh_store_probe,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 7 > 1)
    ingest = d.filter(F.col("doc_id") % 7 == 1)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory(prefix="pudl_spark_lshrd_") as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "lsh_rd",
                        os.path.join(td, "store"))
        try:
            for _ in range(2):  # second apply = simulated redelivery
                append_to_lsh_store_idempotent(spark, "lsh_rd",
                                               ingest, "doc_id",
                                               "text")
            out = lsh_store_probe(spark, "lsh_rd", batch, "doc_id",
                                  "text", jaccard_threshold=0.8)
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            for t in ("lsh_rd_bands", "lsh_rd_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def doc_lsh_store_redelivery_oracle() -> str:
    from pudl_spark.plans.queries import _lsh_cross_split_sql

    return _lsh_cross_split_sql(7)


def ivf_store_redelivery(spark, sf_dir):
    """Redelivered-batch convergence on the persisted IVF store:
    build on vec_id % 97 != 3, apply the % 97 == 3 slice TWICE
    through `similarity.append_to_ivf_store_idempotent` (the guard
    reads only the batch's own assigned cells), then certify the
    appended slice plus the 1/11 residue — the same oracle as
    `ivf_store_append`, which is exact because the doubly-applied
    store must hold exactly the single-append rows.
    """
    import tempfile

    from pudl_spark.functions.similarity import (
        append_to_ivf_store_idempotent, build_ivf_store,
    )

    e = _t(spark, sf_dir, "embeddings")
    corpus = e.filter(F.col("vec_id") % 97 != 3)
    batch = e.filter(F.col("vec_id") % 97 == 3)
    with tempfile.TemporaryDirectory(prefix="pudl_spark_ivfrd_") as td:
        build_ivf_store(spark, corpus, "ivf_rd_store",
                        os.path.join(td, "store"))
        try:
            for _ in range(2):
                append_to_ivf_store_idempotent(spark, "ivf_rd_store",
                                               batch)
            out = (spark.table("ivf_rd_store")
                   .filter((F.col("vec_id") % 97 == 3)
                           | (F.col("vec_id") % 11 == 0))
                   .select("cell", "vec_id"))
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            spark.sql("DROP TABLE IF EXISTS ivf_rd_store")
            spark.sql("DROP TABLE IF EXISTS ivf_rd_store_seeds")


def ivf_store_redelivery_oracle() -> str:
    from pudl_spark.plans.queries import ORACLES

    return ORACLES["ivf_store_append"]
