"""Queries staged for the ROUND-10 driver prefix (r9 ships them with
full differential evidence but no registration: the r9 50-slot prefix
is exactly 7 touched + 43 r5 re-certs, and a new query must sit in
the prefix the round it registers). `tests/test_r10_queue.py` runs
each pair through the same plain-session-vs-DuckDB comparison the
driver uses, so r10's registration is a move, not a rewrite.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _t(spark, sf_dir, name):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir,
                                                  f"{name}.parquet"))


def doc_lsh_store_ingest(spark, sf_dir):
    """Probe-then-ingest round trip on the persisted LSH index: build
    on doc_id % 7 > 1, INGEST the % 7 == 1 slice
    (`dedup.append_to_lsh_store`), then probe the % 7 == 0 batch
    against the GROWN index. The oracle is the increment query's
    exact cross-split Jaccard (`_lsh_cross_split_sql(7)`) verbatim —
    corpus side = everything not % 7 == 0 — so the hash certifies
    that an appended index serves byte-identically to a
    built-from-scratch one (append == rebuild is unconditional for
    per-doc index rows; pinned in tests/test_lsh_store.py).
    """
    import tempfile

    from pudl_spark.functions.dedup import (
        append_to_lsh_store, build_lsh_store, lsh_store_probe,
    )

    d = _t(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 7 > 1)
    ingest = d.filter(F.col("doc_id") % 7 == 1)
    batch = d.filter(F.col("doc_id") % 7 == 0)
    with tempfile.TemporaryDirectory(prefix="pudl_spark_lshing_") as td:
        build_lsh_store(spark, corpus, "doc_id", "text", "lsh_ing",
                        os.path.join(td, "store"))
        try:
            append_to_lsh_store(spark, "lsh_ing", ingest, "doc_id",
                                "text")
            out = lsh_store_probe(spark, "lsh_ing", batch, "doc_id",
                                  "text", jaccard_threshold=0.8)
            return spark.createDataFrame(out.collect(), out.schema)
        finally:
            for t in ("lsh_ing_bands", "lsh_ing_sets"):
                spark.sql(f"DROP TABLE IF EXISTS {t}")


def doc_lsh_store_ingest_oracle() -> str:
    from pudl_spark.plans.queries import _lsh_cross_split_sql

    return _lsh_cross_split_sql(7)


def doc_weighted_sample(spark, sf_dir):
    """Length-proportional document sampling per language — the
    training-mix primitive (`sampling.weighted_bottomk_sample`,
    Efraimidis-Spirakis): weight = octet_length(text), k = 5 per
    lang stratum. Deterministic md5-race keys replay in SQL, and
    only integer ids/ranks are output (the float race key never
    crosses the hash check). DuckDB's byte-length of a VARCHAR is
    strlen(); Spark's is octet_length() — same value.
    """
    from pudl_spark.functions.sampling import weighted_bottomk_sample

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.octet_length("text").alias("__w"))
    out = weighted_bottomk_sample(d, ["lang"], "doc_id", "__w", k=5)
    return out.select("lang", "doc_id", "smp_rank")


def doc_weighted_sample_oracle() -> str:
    from pudl_spark.plans.queries import _hex6

    h = _hex6("md5(CAST(doc_id AS VARCHAR) || ':wsmp')")
    u = f"({h} + 0.5) / 16777216.0"
    return f"""
WITH w AS (
  SELECT doc_id, lang,
    -ln({u}) / CAST(strlen(text) AS DOUBLE) AS e
  FROM documents WHERE strlen(text) > 0
)
SELECT lang, doc_id, smp_rank FROM (
  SELECT lang, doc_id,
    CAST(row_number() OVER (PARTITION BY lang
                            ORDER BY e ASC, doc_id ASC) AS BIGINT)
      AS smp_rank
  FROM w) WHERE smp_rank <= 5
"""
