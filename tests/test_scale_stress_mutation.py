"""Pins for the mutation-based dedup corpus scaler (VERDICT r13 #4,
tools/scale_stress.py::build_mutated): the properties the 100x dedup
scale evidence rests on, asserted at sf0.001 so they hold by
construction, not by luck of the measured run.

- INTRA-copy preservation: the near-dup pairs mined inside mutated
  copy 1 are EXACTLY the base corpus' pairs (id-shifted) — per-copy
  partner structure is constant, so output grows linearly.
- CROSS-copy suppression: a doc and its own copy-1 mutant stay below
  the 0.5 registered jaccard threshold (the quadratic confound of
  verbatim copy-scaling is gone). The dedup shingles are 3-WORD
  shingles, so a word-mutation rate p suppresses cross-copy jaccard
  to ~(1-p)^3 / (2 - (1-p)^3); residual leakage at scale comes from
  SHORT docs whose every word escapes mutation (P = (1-p)^n_words),
  which is why the 100x run uses a higher rate.
- EMBEDDING exactness: the signed permutation preserves intra-copy
  cosines bit-for-bit (orthogonal transform of float32 lanes) while
  cross-copy self-cosines scatter far below the 0.4 SemDeDup
  threshold.
"""

from __future__ import annotations

import importlib.util
import os

from pyspark.sql import functions as F

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = "/root/testdata/sf0.001"


def _scale_stress():
    spec = importlib.util.spec_from_file_location(
        "scale_stress", os.path.join(REPO, "tools", "scale_stress.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_mutated_corpus_dedup_invariants(spark, tmp_path):
    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.functions.dedup import (
        minhash_candidate_pairs, shingle_hash_sets,
    )

    ss = _scale_stress()
    out = str(tmp_path / "mut")
    ss.build_mutated(spark, 2, base=SF, out_dir=out)

    docs = read_parquet_table(spark,
                              os.path.join(out, "documents.parquet"))
    base_pairs = sorted(map(tuple, minhash_candidate_pairs(
        read_parquet_table(spark, f"{SF}/documents.parquet"),
        "doc_id", "text", jaccard_threshold=0.5)
        .select("id_a", "id_b").collect()))
    assert base_pairs, "test data must contain base near-dup pairs"

    # intra-copy preservation: copy 1's pairs == base pairs shifted
    copy1 = docs.filter(F.col("doc_id") >= 10**7)
    got = sorted(map(tuple, minhash_candidate_pairs(
        copy1, "doc_id", "text", jaccard_threshold=0.5)
        .select("id_a", "id_b").collect()))
    want = sorted((a + 10**7, b + 10**7) for a, b in base_pairs)
    assert got == want

    # cross-copy suppression: exact shingle jaccard of every doc vs
    # its own mutant stays below the 0.5 threshold
    s0 = shingle_hash_sets(docs.filter(F.col("doc_id") < 10**7),
                           "doc_id", "text").select(
        F.col("id").alias("doc"), F.explode("__set").alias("h"))
    s1 = shingle_hash_sets(copy1, "doc_id", "text").select(
        (F.col("id") - 10**7).alias("doc"),
        F.explode("__set").alias("h"))
    inter = (s0.dropDuplicates().join(s1.dropDuplicates(), ["doc", "h"])
             .groupBy("doc").agg(F.count("*").alias("i")))
    sizes0 = s0.dropDuplicates().groupBy("doc").agg(
        F.count("*").alias("n0"))
    sizes1 = s1.dropDuplicates().groupBy("doc").agg(
        F.count("*").alias("n1"))
    j = (sizes0.join(sizes1, "doc").join(inter, "doc", "left")
         .select((F.coalesce("i", F.lit(0))
                  / (F.col("n0") + F.col("n1")
                     - F.coalesce("i", F.lit(0)))).alias("j")))
    stats = j.agg(F.max("j").alias("mx"),
                  F.expr("percentile(j, 0.5)").alias("med")).first()
    # at the default rate 60, no doc leaks past the 0.5 threshold
    # (measured max 0.33 on this data) and the typical cross-copy
    # self-jaccard sits near the (1-p)^3/(2-(1-p)^3) ~ 0.034 theory
    assert stats["mx"] < 0.5, \
        f"cross-copy self-jaccard reached {stats['mx']}"
    assert stats["med"] < 0.2, \
        f"median cross-copy self-jaccard {stats['med']}"

    # embeddings: intra-copy cosines exact, cross-copy self-cosines low
    emb = read_parquet_table(spark,
                             os.path.join(out, "embeddings.parquet"))
    base_e = {r["vec_id"]: r["embedding"] for r in emb.filter(
        F.col("vec_id") < 10**7).collect()}
    mut_e = {r["vec_id"] - 10**7: r["embedding"] for r in emb.filter(
        F.col("vec_id") >= 10**7).collect()}
    assert set(base_e) == set(mut_e)

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return num / (na * nb)

    ids = sorted(base_e)[:20]
    for i in range(0, len(ids) - 1, 2):
        a, b = ids[i], ids[i + 1]
        # intra-copy pair cosine: preserved to float32 exactness
        assert abs(cos(base_e[a], base_e[b])
                   - cos(mut_e[a], mut_e[b])) < 1e-6
    # cross-copy self-cosine: far below the 0.4 SemDeDup threshold
    worst = max(abs(cos(base_e[i], mut_e[i])) for i in ids)
    assert worst < 0.4, f"cross-copy self-cosine reached {worst}"
