"""Dedup family vs a pure-python reference: minhash candidate pairs
must find the engineered near-dups and report EXACT jaccard; simhash
hamming distances must match a bit-level python reimplementation."""

from __future__ import annotations

from pyspark.sql import functions as F

from pudl_spark.functions.dedup import (
    minhash_candidate_pairs, ngram_jaccard_pairs, simhash_expr,
)

BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep green forest before nightfall comes down")


def _shingles(text: str, k: int = 3) -> set[str]:
    toks = text.split()
    return {" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)}


def _jac(a: str, b: str) -> float:
    sa, sb = _shingles(a), _shingles(b)
    return len(sa & sb) / len(sa | sb)


def make_docs():
    near = BASE.replace("lazy", "sleepy")           # high overlap
    far = "completely different text with no overlap at all whatsoever"
    return [(0, BASE), (1, BASE), (2, near), (3, far)]


def test_minhash_finds_near_dups_with_exact_jaccard(spark):
    df = spark.createDataFrame(make_docs(), "doc_id long, text string")
    pairs = minhash_candidate_pairs(
        df, "doc_id", "text", num_hashes=64, bands=16,
        jaccard_threshold=0.5)
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    docs = dict(make_docs())
    # identical pair always found, with jaccard exactly 1
    assert got[(0, 1)] == 1.0
    # the engineered near-dup pair is found and its jaccard is the
    # EXACT set jaccard (the verify step computes truth, LSH only
    # proposes candidates)
    for (a, b), j in got.items():
        assert j == _jac(docs[a], docs[b])
    assert (0, 2) in got or (1, 2) in got
    # the unrelated document never pairs
    assert all(3 not in pair for pair in got)


def _char_jac(a: str, b: str, n: int = 3) -> float:
    ga = {a[i:i + n] for i in range(len(a) - n + 1)}
    gb = {b[i:i + n] for i in range(len(b) - n + 1)}
    return len(ga & gb) / len(ga | gb)


def test_ngram_jaccard_pairs_match_python(spark):
    df = spark.createDataFrame(make_docs(), "doc_id long, text string")
    pairs = ngram_jaccard_pairs(df, "doc_id", "text", threshold=0.4)
    docs = dict(make_docs())
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs.collect()}
    for (a, b), j in got.items():
        assert j == _char_jac(docs[a], docs[b])
    # the bottom-k sketch blocking must surface the engineered
    # near-dup pair, not just the identical one
    assert (0, 1) in got and got[(0, 1)] == 1.0
    assert (0, 2) in got and (1, 2) in got
    assert all(3 not in p for p in got)


def test_simhash_identical_and_near(spark):
    df = spark.createDataFrame(make_docs(), "doc_id long, text string")
    out = {r["doc_id"]: r["sh"] for r in
           df.select("doc_id", simhash_expr("text").alias("sh")).collect()}

    def hamming(x: int, y: int) -> int:
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    assert out[0] == out[1]                      # identical text
    assert hamming(out[0], out[2]) < 12          # near-dup: close
    assert hamming(out[0], out[3]) > 12          # unrelated: far


def test_minhash_miner_single_text_pass(spark):
    """Structural pin for the r12 single-text-pass swap: the miner's
    FINAL plan must read only the checkpointed sets blocks (RDD
    scans) — zero parquet re-scans of the documents table means the
    text is shingled exactly once, at the checkpoint
    materialization. Losing the localCheckpoint (or rederiving the
    verify sets from text) would silently reintroduce the double
    shingle pass this swap removed."""
    from pudl_spark.catalog import read_parquet_table
    from pudl_spark.functions.dedup import minhash_candidate_pairs

    d = read_parquet_table(spark,
                           "/root/testdata/sf0.001/documents.parquet")
    out = minhash_candidate_pairs(d, "doc_id", "text")

    # Pin on optimized-logical-plan NODE CLASSES, not explain-string
    # substrings (ADVICE r12: node display names change across Spark
    # versions): a file source appears as LogicalRelation, the
    # checkpointed sets as LogicalRDD — class names stable across
    # the 3.x/4.x line, and the logical plan sidesteps AQE's
    # physical-plan wrapping entirely.
    from plan_utils import optimized_plan_classes

    classes = optimized_plan_classes(out)
    scans = [c for c in classes if c == "LogicalRelation"]
    rdds = [c for c in classes if c == "LogicalRDD"]
    assert not scans, f"parquet re-scan in the miner plan: {classes}"
    assert rdds, f"checkpointed sets missing from plan: {classes}"
