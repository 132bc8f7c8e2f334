"""Focused tests for the r16 SQL-text construction fast paths in
``functions/text.py`` and ``operators/layout.py``: when the input
column is a plain string name, each builder renders the IDENTICAL
expression as SQL text (one JVM-side parse) instead of assembling it
through per-call py4j Column operators. These tests pin the two paths
bit-equal over a corpus chosen to hit every guard branch (empty /
whitespace-only / short / unicode / quote / backslash inputs).
"""

import pytest
from pyspark.sql import functions as F

from pudl_spark.functions.text import (
    bpe_ish_token_count, char_ngrams, document_fingerprint_digest,
    language_id_expr, quality_logit_expr, quality_score_expr, tokens,
    word_shingles, _ident_sql,
)
from pudl_spark.operators.layout import zorder_expr

CORPUS = [
    "",                                   # empty -> empty token array
    "   ",                                # whitespace-only
    "a",                                  # shorter than any n/k
    "one two",                            # < k=3 tokens
    "the quick brown fox jumps over the lazy dog",
    "der und die ist nicht das ein zu",   # German markers
    "it's a \"quoted\" back\\slash line", # quote/backslash safety
    "café naïve 中文 words mixed in",  # unicode
    "x" * 37 + " yy " + "z" * 9,          # long words (BPE ceil path)
    "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    "Multi.  spaced\tand\nnewlined   text here!",
    "pun,ct;ua:tion! and? (numbers) 123 45.6 7e8",
]

BUILDERS = [
    ("tokens", lambda c: tokens(c)),
    ("bpe", lambda c: bpe_ish_token_count(c)),
    ("char_ngrams3", lambda c: char_ngrams(c, n=3)),
    ("char_ngrams2_all", lambda c: char_ngrams(c, n=2, distinct=False)),
    ("shingles3", lambda c: word_shingles(c, k=3)),
    ("shingles5_all", lambda c: word_shingles(c, k=5, distinct=False)),
    ("lang", lambda c: language_id_expr(c)),
    ("quality", lambda c: quality_score_expr(c)),
    ("logit", lambda c: quality_logit_expr(c)),
    ("digest", lambda c: document_fingerprint_digest(c, k=5)),
]


@pytest.fixture(scope="module")
def text_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["id", "text"],
    ).coalesce(1)


def test_ident_sql_gate(spark):
    """Only plain identifiers take the SQL-text path; Columns and
    exotic names keep the operator path."""
    assert _ident_sql("text") == "`text`"
    assert _ident_sql("a_1") == "`a_1`"
    assert _ident_sql(F.col("text")) is None
    assert _ident_sql("a.b") is None
    assert _ident_sql("a b") is None
    assert _ident_sql("1a") is None


@pytest.mark.parametrize("name,build", BUILDERS, ids=[b[0] for b in BUILDERS])
def test_sql_text_path_bit_equal(text_df, name, build):
    """String-name input (SQL-text parse) and Column input (operator
    chain) must produce bit-identical results — same functions, same
    literals, same association order."""
    fast = text_df.select("id", build("text").alias("v")) \
        .orderBy("id").collect()
    slow = text_df.select("id", build(F.col("text")).alias("v")) \
        .orderBy("id").collect()
    assert fast == slow


def test_zorder_sql_text_bit_equal(spark):
    """zorder_expr over string names (SQL-text) vs Columns (operator
    loop) — identical interleaved-bit values, including negatives
    clamped by the cast and the bits cap."""
    df = spark.createDataFrame(
        [(0, 0), (1, 1), (7, 130), (1 << 19, (1 << 20) - 1),
         (123456, 654321), (42, 0)], ["a", "b"]).coalesce(1)
    fast = df.select(zorder_expr(["a", "b"], bits=20).alias("z")).collect()
    slow = df.select(
        zorder_expr([F.col("a"), F.col("b")], bits=20).alias("z")).collect()
    assert fast == slow
    # Distinctness sanity: interleaving is injective on these inputs.
    assert len({r.z for r in fast}) == df.count()
