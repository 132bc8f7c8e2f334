"""Distributed BPE training: exact parity with the first-principles
reference implementation, determinism, and tokenizer application."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pudl_spark.functions.bpe import (
    EOW, _merge_symbols, apply_bpe, train_bpe, train_bpe_reference)

TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "a cat and a hat and a bat",
    "the bat sat near the hat",
]


def _wc(texts):
    wc: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    return wc


def test_merge_symbols_nonoverlapping():
    assert _merge_symbols(["a", "a", "a"], "a", "a") == ["aa", "a"]
    assert _merge_symbols(["a", "b", "a", "b"], "a", "b") == ["ab", "ab"]
    assert _merge_symbols(["x"], "a", "b") == ["x"]


def test_distributed_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["merged"],
            r["pair_count"]) for r in
           train_bpe(df, "text", num_merges=12).collect()]
    assert got == train_bpe_reference(_wc(TEXTS), num_merges=12)


def test_apply_bpe_uses_learned_units(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string")
    merges = [(r["rank"], r["left"], r["right"]) for r in
              train_bpe(df, "text", num_merges=12).collect()]
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in apply_bpe(df, "text", merges).collect()}
    # reconstructing the text from tokens is lossless
    for i, t in enumerate(TEXTS):
        joined = "".join(out[i]).replace(EOW, " ").strip()
        assert joined == t
    # frequent words become single tokens
    assert "the" + EOW in out[0]


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
@settings(max_examples=5, deadline=None)
def test_property_reference_parity_random_corpora(seed, spark):
    rng = np.random.default_rng(seed)
    words = ["aa", "ab", "abc", "bca", "cab", "aabb", "ba"]
    texts = [" ".join(rng.choice(words, size=rng.integers(3, 10)))
             for _ in range(6)]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = [(r["rank"], r["left"], r["right"], r["merged"],
            r["pair_count"]) for r in
           train_bpe(df, "text", num_merges=8).collect()]
    assert got == train_bpe_reference(_wc(texts), num_merges=8)


def test_apply_bpe_null_text_is_null_total(spark):
    """NULL text must yield NULL tokens (SQL semantics, matching the
    doc_apply_bpe oracle's NULL propagation) — never the literal
    string \"None\" tokenized (self-review r8)."""
    df = spark.createDataFrame(
        [(0, "the cat"), (1, None)], "doc_id long, text string")
    merges = [(0, "t", "h"), (1, "th", "e")]
    out = {r["doc_id"]: r["bpe_tokens"]
           for r in apply_bpe(df, "text", merges).collect()}
    assert out[1] is None
    assert out[0] is not None and "the" + EOW not in out[0]
    assert out[0][0] == "the"  # merges applied to the real row
