"""Bloom-filter-prefiltered incremental deduplication.

The 100 TB scenario: an existing curated corpus and a new crawl batch
arrive; the question "which new documents already exist?" must not
shuffle the full corpus against the full batch. The scalable shape is

  1. build a Bloom filter over the corpus content hashes — one
     map-side position expansion plus a tiny ``bit_or`` aggregation
     over ``num_bits/64`` words (the only shuffle, bounded by the
     filter size, not the data size);
  2. broadcast the word array to every executor (a few MB even for
     billion-document corpora at ~10 bits/item) and probe the batch
     map-only — vectorized bit tests over Arrow batches;
  3. confirm the (few) Bloom-positive candidates with an exact join.

Step 3 makes the operator EXACT: Bloom filters have no false
negatives, so the candidate set is a superset of the true duplicates
and the confirm join removes the false positives. The filter only
decides how much data reaches the join.

All hashing stays JVM-side (``xxhash64``); Python sees only the
precomputed probe positions and does pure numpy indexing, batched by
Arrow. Probe positions use Kirsch–Mitzenmacher double hashing
(h1 + i*h2 mod m), which preserves the standard Bloom false-positive
bound with two base hashes.

Reference analog: the reference deduplicates via pandas
``drop_duplicates`` inside single-process transforms (e.g.
src/pudl/transform/classes.py drop_invalid_rows / dedup steps); it has
no incremental path. This operator is the scale-first re-expression.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F

# Second-hash seed for Kirsch-Mitzenmacher double hashing. Any odd
# constant works; golden-ratio-derived to decorrelate from h1.
_H2_SEED = 0x9E3779B9


def _probe_positions(col: Column, num_bits: int, k: int) -> list[Column]:
    """k Bloom probe positions for ``col`` as Column expressions.

    Computed entirely JVM-side. Both base hashes are reduced mod m
    *before* combining so ``h1m + i*h2m`` stays well under 2^62 —
    Spark 4 runs ANSI mode and a silent long overflow would throw.
    """
    h1m = F.pmod(F.xxhash64(col), F.lit(num_bits))
    h2m = F.pmod(F.xxhash64(col, F.lit(_H2_SEED)), F.lit(num_bits))
    return [F.pmod(h1m + F.lit(i) * h2m, F.lit(num_bits)) for i in range(k)]


def bloom_build(df: DataFrame, col: Column, num_bits: int = 1 << 20,
                k: int = 4) -> np.ndarray:
    """Distributed Bloom build: returns the filter as a uint64 word
    array of length ``num_bits // 64``.

    The plan is one map-side position explode plus a single
    ``groupBy(word) .agg(bit_or)`` whose cardinality is the filter
    size in words — independent of input row count. The collect is
    bounded by the same (e.g. 2^20 bits = 16 K words = 128 KB).
    """
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    pos = F.explode(F.array(*_probe_positions(col, num_bits, k))).alias("p")
    words = (
        df.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("w"),
            # shiftleft on BIGINT is a bit op (wraps at bit 63, no
            # ANSI overflow), exactly what a bit mask wants. expr form:
            # the DSL's shiftleft only takes a literal shift amount.
            F.expr("shiftleft(cast(1 as bigint), "
                   "cast(pmod(p, 64) as int))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .collect()
    )
    arr = np.zeros(num_bits // 64, dtype=np.uint64)
    for r in words:
        arr[r["w"]] = np.uint64(r["word"] & 0xFFFFFFFFFFFFFFFF)
    return arr


def bloom_probe(df: DataFrame, col: Column, words: np.ndarray,
                k: int, flag_col: str = "bloom_hit") -> DataFrame:
    """Append ``flag_col``: whether ``col`` might be in the filter.

    Probe positions are Column expressions (JVM); the broadcast word
    array is tested with vectorized numpy ops inside ``mapInPandas``
    (Arrow-batched — no per-row Python). False positives possible,
    false negatives not; pair with an exact confirm join for exact
    semantics.
    """
    from pyspark.sql.types import BooleanType, StructField, StructType

    num_bits = len(words) * 64
    for reserved in ("__bloom_pos", flag_col):
        if reserved in df.columns:
            raise ValueError(
                f"bloom_probe: input already has a column named "
                f"{reserved!r}; rename it or pass a different flag_col")
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(words)
    tagged = df.withColumn(
        "__bloom_pos", F.array(*_probe_positions(col, num_bits, k)))
    out_schema = StructType(
        [f for f in df.schema.fields] + [StructField(flag_col, BooleanType())])

    def kernel(batches):
        w = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pos = np.asarray(pdf["__bloom_pos"].tolist(), dtype=np.uint64)
            bits = w[(pos >> np.uint64(6))] >> (pos & np.uint64(63))
            hit = (bits & np.uint64(1)).all(axis=1)
            yield pdf.drop(columns="__bloom_pos").assign(**{flag_col: hit})

    return tagged.mapInPandas(kernel, out_schema)


def bloom_incremental_dedup(corpus: DataFrame, batch: DataFrame,
                            id_col: str, text_col: str,
                            num_bits: int = 1 << 20,
                            k: int = 4) -> DataFrame:
    """Mark each batch row with ``is_dup``: does its text already
    exist in the corpus? Exact up to a 2^-128 hash-pair collision;
    Bloom-bounded work.

    Only Bloom-positive candidates reach the confirm join, and both
    join sides carry (hash-pair, id) — the full text never shuffles.
    Text equality is represented by a 128-bit hash pair (two
    independently-seeded xxhash64 values), so a false ``is_dup``
    needs a simultaneous collision in both 64-bit hashes
    (~2^-128 per pair — negligible at any corpus size). A NULL batch
    text is never a duplicate (SQL ``c.text = b.text`` is not true
    for NULL = NULL), so NULL-text rows are excluded from the
    candidate set and surface with ``is_dup = false``; NULL corpus
    texts are likewise dropped before the filter build.
    """
    corpus_nn = corpus.filter(F.col(text_col).isNotNull())
    h1 = F.xxhash64(F.col(text_col))
    h2 = F.xxhash64(F.col(text_col), F.lit(_H2_SEED))
    words = bloom_build(corpus_nn, F.col(text_col), num_bits=num_bits, k=k)
    probed = bloom_probe(
        batch.filter(F.col(text_col).isNotNull()), F.col(text_col), words, k=k)
    cand = (probed.filter(F.col("bloom_hit"))
            .select(F.col(id_col), h1.alias("__h1"), h2.alias("__h2")))
    confirmed = cand.join(
        corpus_nn.select(h1.alias("__h1"), h2.alias("__h2")).distinct(),
        on=["__h1", "__h2"], how="left_semi"
    ).select(id_col).withColumn("__dup", F.lit(True))
    return (
        batch.join(confirmed, on=id_col, how="left")
        .withColumn("is_dup", F.coalesce(F.col("__dup"), F.lit(False)))
        .drop("__dup")
    )
