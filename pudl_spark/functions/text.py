"""Text-analysis column expressions — language ID, quality scoring,
token counting, shingling, fingerprinting.

These extend the reference's string-cleaning vocabulary
(src/pudl/transform/classes.py) to the training-data-pipeline ops a
100 TB document corpus needs. Everything is a Column expression over
built-in functions: no Python in the row path, so the work distributes
and stays inside whole-stage codegen.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import Column, functions as F

# SQL-text fast path (r16, guide §1.2): the expression builders below
# are assembled per query CONSTRUCTION, and the Column-operator form
# pays one py4j round trip per call — hundreds to thousands per query
# (~0.1-0.5 s of driver wall, measured). When the input column is a
# plain string name, each builder instead renders the IDENTICAL
# expression as SQL text and parses it JVM-side in one round trip.
# The trees match token for token (same functions, literals and
# association order; lambda variable names differ cosmetically), so
# plans and results are unchanged — oracle-pinned for every consumer
# query. Column inputs keep the original operator path.
_PLAIN_IDENT = _re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _ident_sql(col: Column | str) -> str | None:
    """Backticked SQL identifier for a plain string column name;
    None for Column inputs or non-plain names (dotted/exotic), which
    keep the Column-operator path."""
    if isinstance(col, str) and _PLAIN_IDENT.match(col):
        return f"`{col}`"
    return None


def _sq(s: str) -> str:
    """Single-quoted SQL string literal."""
    return "'" + s.replace("\\", "\\\\").replace("'", "''") + "'"


def _tokens_sql(c: str) -> str:
    return (f"CASE WHEN trim({c}) = '' THEN "
            f"CAST(array() AS array<string>) "
            f"ELSE split(trim({c}), '\\\\s+') END")


def _word_shingles_sql(c: str, k: int, distinct: bool) -> str:
    t = _tokens_sql(c)
    idx = (f"CASE WHEN size({t}) >= {k} THEN "
           f"sequence(1, size({t}) - {k - 1}) "
           f"ELSE CAST(array() AS array<int>) END")
    sh = f"transform({idx}, i -> array_join(slice({t}, i, {k}), ' '))"
    return f"array_distinct({sh})" if distinct else sh

# Tiny per-language marker vocabularies for the n-gram/stopword
# heuristic language ID. Real pipelines swap in fastText et al.; the
# heuristic keeps the plumbing testable and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "a", "in", "that"),
    "es": ("el", "la", "de", "que", "los", "una", "es", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "que"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "zh": ("de5", "shi4", "le5", "zai4", "you3", "wo3", "ta1", "men5"),
}

STOPWORDS_EN = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "as", "with", "at", "by", "from",
)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    c_sql = _ident_sql(col)
    if c_sql is not None:
        return F.expr(_tokens_sql(c_sql))
    c = F.col(col) if isinstance(col, str) else col
    t = F.split(F.trim(c), r"\s+")
    return F.when(F.trim(c) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """BPE-flavored token estimate: words + punctuation runs + digit
    runs each count; long words count ceil(len/4) pieces (the common
    ~4-chars-per-token heuristic).
    """
    c_sql = _ident_sql(col)
    if c_sql is not None:
        pieces = (f"aggregate({_tokens_sql(c_sql)}, "
                  f"CAST(0 AS BIGINT), (acc, wrd) -> "
                  f"acc + CAST(ceil(length(wrd) / 4.0D) AS BIGINT))")
        punct = (f"length({c_sql}) - length(regexp_replace({c_sql}, "
                 f"'[^\\\\w\\\\s]', ''))")
        return F.expr(f"CAST({pieces} + {punct} AS BIGINT)")
    c = F.col(col) if isinstance(col, str) else col
    words = tokens(c)
    pieces = F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, wrd: acc + F.ceil(F.length(wrd) / 4.0).cast("long"),
    )
    punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return (pieces + punct).cast("long")


def char_ngrams(col: Column | str, n: int = 3,
                distinct: bool = True) -> Column:
    """Character n-gram (shingle) array via sequence+substr — no UDF."""
    c_sql = _ident_sql(col)
    if c_sql is not None:
        idx = (f"CASE WHEN length({c_sql}) >= {n} THEN "
               f"sequence(1, length({c_sql}) - {n - 1}) "
               f"ELSE CAST(array() AS array<int>) END")
        grams = f"transform({idx}, i -> substr({c_sql}, i, {n}))"
        return F.expr(f"array_distinct({grams})" if distinct else grams)
    c = F.col(col) if isinstance(col, str) else col
    # NB sequence(1, 0) steps DOWN in Spark -> guard short strings.
    idx = F.when(
        F.length(c) >= n, F.sequence(F.lit(1), F.length(c) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idx, lambda i: c.substr(i, F.lit(n)))
    return F.array_distinct(grams) if distinct else grams


def word_shingles(col: Column | str, k: int = 3,
                  distinct: bool = True) -> Column:
    """k-word shingles: array of space-joined consecutive token runs."""
    c_sql = _ident_sql(col)
    if c_sql is not None:
        return F.expr(_word_shingles_sql(c_sql, k, distinct))
    t = tokens(col)
    # NB sequence(1, 0) steps DOWN in Spark -> guard short documents.
    idx = F.when(
        F.size(t) >= k, F.sequence(F.lit(1), F.size(t) - (k - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = F.transform(idx, lambda i: F.array_join(F.slice(t, i, k), " "))
    return F.array_distinct(sh) if distinct else sh


def language_id_expr(col: Column | str,
                     markers: dict[str, tuple[str, ...]] | None = None,
                     min_hits: int = 1) -> Column:
    """Heuristic language ID: the language whose marker vocabulary hits
    the most tokens; NULL when nothing scores >= min_hits.
    Deterministic tie-break by language code.
    """
    markers = markers or LANG_MARKERS
    c_sql = _ident_sql(col)
    if c_sql is not None:
        t = _tokens_sql(c_sql)
        best = "CAST(NULL AS STRING)"
        best_score = str(min_hits - 1)
        for lang in sorted(markers):
            vocab = ("array(" + ",".join(
                _sq(m) for m in markers[lang]) + ")")
            score = f"size(array_intersect({t}, {vocab}))"
            cond = f"{score} > {best_score}"
            best = (f"CASE WHEN {cond} THEN {_sq(lang)} "
                    f"ELSE {best} END")
            best_score = (f"CASE WHEN {cond} THEN {score} "
                          f"ELSE {best_score} END")
        return F.expr(best)
    t = tokens(col)
    best = F.lit(None).cast("string")
    best_score = F.lit(min_hits - 1)
    for lang in sorted(markers):
        vocab = F.array(*[F.lit(m) for m in markers[lang]])
        score = F.size(F.array_intersect(t, vocab))
        cond = score > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, score).otherwise(best_score)
    return best


def quality_score_expr(col: Column | str,
                       stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    """Composite document-quality score in [0, 1]: combines length,
    mean word length, alpha ratio and stopword ratio — the standard
    cheap pre-filter family for web corpora.
    """
    c_sql = _ident_sql(col)
    if c_sql is not None:
        f = _quality_features_sql(c_sql, stopwords)
        return F.expr(
            f"0.3D * {f['len_score']} + 0.2D * {f['word_score']} "
            f"+ 0.2D * {f['alpha_ratio']} + 0.3D * {f['stop_score']}")
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n_tok = F.size(t)
    n_chars = F.length(c)
    mean_word = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(c, r"[^A-Za-z ]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(s) for s in stopwords])
    stop_hits = F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    word_score = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)) \
        .otherwise(F.lit(0.3))
    stop_score = F.least(stop_ratio * 5.0, F.lit(1.0))
    return (0.3 * len_score + 0.2 * word_score + 0.2 * alpha_ratio
            + 0.3 * stop_score)


def _quality_features_sql(c_sql: str,
                          stopwords: tuple[str, ...]) -> dict[str, str]:
    """SQL fragments for the shared quality features — token-for-token
    the Column chains in quality_score_expr / quality_logit_expr."""
    t = _tokens_sql(c_sql)
    n_tok = f"size({t})"
    n_chars = f"length({c_sql})"
    mean_word = (f"CASE WHEN {n_tok} > 0 THEN {n_chars} / {n_tok} "
                 f"ELSE 0.0D END")
    alpha_ratio = (
        f"CASE WHEN {n_chars} > 0 THEN "
        f"length(regexp_replace({c_sql}, '[^A-Za-z ]', '')) "
        f"/ {n_chars} ELSE 0.0D END")
    sw = "array(" + ",".join(_sq(s) for s in stopwords) + ")"
    stop_hits = (f"size(filter({t}, "
                 f"w -> array_contains({sw}, lower(w))))")
    stop_ratio = (f"CASE WHEN {n_tok} > 0 THEN {stop_hits} / {n_tok} "
                  f"ELSE 0.0D END")
    return {
        "len_score": f"least({n_tok} / 100.0D, 1.0D)",
        "word_score": (f"CASE WHEN (({mean_word}) >= 3) AND "
                       f"(({mean_word}) <= 10) THEN 1.0D "
                       f"ELSE 0.3D END"),
        "alpha_ratio": f"({alpha_ratio})",
        "stop_score": f"least(({stop_ratio}) * 5.0D, 1.0D)",
    }


def document_fingerprint(col: Column | str, k: int = 5) -> Column:
    """Winnowing-style rolling-hash fingerprint: min 64-bit hash over
    the document's k-word shingles. Stable under whitespace noise;
    equal fingerprints are near-dup candidates.
    """
    sh = word_shingles(col, k=k, distinct=True)
    hashed = F.transform(sh, lambda s: F.xxhash64(s))
    return F.when(F.size(sh) > 0, F.array_min(hashed)).otherwise(
        F.xxhash64(F.col(col) if isinstance(col, str) else col))


def document_fingerprint_digest(col: Column | str, k: int = 5) -> Column:
    """Winnowing-style fingerprint via a native digest: min md5 hex
    over the document's k-word shingles (whole-text md5 when shorter
    than k tokens). One single-pass JVM digest per shingle — ~10x
    cheaper than the per-character polynomial fold — while staying
    engine-portable (md5 is standardized, so a SQL oracle reproduces
    it bit-for-bit, unlike xxhash64). Hex strings compare bytewise in
    both engines, so min() agrees.
    """
    c_sql = _ident_sql(col)
    if c_sql is not None:
        sh = _word_shingles_sql(c_sql, k, True)
        hashed = f"transform({sh}, s -> md5(encode(s, 'utf-8')))"
        return F.expr(
            f"CASE WHEN size({sh}) > 0 THEN array_min({hashed}) "
            f"ELSE md5(encode({c_sql}, 'utf-8')) END")
    c = F.col(col) if isinstance(col, str) else col
    sh = word_shingles(c, k=k, distinct=True)
    hashed = F.transform(sh, lambda s: F.md5(F.encode(s, "utf-8")))
    return F.when(F.size(sh) > 0, F.array_min(hashed)).otherwise(
        F.md5(F.encode(c, "utf-8")))


def polynomial_hash(col: Column | str, mod: int = 1_000_000_007,
                    base: int = 31) -> Column:
    """Portable polynomial rolling hash over a string's code points:
    h = fold(h * base + unicode(ch)) mod m. Unlike xxhash64 this is
    reproducible in any SQL engine (the DuckDB oracle mirrors it with
    list_reduce), so fingerprint queries are differentially testable.
    Stays in whole-stage codegen: split/transform/aggregate are all
    built-in higher-order functions.
    """
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    codes = F.transform(chars, lambda ch: F.ascii(ch).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod,
    )


def document_fingerprint_portable(col: Column | str, k: int = 5,
                                  mod: int = 1_000_000_007,
                                  base: int = 31) -> Column:
    """Winnowing-style fingerprint with the portable polynomial hash:
    min over the document's k-word shingles. Same semantics as
    document_fingerprint (the xxhash64 production path) but oracle-
    checkable bit-for-bit against DuckDB.
    """
    sh = word_shingles(col, k=k, distinct=True)
    hashed = F.transform(
        sh, lambda s: F.aggregate(
            F.transform(F.split(s, ""), lambda ch: F.ascii(ch).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: (acc * base + x) % mod))
    c = F.col(col) if isinstance(col, str) else col
    whole = F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: (acc * base + x) % mod)
    return F.when(F.size(sh) > 0, F.array_min(hashed)).otherwise(whole)


def bm25_scores(df, text_col: str, terms: list[str],
                k1: float = 1.2, b: float = 0.75):
    """BM25 relevance of every document against a fixed query-term
    list — the relevance-filtering step of a corpus curation pipeline
    ("keep documents that look like X").

    Scale shape: one aggregation pass computes the corpus statistics
    (N, avg doc length, per-term document frequencies) as a SINGLE
    row; a broadcast cross-join attaches it; tf and the score are then
    map-only higher-order array expressions inside codegen. Two scans,
    one 1-row shuffle, no explode of the token stream (term count is
    fixed and small, so per-term ``array_contains``/``filter`` beats
    an explode+join by the width of the token explosion).

    Per-term scores are summed in list order (a fixed-length chain,
    not a SUM aggregate) so the float result is order-deterministic
    and mirrors an oracle writing the same chain.

    Returns df plus: ``doc_len`` (bigint) and ``bm25`` (double,
    rounded to 6 dp to absorb the ULP difference between ln()
    implementations).
    """
    reserved = {"__toks", "__n", "__sumdl", "__dl", "doc_len", "bm25"} | {
        f"__df_{i}" for i in range(len(terms))}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"bm25_scores: input already has column(s) {sorted(clash)} "
            "that this operator uses as temp/output names; rename them")
    # Expressions are built as PARSED SQL text (the r15
    # `_sig_map_to_banded` cure, guide §1.2): the per-term chain below
    # costs ~1,500 py4j round trips (~0.4 s of driver wall per
    # construction, measured r16) when assembled through Column
    # operators one call at a time, and one JVM-side parse when
    # assembled as text. The SQL mirrors the Column form token for
    # token — same functions, same literal values, same association
    # order — so the Catalyst tree and the float results are
    # unchanged (equality-pinned in tests/test_text_ops.py).
    def _d(x: float) -> str:
        return f"{float(x)!r}D"

    def _s(t: str) -> str:
        return "'" + t.replace("'", "''") + "'"

    qc = f"`{text_col}`"
    toks_sql = (f"transform(CASE WHEN trim({qc}) = '' THEN "
                f"CAST(array() AS array<string>) ELSE "
                f"split(trim({qc}), '\\\\s+') END, t -> lower(t))")
    df = df.withColumn("__toks", F.expr(toks_sql))
    dl_sql = "CAST(size(__toks) AS BIGINT)"
    stats = df.agg(
        F.expr("CAST(count(1) AS DOUBLE) AS __n"),
        F.expr(f"CAST(sum({dl_sql}) AS DOUBLE) AS __sumdl"),
        *[F.expr(f"CAST(sum(CAST(array_contains(__toks, {_s(t)}) "
                 f"AS BIGINT)) AS DOUBLE) AS __df_{i}")
          for i, t in enumerate(terms)],
    )
    out = df.crossJoin(F.broadcast(stats)).withColumn(
        "__dl", F.expr(dl_sql))
    score_sql = _d(0.0)
    for i, t in enumerate(terms):
        tf = f"CAST(size(filter(__toks, x -> x = {_s(t)})) AS DOUBLE)"
        idf = (f"ln((__n - __df_{i} + {_d(0.5)}) / "
               f"(__df_{i} + {_d(0.5)}) + {_d(1.0)})")
        denom = (f"{tf} + {_d(k1)} * ({_d(1.0)} - {_d(b)} + {_d(b)} "
                 f"* CAST(__dl AS DOUBLE) / (__sumdl / __n))")
        score_sql = (f"({score_sql} + {idf} * "
                     f"({tf} * {_d(k1 + 1.0)}) / ({denom}))")
    return (
        out.withColumn("doc_len", F.col("__dl"))
        .withColumn("bm25", F.expr(f"round({score_sql}, 6)"))
        .drop("__toks", "__dl", "__n", "__sumdl",
              *[f"__df_{i}" for i in range(len(terms))])
    )


def quality_logit_expr(col: Column | str,
                       stopwords: tuple[str, ...] = STOPWORDS_EN,
                       weights: tuple[float, float, float, float] =
                       (1.8, 2.2, 1.4, 0.9),
                       bias: float = -2.5) -> Column:
    """Linear quality-classifier logit (fasttext-style linear model
    with fixed weights — the model-based document filter of curation
    pipelines like CCNet/DCLM, made deterministic so an SQL oracle can
    reproduce it bit-for-bit). Features, in weight order:

      x1 = min(n_tok/100, 1)          (length)
      x2 = alpha_ratio                 (symbol pollution)
      x3 = min(stopword_ratio*5, 1)    (English-ness)
      x4 = 1.0 if 3<=mean_word_len<=10 else 0.3   (word shape)

    Returns the raw logit z = ((w1*x1 + w2*x2) + w3*x3) + w4*x4 + b;
    callers derive sigmoid(z) and the keep/drop label. The expression
    shape (association order) is part of the contract — mirror it
    exactly in any oracle. Map-only, whole-stage-codegen."""
    c_sql = _ident_sql(col)
    if c_sql is not None:
        f = _quality_features_sql(c_sql, stopwords)
        w1, w2, w3, w4 = weights
        return F.expr(
            f"((({float(w1)!r}D * {f['len_score']} "
            f"+ {float(w2)!r}D * {f['alpha_ratio']}) "
            f"+ {float(w3)!r}D * {f['stop_score']}) "
            f"+ {float(w4)!r}D * {f['word_score']}) "
            f"+ {float(bias)!r}D")
    c = F.col(col) if isinstance(col, str) else col
    t = tokens(c)
    n_tok = F.size(t)
    n_chars = F.length(c)
    mean_word = F.when(n_tok > 0, n_chars / n_tok).otherwise(F.lit(0.0))
    alpha_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(c, r"[^A-Za-z ]", "")) / n_chars,
    ).otherwise(F.lit(0.0))
    sw = F.array(*[F.lit(s) for s in stopwords])
    stop_hits = F.size(F.filter(t, lambda w: F.array_contains(sw, F.lower(w))))
    stop_ratio = F.when(n_tok > 0, stop_hits / n_tok).otherwise(F.lit(0.0))
    x1 = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    x2 = alpha_ratio
    x3 = F.least(stop_ratio * 5.0, F.lit(1.0))
    x4 = F.when((mean_word >= 3) & (mean_word <= 10), F.lit(1.0)) \
        .otherwise(F.lit(0.3))
    w1, w2, w3, w4 = weights
    return (((F.lit(w1) * x1 + F.lit(w2) * x2) + F.lit(w3) * x3)
            + F.lit(w4) * x4) + F.lit(bias)
