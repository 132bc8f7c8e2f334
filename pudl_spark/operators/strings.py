"""String cleaning operators (ref: src/pudl/transform/classes.py §string
params + src/pudl/helpers.py). All pure Column expressions — JVM-side,
vectorized, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# ASCII-fold table for the NFKD->ASCII step of normalize_strings.
# The reference uses unicodedata.normalize('NFKD').encode('ascii',
# 'ignore') (ref: transform/classes.py:307-337); a translate() table
# covers the Latin-1/Latin-A range that actually occurs in its data
# without leaving codegen for a Python UDF.
_ACCENTS_SRC = "àáâãäåāăąçćĉċčèéêëēĕėęěìíîïĩīĭįıñńņňòóôõöøōŏőùúûüũūŭůűųýÿŷšžßÀÁÂÃÄÅĀĂĄÇĆĈĊČÈÉÊËĒĔĖĘĚÌÍÎÏĨĪĬĮÑŃŅŇÒÓÔÕÖØŌŎŐÙÚÛÜŨŪŬŮŰŲÝŸŶŠŽ"
_ACCENTS_DST = "aaaaaaaaaccccceeeeeeeeeiiiiiiiiinnnnooooooooouuuuuuuuuuyyyszsAAAAAAAAACCCCCEEEEEEEEEIIIIIIIINNNNOOOOOOOOOUUUUUUUUUUYYYSZ"


def normalize_strings(df: DataFrame, columns: list[str],
                      remove_chars: str = "") -> DataFrame:
    """ASCII-fold, lowercase, strip, collapse internal whitespace
    (ref: transform/classes.py:307-337). Empty string -> NULL.
    """
    updates = {}
    for c in columns:
        col = F.translate(F.col(c), _ACCENTS_SRC, _ACCENTS_DST)
        col = F.lower(col)
        if remove_chars:
            col = F.translate(col, remove_chars, "")
        col = F.trim(F.regexp_replace(col, r"\s+", " "))
        updates[c] = F.when(col == "", None).otherwise(col)
    return df.withColumns(updates)


def enforce_snake_case(df: DataFrame, columns: list[str]) -> DataFrame:
    """lower, spaces->_, drop non-[a-z0-9_]
    (ref: transform/classes.py:353-383).
    """
    updates = {}
    for c in columns:
        col = F.regexp_replace(F.lower(F.trim(F.col(c))), r"\s+", "_")
        updates[c] = F.regexp_replace(col, r"[^a-z0-9_]", "")
    return df.withColumns(updates)


def strip_non_numeric_values(df: DataFrame, columns: list[str]) -> DataFrame:
    """Extract the first numeric token; non-matches -> NULL
    (ref: transform/classes.py:404-431).
    """
    pat = r"(-?\d+(?:[\.,]\d+)?)"
    updates = {}
    for c in columns:
        ex = F.regexp_extract(F.col(c).cast("string"), pat, 1)
        updates[c] = F.when(ex == "", None).otherwise(
            F.regexp_replace(ex, ",", "."))
    return df.withColumns(updates)


def categorize_strings(df: DataFrame, col: str,
                       categories: dict[str, list[str]]) -> DataFrame:
    """Controlled-vocabulary mapping; unmapped values -> NULL
    (ref: transform/classes.py:516-530). ``categories`` maps canonical
    label -> list of raw spellings (the label itself is implicit).
    """
    flat: dict[str, str] = {}
    for label, raws in categories.items():
        flat[label] = label
        for raw in raws:
            flat[raw] = label
    mapping = F.create_map(*[F.lit(x) for kv in flat.items() for x in kv])
    return df.withColumn(col, mapping[F.col(col)])


def replace_with_na(df: DataFrame, col: str, na_values: list[str]) -> DataFrame:
    """Listed sentinel strings -> NULL (ref: transform/classes.py:917-919)."""
    c = F.col(col)
    return df.withColumn(col, F.when(c.isin(na_values), None).otherwise(c))


def standardize_na_values(df: DataFrame, columns: list[str] | None = None,
                          na_values: tuple[str, ...] = (
                              "", "-", "—", ".", "n/a", "na", "none", "null",
                              "nan", "*", "unknown", "?")) -> DataFrame:
    """Many NA spellings -> NULL (ref: helpers.py:1178)."""
    columns = columns or [c for c, t in df.dtypes if t == "string"]
    updates = {}
    for c in columns:
        norm = F.lower(F.trim(F.col(c)))
        updates[c] = F.when(norm.isin(list(na_values)), None).otherwise(F.col(c))
    return df.withColumns(updates)


def simplify_strings(df: DataFrame, columns: list[str]) -> DataFrame:
    """lower/strip/collapse-whitespace without the ASCII fold
    (ref: helpers.py:829).
    """
    updates = {
        c: F.trim(F.regexp_replace(F.lower(F.col(c)), r"\s+", " "))
        for c in columns
    }
    return df.withColumns(updates)


def zero_pad_numeric_string(df: DataFrame, col: str, n_digits: int) -> DataFrame:
    """Left-pad numeric strings to fixed width — FIPS/ZIP codes
    (ref: helpers.py:1518). Non-numeric or overlong values -> NULL.
    """
    cleaned = F.regexp_replace(F.col(col).cast("string"), r"\.0+$", "")
    padded = F.lpad(cleaned, n_digits, "0")
    ok = cleaned.rlike(r"^\d+$") & (F.length(cleaned) <= n_digits)
    return df.withColumn(col, F.when(ok, padded))


def standardize_phone_column(df: DataFrame, col: str) -> DataFrame:
    """Normalize US phone strings to ``NNN-NNN-NNNN``
    (ref: helpers.py:2326). Digits are extracted regardless of
    punctuation; an 11-digit number with a leading ``1`` drops the
    country code; anything else -> NULL. Pure regexp chain — stays in
    whole-stage codegen.
    """
    digits = F.regexp_replace(F.col(col).cast("string"), r"[^0-9]", "")
    ten = F.when(
        (F.length(digits) == 11) & digits.startswith("1"),
        F.substring(digits, 2, 10),
    ).when(F.length(digits) == 10, digits)
    formatted = F.concat_ws(
        "-", F.substring(ten, 1, 3), F.substring(ten, 4, 3),
        F.substring(ten, 7, 4))
    return df.withColumn(col, F.when(ten.isNotNull(), formatted))


def fix_int_na(df: DataFrame, col: str, sentinel: str = "") -> DataFrame:
    """Integer column with NULLs -> string column with a sentinel for
    NA (ref: helpers.py:964 — the pandas Int64->object dance collapses
    to cast + coalesce in Spark).
    """
    return df.withColumn(
        col,
        F.coalesce(F.col(col).cast("bigint").cast("string"),
                   F.lit(sentinel)),
    )


def remove_leading_zeros_from_numeric_strings(df: DataFrame,
                                              col: str) -> DataFrame:
    """Strip leading zeros when the value is fully numeric
    (ref: helpers.py:1142; Polars variant transform/epacems.py:221-226).
    """
    c = F.col(col)
    stripped = F.regexp_replace(c, r"^0+(\d)", "$1")
    return df.withColumn(col, F.when(c.rlike(r"^\d+$"), stripped).otherwise(c))


_ADDRESS_RE = r"^(.*),\s*([^,]+),\s*([A-Z]{2})\s+(\d{5})(?:-\d{4})?$"


def parse_address(df: DataFrame, col: str,
                  out_cols: tuple[str, str, str, str] = (
                      "street_address", "city", "state", "zip_code"),
                  drop: bool = False) -> DataFrame:
    """US address -> (street, city, state, zip) columns
    (ref: helpers.py:2660-2699, which wraps the usaddress probabilistic
    tagger). The well-formed "street, city, ST 12345[-6789]" shape —
    the overwhelming majority of the reference's address data — parses
    with one anchored regex that stays in whole-stage codegen;
    non-conforming rows yield NULLs in all four columns (the reference
    likewise nulls rows usaddress cannot tag). A learned tagger can be
    swapped in as a Pandas UDF behind the same signature if the messy
    tail matters.
    """
    src = F.col(col)
    street = F.regexp_extract(src, _ADDRESS_RE, 1)
    city = F.regexp_extract(src, _ADDRESS_RE, 2)
    state = F.regexp_extract(src, _ADDRESS_RE, 3)
    zipc = F.regexp_extract(src, _ADDRESS_RE, 4)
    out = df.withColumns({
        out_cols[0]: F.when(street != "", street),
        out_cols[1]: F.when(city != "", city),
        out_cols[2]: F.when(state != "", state),
        out_cols[3]: F.when(zipc != "", zipc),
    })
    return out.drop(col) if drop else out
