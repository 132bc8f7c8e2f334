"""Work staged for FUTURE driver-prefix rounds (pre-verified but
not yet registered: a new query must sit in the 50-slot prefix the
round it registers, and a swap touching certified queries waits for
the round those rotate through the prefix — the standing rules).

The four r12-staged queries registered in r13 and the r13-staged
`table_quality_screens` composite registered in r14 (collapsed to a
single-action union first, per VERDICT r13 #2); all now live in
`plans/queries.py`. What remains staged here:

- `build_lsh_store_singlepass` — the build half of the
  `oph_banded_from_sets` swap (the one-shot-miner half landed r12).
  It touches all five LSH-store rows, so it swaps in r15 when the
  r11-certified trio rotates through the prefix (see the budget
  sketch in __spark_entry__.py). Tripwires:
  tests/test_r15_queue.py byte-identity at store level plus the
  two-SF derivation pin.

  r15 LANDING CHECKLIST (a decorator move, budgeted at zero extra
  prefix slots — the three r11 store rows are already cohort rows):
  1. replace `functions/dedup.py::build_lsh_store`'s body with this
     function's (sets table first, bands derived via
     `oph_banded_from_sets`, params written last) and delete the
     staged copy here;
  2. declare ALL FIVE store-building rows in _TOUCHED_THIS_ROUND:
     doc_lsh_store_increment / doc_lsh_store_ingest /
     doc_lsh_store_probe_small (r11-green — they sit in the r15
     cohort anyway, zero extra slots) PLUS doc_lsh_store_redelivery
     and doc_lsh_stream_pairs (r12-green as of r14; the touched
     rule binds regardless of cohort membership, so these two COST
     two r15 slots — the entry sketch's six no-registration spares
     become four);
  3. keep test_singlepass_build_store_byte_identical but flip it to
     compare the NEW live build against a frozen pre-swap store
     fingerprint (or simply drop the staged copy and let
     test_oph_banded_from_sets_byte_identical carry the derivation
     pin);
  4. re-floor the three store rows same-session (expect ~30% off
     the build-dominated walls: r12 measured 2.36 -> 1.60 s on the
     isolated build).
"""

from __future__ import annotations

import os


def _t(spark, sf_dir, name):
    from pudl_spark.catalog import read_parquet_table

    return read_parquet_table(spark, os.path.join(sf_dir,
                                                  f"{name}.parquet"))


def build_lsh_store_singlepass(spark, df, id_col, text_col,
                               table_prefix, path,
                               num_hashes: int = 64, bands: int = 16,
                               shingle_k: int = 3,
                               num_buckets: int = 8) -> None:
    """STAGED for r15 (the build half of the oph_banded_from_sets
    swap — the one-shot-miner half landed r12): `build_lsh_store`
    with the corpus shingled ONCE. The live build pays two full
    text passes (oph_banded's explode for the bands table, then
    shingle_hash_sets for the sets table); here the SETS table
    writes first and the bands derive from the WRITTEN table via
    `dedup.oph_banded_from_sets` — the second corpus text pass
    becomes a scan of stored hash arrays. Write order flips (sets
    before bands) with unchanged crash semantics: both tables drop
    first, the build is re-runnable from scratch, and probes/appends
    assert against the bands table's params — written last, so a
    half-built store fails loudly rather than serving.

    Byte-identity of BOTH output tables vs the live build is pinned
    in tests/test_r15_queue.py (the store-level tripwire; the
    derivation-level tripwire pins two SFs). Measured same-session
    at sf0.1 (r12): live build floor 2.36 s, single-pass **1.60 s**
    — 32% off the index build, and the saved work is the corpus
    text pass, so the fraction grows with document length at scale.
    Swap deferred until the five LSH-store rows rotate through the
    driver prefix (r15 for the r11 trio — see the budget sketch in
    __spark_entry__.py).
    """
    from pudl_spark.functions.dedup import (
        _invalidate_store_bytes, oph_banded_from_sets,
        shingle_hash_sets,
    )
    from pudl_spark.sources.files import (
        set_table_build_params, write_bucketed_table,
    )

    for t in (f"{table_prefix}_bands", f"{table_prefix}_sets"):
        _invalidate_store_bytes(spark, t)
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    write_bucketed_table(
        shingle_hash_sets(df, id_col, text_col, shingle_k),
        f"{table_prefix}_sets", ["id"], num_buckets,
        sort_cols=["id"], path=os.path.join(path, "sets"))
    write_bucketed_table(
        oph_banded_from_sets(spark.table(f"{table_prefix}_sets"),
                             num_hashes, bands),
        f"{table_prefix}_bands", ["band", "bucket"], num_buckets,
        sort_cols=["band", "bucket", "id"],
        path=os.path.join(path, "bands"))
    set_table_build_params(
        spark, f"{table_prefix}_bands",
        {"num_hashes": num_hashes, "bands": bands,
         "shingle_k": shingle_k, "num_buckets": num_buckets})

