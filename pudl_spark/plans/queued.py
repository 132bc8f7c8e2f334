"""Work staged for FUTURE driver-prefix rounds (pre-verified but
not yet registered: a new query must sit in the 50-slot prefix the
round it registers, and a swap touching certified queries waits for
the round those rotate through the prefix — the standing rules).

NOTHING IS CURRENTLY STAGED. The history of this queue:

- r12-staged queries -> registered r13 (`plans/queries.py`).
- r13-staged `table_quality_screens` composite -> registered r14
  (collapsed to a single-action union first, per VERDICT r13 #2).
- r12-staged `build_lsh_store_singlepass` (the build half of the
  `oph_banded_from_sets` swap; the one-shot-miner half landed r12)
  -> landed r15 as `functions/dedup.py::build_lsh_store`'s live
  body when the three r11-certified store rows rotated through the
  prefix. Byte-identity vs the pre-swap two-pass build is pinned
  against frozen store fingerprints in tests/test_r16_queue.py;
  the derivation-level two-SF pin
  (`test_oph_banded_from_sets_byte_identical`) lives there too.

New staged work follows the same pattern: the implementation lives
here with a docstring naming its landing round and slot budget,
oracles + driver-style differential tests go in the per-round queue
test file, and registration is a decorator move.
"""

from __future__ import annotations
