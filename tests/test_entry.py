"""Attestation invariants for the driver contract (ADVICE r2 +
VERDICT r2 "Next round" #7).

- every _PRIORITY name resolves to a registered query (a typo must
  fail loudly, not silently demote the query out of the checked
  prefix);
- QUERIES and ORACLES stay in lockstep;
- README.md's advertised query count matches the registry, so the
  self-attestation surface cannot drift again.
"""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pudl_spark.plans.queries import ORACLES, QUERIES, ROWS_ONLY

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_names_all_registered():
    missing = [n for n in entry._PRIORITY if n not in QUERIES]
    assert missing == []


def test_priority_has_no_duplicates():
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_queries_and_oracles_in_lockstep():
    """Every query has a SQL oracle EXCEPT the explicitly-registered
    rows-only iterative algorithms (driver contract: those get a
    weaker rows-only check; tests pin them against first-principles
    references instead)."""
    assert set(ORACLES) == set(QUERIES) - ROWS_ONLY
    assert ROWS_ONLY <= set(QUERIES)
    # rows-only stays the rare exception, never the norm
    assert len(ROWS_ONLY) <= 3, sorted(ROWS_ONLY)


def test_ordered_covers_everything():
    q = entry.queries()
    o = entry.oracle_sql()
    assert list(o) == [n for n in q if n in ORACLES]
    assert set(q) == set(QUERIES)


def test_readme_query_count_matches_registry():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README.md no longer states the registered-query count"
    assert int(m.group(1)) == len(QUERIES) == len(ORACLES) + len(ROWS_ONLY)


def _green_by_round():
    import glob
    import json

    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for k, v in json.load(open(path)).items():
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match")):
                green[k] = max(green.get(k, 0), rnd)
    return green


def test_driver_checked_prefix_completes_coverage():
    """The first 50 queries() entries must contain EVERY query that
    has never had an all-green row in any CORRECTNESS_r* file —
    brand-new queries always enter the checked prefix immediately.
    The remaining slots re-certify the oldest green rows."""
    never_green = {q for q in QUERIES if q not in _green_by_round()}
    first50 = set(list(entry.queries())[:50])
    assert never_green <= first50, (
        f"never-driver-certified queries outside the checked prefix: "
        f"{sorted(never_green - first50)}")


def test_touched_queries_recertified_in_prefix():
    """Standing rule (VERDICT r4 next-round #2): every query whose
    implementation or oracle changed this round is declared in
    _TOUCHED_THIS_ROUND and must sit inside the 50-slot driver
    prefix; the validator must reject a synthetic violation."""
    import pytest

    entry.validate_recertification(entry._TOUCHED_THIS_ROUND,
                                   entry._PRIORITY)
    for name in entry._TOUCHED_THIS_ROUND:
        assert name in QUERIES
    with pytest.raises(AssertionError, match="outside the 50-slot"):
        entry.validate_recertification(
            ["not_in_any_prefix"], entry._PRIORITY)


def test_prefix_recertifies_oldest_rows_first():
    """The non-touched prefix slots must be spent on stale
    certifications: no query certified green in the LATEST recorded
    round may occupy a slot while a strictly older-certified,
    non-touched query is left out (modulo the documented roll-over
    exemptions)."""
    green = _green_by_round()
    if not green:
        return
    latest = max(green.values())
    first50 = list(entry.queries())[:50]
    touched = set(entry._TOUCHED_THIS_ROUND)
    for q in first50:
        if q in touched or q not in green:
            continue
        assert green[q] < latest, (
            f"{q} was certified in the latest round r{latest} but "
            f"occupies a re-certification slot")
