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
from pudl_spark.plans.queries import ORACLES, QUERIES

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_priority_names_all_registered():
    missing = [n for n in entry._PRIORITY if n not in QUERIES]
    assert missing == []


def test_priority_has_no_duplicates():
    assert len(entry._PRIORITY) == len(set(entry._PRIORITY))


def test_queries_and_oracles_in_lockstep():
    assert set(QUERIES) == set(ORACLES)


def test_ordered_covers_everything():
    q = entry.queries()
    o = entry.oracle_sql()
    assert list(q) == list(o)
    assert set(q) == set(QUERIES)


def test_readme_query_count_matches_registry():
    text = open(os.path.join(REPO, "README.md")).read()
    m = re.search(r"(\d+) registered queries", text)
    assert m, "README.md no longer states the registered-query count"
    assert int(m.group(1)) == len(QUERIES) == len(ORACLES)


def test_driver_checked_prefix_completes_coverage():
    """Round-4 rotation (VERDICT r3 next-round #2): the first 50
    queries() entries must contain EVERY query that has never had an
    all-green row in CORRECTNESS_r01/r02/r03 — after this round's
    driver run, all registered queries have been certified in some
    round.  The remaining prefix slots re-certify round-1 rows."""
    import json

    green = set()
    for fn in ("CORRECTNESS_r01.json", "CORRECTNESS_r02.json",
               "CORRECTNESS_r03.json"):
        path = os.path.join(REPO, fn)
        if not os.path.exists(path):
            continue
        for k, v in json.load(open(path)).items():
            if (v.get("rows_match") and v.get("schema_match")
                    and v.get("hash_match")):
                green.add(k)
    never_green = {q for q in QUERIES if q not in green}
    first50 = set(list(entry.queries())[:50])
    assert never_green <= first50, (
        f"never-driver-certified queries outside the checked prefix: "
        f"{sorted(never_green - first50)}")
