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


def _green_by_round(max_round: int | None = None):
    """Latest all-green driver round per query, considering only
    CORRECTNESS files from rounds <= max_round. The ordering tests
    pass entry._BUILT_AGAINST_ROUND: the prefix was ordered against
    THAT state, and the current round's own CORRECTNESS file —
    generated FROM the prefix and landing post-commit — must not
    retroactively invalidate the ordering it was produced by
    (VERDICT r5 "What's wrong" #1: the previous formulation failed
    the moment a successful round's file appeared)."""
    import glob
    import json

    green: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        if max_round is not None and rnd > max_round:
            continue
        for k, v in json.load(open(path)).items():
            # Rows-only queries (no SQL oracle by documented
            # contract) can never be hash-green; a recorded row with
            # a non-null row count IS their strongest driver check —
            # but only when the run recorded no REAL error alongside
            # it ('no_oracle' is the expected marker, ADVICE r6).
            ok = (v.get("rows_match") and v.get("schema_match")
                  and v.get("hash_match")) or (
                      k in ROWS_ONLY
                      and v.get("spark_rows") is not None
                      and v.get("err") in (None, "no_oracle"))
            if ok:
                green[k] = max(green.get(k, 0), rnd)
    return green


def test_built_against_round_is_current():
    """The pinned baseline round must be the latest round recorded at
    prefix-build time: no recorded file may be MORE than one round
    ahead of it (the one-ahead allowance is exactly the current
    round's own post-commit artifact)."""
    import glob

    rounds = [int(re.search(r"_r(\d+)", p).group(1))
              for p in glob.glob(os.path.join(REPO,
                                              "CORRECTNESS_r*.json"))]
    assert rounds, "no CORRECTNESS files recorded"
    assert entry._BUILT_AGAINST_ROUND <= max(rounds)
    assert entry._BUILT_AGAINST_ROUND >= max(rounds) - 1, (
        "prefix was built against a stale certification baseline: "
        "bump _BUILT_AGAINST_ROUND when rebuilding the round prefix")


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


def _assert_oldest_first(green: dict[str, int], first50: list[str],
                         touched: set[str]) -> None:
    latest = max(green.values())
    for q in first50:
        if q in touched or q not in green:
            continue
        assert green[q] < latest, (
            f"{q} was certified in the baseline round r{latest} but "
            f"occupies a re-certification slot")


def test_prefix_recertifies_oldest_rows_first():
    """The non-touched prefix slots must be spent on stale
    certifications: no query already certified green in the round
    the prefix was BUILT against may occupy a re-certification slot
    while a strictly older-certified, non-touched query is left out.
    Evaluated against the _BUILT_AGAINST_ROUND baseline so the
    invariant is round-stable: the current round's own CORRECTNESS
    file (which re-certifies exactly these slots) cannot flip it red
    (VERDICT r5 next-round #1)."""
    green = _green_by_round(entry._BUILT_AGAINST_ROUND)
    if not green:
        return
    _assert_oldest_first(green, list(entry.queries())[:50],
                         set(entry._TOUCHED_THIS_ROUND))


def test_prefix_ordering_check_rejects_misordering():
    """The invariant still has teeth: a synthetic prefix that spends
    a re-cert slot on a query already green in the baseline round
    must be rejected."""
    import pytest

    green = {"fresh_q": 5, "stale_q": 2}
    with pytest.raises(AssertionError, match="fresh_q"):
        _assert_oldest_first(green, ["fresh_q"], touched=set())
    # ...and the compliant shapes pass: touched queries and
    # stale-certified queries may occupy prefix slots.
    _assert_oldest_first(green, ["fresh_q", "stale_q"],
                         touched={"fresh_q"})


def test_bench_tail_line_fits_driver_window():
    """The bench self-heal line (VERDICT r14 #8) only helps if it
    fits the driver's 2000-byte stdout tail window WHOLE. Rebuild it
    from the committed anchor's real query names/times — the worst
    case the repo knows — and pin the budget with headroom for suite
    growth (~15 more queries at current naming length)."""
    import json
    import os

    anchor = os.path.join(REPO, "BENCH_LATEST_FULL.json")
    with open(anchor) as f:
        d = json.load(f)
    times = d["queries"]
    slowest = dict(sorted(times.items(), key=lambda kv: -kv[1])[:20])
    line = json.dumps(
        {"metric": "headline_suite_wall", "value": d["value"],
         "unit": "sec", "sf": d["sf"], "n_queries": len(times),
         "queries": {k: round(v, 2) for k, v in slowest.items()},
         "t": [round(v, 2) for v in times.values()]},
        separators=(",", ":"))
    assert len(line.encode()) < 1700, len(line.encode())
