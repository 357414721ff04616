"""Standing rules for the query registry / correctness-ledger rotation.

The driver samples the HEAD of ``build_queries()``'s ordering each round
(~50 queries), so any query without a driver-green row in the committed
``CORRECTNESS_r*.json`` ledgers must sort inside the sampled window —
otherwise new code ships without ever being driver-checked (the round-6
process wound)."""

import glob
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVER_WINDOW = 50


def _driver_checked() -> set[str]:
    names: set[str] = set()
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        with open(p) as f:
            d = json.load(f)
        names.update(d.keys() if isinstance(d, dict)
                     else (r.get("name") for r in d))
    return names


def test_unchecked_queries_sort_inside_driver_window():
    from xclim_spark.queries import build_queries

    checked = _driver_checked()
    order = list(build_queries())
    head = set(order[:DRIVER_WINDOW])
    unchecked = [n for n in order if n not in checked]
    stragglers = [n for n in unchecked if n not in head]
    assert not stragglers, (
        f"queries with no driver row must sort in the first "
        f"{DRIVER_WINDOW}: rotate _PRIORITY in queries.py — {stragglers}")


def test_every_query_has_matching_oracle_or_is_rows_only():
    from xclim_spark.queries import build_oracles, build_queries

    q = set(build_queries())
    o = set(build_oracles())
    # oracles must not name queries that don't exist
    assert o <= q, f"oracles without queries: {sorted(o - q)}"
