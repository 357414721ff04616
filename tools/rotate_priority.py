"""Regenerate queries.py's ``_PRIORITY`` from the correctness ledgers.

The driver samples the HEAD (~50) of ``build_queries()`` each round, and
the standing meta-tests (tests/test_queries_meta.py) require:

* queries with NO driver-green row sort first (new gates get checked
  the round they ship);
* queries whose newest green row is oldest fill the remaining head
  slots (everything re-earns a recent green row before it goes
  ``STALE_AGE`` rounds stale).

This tool rewrites the ``_PRIORITY`` block in place with exactly that
ordering — run it at the START of a round, after the driver's new
``CORRECTNESS_r*.json`` lands, instead of hand-editing the list:

    python tools/rotate_priority.py          # rewrite
    python tools/rotate_priority.py --check  # exit 1 if a rewrite
                                             # would change anything
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
QUERIES_PY = os.path.join(REPO, "xclim_spark", "queries.py")


def _latest_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(p)[len("CORRECTNESS_r"):-len(".json")])
        with open(p) as f:
            d = json.load(f)
        names = d.keys() if isinstance(d, dict) \
            else (r.get("name") for r in d)
        for n in names:
            latest[n] = max(latest.get(n, 0), rnd)
    return latest


def _fmt(names: list[str]) -> str:
    out, line = [], "   "
    for n in names:
        tok = f' "{n}",'
        if len(line) + len(tok) > 78:
            out.append(line)
            line = "   "
        line += tok
    if line.strip():
        out.append(line)
    return "\n".join(out)


def build_block() -> str:
    from xclim_spark.queries import _PRIORITY, QUERIES

    latest = _latest_rounds()
    pos = {n: i for i, n in enumerate(_PRIORITY)}
    order = sorted(QUERIES, key=lambda n: (latest.get(n, 0),
                                           pos.get(n, 9999), n))
    groups = []
    new = [n for n in order if latest.get(n, 0) == 0]
    if new:
        groups.append((
            "    # -- additions with no driver row yet (the ordering "
            "rule\n    #    requires these inside the sampled head) --",
            new))
    for r in sorted({latest[n] for n in order if n in latest}):
        names = [n for n in order if latest.get(n) == r]
        groups.append((f"    # -- newest driver-green row: round {r} --",
                       names))
    body = "\n".join(c + "\n" + _fmt(ns) for c, ns in groups)
    return (
        "# The driver's correctness harness evaluates queries in dict "
        "order and\n"
        "# records the first ~50 per round.\n"
        "# Ordering rule (standing, tested in tests/test_queries_meta.py"
        "): queries\n"
        "# with no driver row yet sort FIRST (the driver samples the "
        "head of this\n"
        "# list each round), then queries whose last driver-green row "
        "is oldest.\n"
        "# Regenerate each round with tools/rotate_priority.py — do "
        "not hand-edit.\n"
        "_PRIORITY = [\n" + body + "\n]\n")


PAT = re.compile(
    r"# The driver's correctness harness.*?\n_PRIORITY = \[\n.*?\n\]\n",
    re.S)


def main(argv) -> int:
    src = open(QUERIES_PY).read()
    m = PAT.search(src)
    if not m:
        print("ERROR: _PRIORITY block not found", file=sys.stderr)
        return 2
    block = build_block()
    if "--check" in argv:
        if m.group(0) == block:
            print("rotation up to date")
            return 0
        print("rotation STALE: run python tools/rotate_priority.py")
        return 1
    if m.group(0) == block:
        print("rotation already up to date")
        return 0
    open(QUERIES_PY, "w").write(PAT.sub(lambda _: block, src, count=1))
    print("rewrote _PRIORITY "
          f"({len(build_block().splitlines())} lines)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
