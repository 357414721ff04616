"""The examples/ scripts ARE the published deployment recipes — run
each one end-to-end in the gate harness so a refactor that breaks the
documented pipeline (rather than an individual operator) fails CI.

Each example owns its SparkSession (and calls ``spark.stop()``), so
they run as subprocesses rather than inside the shared session
fixture.  The LLM pipeline runs at sf0.001 to keep the suite fast; the
funnel assertions check stage WIRING (monotone counts, every stage
prints), not tuned-threshold outcomes.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

import pytest

# examples run whole SparkSessions in subprocesses — minutes of wall
# clock that belongs in the opt-in profile, not the driver's budget
pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXAMPLES = os.path.join(REPO, "examples")
SF_SMALL = "/root/testdata/sf0.001"


def _run(script: str, *args: str) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(EXAMPLES, script), *args],
        capture_output=True, text=True, timeout=900,
        env={**os.environ, "SPARK_GRAFT_CPUS": "8"},
    )
    assert proc.returncode == 0, (
        f"{script} failed\n--- stdout ---\n{proc.stdout[-4000:]}"
        f"\n--- stderr ---\n{proc.stderr[-4000:]}")
    return proc.stdout


@pytest.mark.skipif(not os.path.isdir(SF_SMALL),
                    reason="driver testdata not present")
def test_llm_pipeline_example_end_to_end():
    out = _run("llm_pipeline.py", SF_SMALL)
    counts = {m.group(1).strip(): int(m.group(2))
              for m in re.finditer(r"^(documents|after [\w ]+?|docs "
                                   r"with PII hits|packed contexts)"
                                   r"\s*:\s*(\d+)$", out, re.M)}
    # every funnel stage printed (a silently-skipped stage is a bug
    # even when its count equals the previous stage's)
    for stage in ("documents", "after bloom screen", "after dedup",
                  "after decontam", "after quality filter",
                  "after ppl filter", "after quality clf",
                  "after substr dedup", "after mixture",
                  "packed contexts"):
        assert stage in counts, f"missing stage {stage!r}:\n{out}"
    # the curation funnel only ever removes documents
    funnel = [counts["documents"], counts["after bloom screen"],
              counts["after dedup"], counts["after decontam"],
              counts["after quality filter"], counts["after ppl filter"],
              counts["after quality clf"], counts["after substr dedup"],
              counts["after mixture"]]
    assert funnel == sorted(funnel, reverse=True), funnel
    assert counts["documents"] > 0
    assert re.search(r"exact BPE tokens\s*:\s*\d+ \(\d+ merges\)", out)


def test_quickstart_example_end_to_end(tmp_path):
    out = _run("quickstart.py", str(tmp_path))
    m = re.search(r"ingested rows:\s*(\d+)", out)
    assert m and int(m.group(1)) == 2 * 365 * 4
    m = re.search(r"2002 rows after partition pruning:\s*(\d+)", out)
    assert m and int(m.group(1)) == 365 * 4


@pytest.mark.skipif(not os.path.isdir(SF_SMALL),
                    reason="driver testdata not present")
def test_streaming_pipeline_example_end_to_end():
    out = _run("streaming_pipeline.py", SF_SMALL)
    m = re.search(r"monthly fire-weather rows\s*:\s*(\d+)", out)
    assert m and int(m.group(1)) > 0, out
    m = re.search(r"first-sighting keys\s*:\s*(\d+)", out)
    assert m and int(m.group(1)) > 0, out
