"""Generate the repo's headline counters instead of hand-typing them
(verdict r3 task #8 and verdict r4 #5: hand-edited counts drifted two
rounds in a row — automate it).

Usage:
    python tools/gen_counts.py          # rewrite the marked block in ROADMAP.md
    python tools/gen_counts.py --check  # exit 1 if any documented count is stale

Counts produced:
- registry: total queries, oracle-backed, driver-checked head size
  (imported from x_spark.plans.registry — the single source of truth)
- tests: collected count from ``pytest --collect-only -q`` (the same
  collector the suite runs under)

ROADMAP.md carries the counters inside a ``<!-- counts:begin -->`` /
``<!-- counts:end -->`` marker block; everything between the markers is
owned by this script. BASELINE.md sections are frozen measurement
artifacts and are only CHECKED (the §21/§22 per-query tables must sum
to the registry size recorded for that round), never rewritten.
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def registry_counts() -> dict:
    sys.path.insert(0, str(REPO))
    from x_spark.plans.registry import DRIVER_CHECKED_PREFIX, ORACLES, QUERIES

    head = list(QUERIES)[:DRIVER_CHECKED_PREFIX]
    return {
        "queries": len(QUERIES),
        "oracle_backed": len(ORACLES),
        "head": len(head),
        "head_all_hash_checkable": all(n in ORACLES for n in head),
    }


def test_count() -> int:
    out = subprocess.run(
        [sys.executable, "-m", "pytest", "--collect-only", "-q", "tests/"],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    m = re.search(r"(\d+) tests collected", out.stdout)
    if not m:
        m = re.search(r"(\d+)/(\d+) tests collected", out.stdout)
        if m:
            return int(m.group(2))
        raise RuntimeError(f"could not parse collect-only output:\n{out.stdout[-500:]}")
    return int(m.group(1))


def render(counts: dict, n_tests: int) -> str:
    hashable = (
        "all head slots hash-checkable"
        if counts["head_all_hash_checkable"]
        else "HEAD CONTAINS ROWS-ONLY SLOTS"
    )
    return (
        f"{counts['queries']} registry queries "
        f"({counts['oracle_backed']} oracle-backed, {counts['head']} "
        f"driver-checked head, {hashable}), {n_tests} collected tests"
    )


def main() -> int:
    check = "--check" in sys.argv
    counts = registry_counts()
    n_tests = test_count()
    line = render(counts, n_tests)

    roadmap = REPO / "ROADMAP.md"
    text = roadmap.read_text()
    block = re.compile(
        r"(<!-- counts:begin \(tools/gen_counts\.py\) -->\n).*?(\n<!-- counts:end -->)",
        re.S,
    )
    if not block.search(text):
        print("ROADMAP.md is missing the counts marker block", file=sys.stderr)
        return 1
    new_text = block.sub(lambda m: m.group(1) + line + m.group(2), text)
    if check:
        if new_text != text:
            current = block.search(text).group(0)
            print(f"STALE counters in ROADMAP.md:\n  have: {current}\n  want: {line}")
            return 1
        print(f"counters current: {line}")
        return 0
    roadmap.write_text(new_text)
    print(f"ROADMAP.md counters refreshed: {line}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
