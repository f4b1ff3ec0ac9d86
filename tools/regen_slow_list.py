#!/usr/bin/env python
"""Regenerate tests/slow_tests.txt from a pytest --durations=0 log.

Usage:
    python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/durations.log
    python tools/regen_slow_list.py /tmp/durations.log [threshold_seconds]

Aggregates call time per de-parametrized nodeid and lists every test whose
total exceeds the threshold (default 8 s).  The smoke profile is whatever
remains: `pytest -m "not slow"`.
"""

from __future__ import annotations

import collections
import re
import sys
from pathlib import Path

HEADER = """\
# Tests excluded from the smoke profile (`pytest -m "not slow"`).
# One de-parametrized nodeid per line; conftest.py applies the `slow`
# marker to every matching item (all parametrizations).  Regenerate after
# big suite changes with:
#   python -m pytest tests/ -q --durations=0 2>&1 | tee /tmp/durations.log
#   python tools/regen_slow_list.py /tmp/durations.log   # call-time > 8 s
"""


def main() -> None:
    log = Path(sys.argv[1])
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0
    totals: dict[str, float] = collections.defaultdict(float)
    for line in log.read_text().splitlines():
        m = re.match(r"^([\d.]+)s call\s+(\S+)", line.strip())
        if not m:
            continue
        base = re.sub(r"\[.*\]$", "", m.group(2))
        totals[base] += float(m.group(1))
    slow = sorted(k for k, v in totals.items() if v > threshold)
    out = Path(__file__).resolve().parent.parent / "tests" / "slow_tests.txt"
    out.write_text(HEADER + "".join(k + "\n" for k in slow))
    print(f"wrote {len(slow)} entries to {out}")


if __name__ == "__main__":
    main()
