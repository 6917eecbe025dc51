#!/usr/bin/env python3
"""Merge `ok   12.34s name` lines from one or more gate_check logs
into tools/gate_times.json under the given SF key.

Filtered gate runs (gate_check with name arguments) deliberately do
NOT persist their timings — a partial run would otherwise shrink the
LPT order's coverage. Big-SF certification happens in chunks for
memory reasons, so this tool stitches those chunked logs back into
one per-SF timing record once the union covers the intended set.

Usage: python tools/merge_gate_times.py sf10 /tmp/sf10_gate5.log ...
"""

from __future__ import annotations

import json
import re
import sys
from pathlib import Path

_LINE = re.compile(r"^ok\s+([0-9.]+)s\s+(\S+)", re.M)


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sf_key, logs = sys.argv[1], sys.argv[2:]
    path = Path(__file__).resolve().parent / "gate_times.json"
    all_times = json.loads(path.read_text()) if path.exists() else {}
    cur = dict(all_times.get(sf_key) or {})
    n = 0
    for lg in logs:
        for dt, name in _LINE.findall(Path(lg).read_text(
                errors="replace")):
            # later logs win: a re-run supersedes a crashed attempt
            cur[name] = float(dt)
            n += 1
    all_times[sf_key] = cur
    path.write_text(json.dumps(all_times, indent=0, sort_keys=True))
    print(f"{sf_key}: merged {n} lines -> {len(cur)} recorded")


if __name__ == "__main__":
    main()
