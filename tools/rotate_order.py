#!/usr/bin/env python3
"""Regenerate __spark_entry__._COST_ORDER freshness-rotated.

Sorts the registry by the round of each query's most recent green
CORRECTNESS_r*.json row (oldest certification first; ties keep the
current order, which is cost-ascending within cohorts), so the
driver's 50-query-per-round window always re-certifies the stalest
cohort. Prints the wrapped list literal to stdout — paste it into
__spark_entry__.py (or run with --write to patch in place).
"""

from __future__ import annotations

import glob
import importlib.util
import json
import re
import sys
import textwrap
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def rotated_order() -> list[str]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        for q, v in json.load(open(f)).items():
            if v.get("hash_match") or v.get("rows_match"):
                last[q] = max(last.get(q, 0), rnd)
    sys.path.insert(0, str(_REPO))
    spec = importlib.util.spec_from_file_location(
        "se", _REPO / "__spark_entry__.py")
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    reg = se._COST_ORDER
    rank = {q: i for i, q in enumerate(reg)}
    # never-graded queries (new this round) sort first: last=0
    return sorted(reg, key=lambda q: (last.get(q, 0), rank[q]))


def main() -> None:
    order = rotated_order()
    body = ", ".join(f'"{q}"' for q in order)
    wrapped = textwrap.fill(body, width=72, initial_indent="    ",
                            subsequent_indent="    ")
    if "--write" in sys.argv:
        p = _REPO / "__spark_entry__.py"
        src = p.read_text()
        start = src.index("_COST_ORDER = [")
        end = src.index("]\n_RANK")
        p.write_text(src[:start] + "_COST_ORDER = [\n" + wrapped
                     + ",\n" + src[end:])
        print(f"patched {p} ({len(order)} entries)")
    else:
        print(wrapped)


if __name__ == "__main__":
    main()
