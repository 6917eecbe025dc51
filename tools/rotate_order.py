#!/usr/bin/env python3
"""Regenerate __spark_entry__._COST_ORDER freshness-rotated.

Ranking (round-9 rule — verdict ask: a rewrite must re-certify
before plain staleness):

1. never-graded queries (no green CORRECTNESS row yet)
2. queries whose DEFINING FUNCTION was committed AFTER their most
   recent green cert was recorded ("code-modified-since-last-cert"),
   oldest cert first — a green row for pre-rewrite code is not a
   cert for the current code
3. everything else by oldest cert round first

Ties keep the current order (cost-ascending within cohorts). The
function-modification time comes from `git log -1 -L start,end:file`
over the function's current source span, compared against the commit
time of that round's CORRECTNESS_r*.json. Helper-only rewrites
(shared code in hier.py etc. changing under an untouched caller) are
not detected — flag those by hand when sweeping helpers.

Prints the wrapped list literal to stdout (default) or patches
__spark_entry__.py in place with --write; --explain prints the
per-query ranking evidence instead.
"""

from __future__ import annotations

import glob
import importlib.util
import inspect
import json
import re
import subprocess
import sys
import textwrap
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent


def _git_ct(args: list[str]) -> int:
    out = subprocess.run(["git", "-C", str(_REPO), "log", "-1",
                          "--format=%ct"] + args,
                         capture_output=True, text=True)
    for line in out.stdout.splitlines():
        if line.strip().isdigit():
            return int(line.strip())
    return 0


def _load_entry():
    sys.path.insert(0, str(_REPO))
    spec = importlib.util.spec_from_file_location(
        "se", _REPO / "__spark_entry__.py")
    se = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(se)
    return se


def ranking() -> list[tuple[tuple, str]]:
    last: dict[str, int] = {}
    cert_time: dict[int, int] = {}
    for f in sorted(glob.glob(str(_REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", Path(f).name).group(1))
        # the driver writes CORRECTNESS_rN.json mid-round but only
        # commits it at round end — an untracked file has no git
        # commit time (r10 verdict ask #2: the whole just-certified
        # window showed MODIFIED-since-cert). Fall back to the file
        # mtime so fresh driver certs count as cert evidence.
        t = _git_ct(["--", Path(f).name])
        cert_time[rnd] = t if t else int(Path(f).stat().st_mtime)
        for q, v in json.load(open(f)).items():
            if v.get("hash_match") or v.get("rows_match"):
                last[q] = max(last.get(q, 0), rnd)

    se = _load_entry()
    raw = se._collect("QUERIES")           # unwrapped functions
    reg = se._COST_ORDER
    rank = {q: i for i, q in enumerate(reg)}

    rows: list[tuple[tuple, str]] = []
    # iterate the LIVE registry, not the stale _COST_ORDER — a query
    # added since the last regeneration is exactly the never-graded
    # case that must rank first
    for q in list(raw):
        cert_rnd = last.get(q, 0)
        fn = raw.get(q)
        mtime = 0
        if fn is not None:
            fn = inspect.unwrap(fn)
            try:
                src = Path(inspect.getsourcefile(fn)).relative_to(_REPO)
                lines, start = inspect.getsourcelines(fn)
                mtime = _git_ct(
                    [f"-L{start},{start + len(lines) - 1}:{src}"])
            except (TypeError, ValueError, OSError):
                pass
        stale = cert_rnd == 0 or mtime > cert_time.get(cert_rnd, 0)
        # key: never-graded first, then modified-since-cert, then by
        # cert age; ties keep registry (cost) order
        rows.append(((0 if cert_rnd == 0 else (1 if stale else 2),
                      cert_rnd, rank.get(q, len(reg))), q))
    rows.sort()
    return rows


def main() -> None:
    rows = ranking()
    if "--explain" in sys.argv:
        for (tier, rnd, _), q in rows:
            label = {0: "never-graded", 1: "MODIFIED-since-cert",
                     2: "cert-current"}[tier]
            print(f"r{rnd:<2} {label:<20} {q}")
        return
    order = [q for _, q in rows]
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
