#!/usr/bin/env python3
"""Measure the SPARK_GRAFT_HASH_GRAMS lever: wall time AND total
shuffle bytes written for an op, string-key vs xxhash64-key, each in
a fresh JVM with an event log (the only robust shuffle-bytes source
with the UI off). Usage:

  python tools/gram_hash_probe.py <sf_dir> <op> [<op> ...]

Prints one JSON line per op:
  {"op": ..., "sf_dir": ..., "string": {"sec": s, "shuffle_mb": m},
   "hashed": {...}, "bytes_ratio": r}
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def _child(sf_dir: str, op: str, evdir: str) -> None:
    from pyspark.sql import SparkSession
    import postgres_scanner_spark as pss
    # mirror get_spark()'s tuning but add the event log
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    builder = SparkSession.builder.master(
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    for k, v in (("spark.sql.session.timeZone", "UTC"),
                 ("spark.sql.shuffle.partitions", "32"),
                 ("spark.sql.adaptive.enabled", "true"),
                 ("spark.driver.memory",
                  os.environ["SPARK_GRAFT_DRIVER_MEM"]),
                 ("spark.ui.enabled", "false"),
                 ("spark.eventLog.enabled", "true"),
                 ("spark.eventLog.compress", "false"),
                 ("spark.eventLog.rolling.enabled", "false"),
                 ("spark.eventLog.dir", evdir)):
        builder = builder.config(k, v)
    spark = builder.appName("gram_hash_probe").getOrCreate()
    import __spark_entry__ as entry
    fn = entry.queries()[op]
    t0 = time.time()
    n = fn(spark, sf_dir).count()
    wall = time.time() - t0
    spark.stop()
    total = 0
    files = [p for p in Path(evdir).rglob("*")
             if p.is_file() and "appstatus" not in p.name]
    for p in files:
        # rolling logs may be zstd-compressed (.zstd suffix) or carry
        # binary appstatus blobs — decode defensively
        try:
            text = p.read_text()
        except UnicodeDecodeError:
            continue
        for line in text.splitlines():
            if '"SparkListenerTaskEnd"' not in line:
                continue
            ev = json.loads(line)
            m = (ev.get("Task Metrics") or {}).get(
                "Shuffle Write Metrics") or {}
            total += int(m.get("Shuffle Bytes Written", 0))
    print(json.dumps({"sec": round(wall, 2), "rows": n,
                      "shuffle_mb": round(total / 1e6, 1)}))


def main() -> None:
    if sys.argv[1] == "--child":
        _child(sys.argv[2], sys.argv[3], sys.argv[4])
        return
    sf_dir = sys.argv[1]
    for op in sys.argv[2:]:
        out = {}
        for label, flag in (("string", "0"), ("hashed", "1")):
            with tempfile.TemporaryDirectory() as evdir:
                env = dict(os.environ, SPARK_GRAFT_HASH_GRAMS=flag)
                r = subprocess.run(
                    [sys.executable, __file__, "--child", sf_dir, op,
                     evdir],
                    capture_output=True, text=True, env=env)
                last = [ln for ln in r.stdout.splitlines()
                        if ln.startswith("{")]
                if not last:
                    sys.stderr.write(r.stderr[-2000:])
                    raise SystemExit(f"child failed for {op} {label}")
                out[label] = json.loads(last[-1])
        assert out["string"]["rows"] == out["hashed"]["rows"], out
        out["op"], out["sf_dir"] = op, sf_dir
        out["bytes_ratio"] = round(
            out["hashed"]["shuffle_mb"]
            / max(out["string"]["shuffle_mb"], 1e-9), 3)
        print(json.dumps(out))


if __name__ == "__main__":
    main()
