#!/usr/bin/env python
"""Run the full oracle-parity check at a given sf dir (default sf0.01,
the driver's correctness scale). Prints one line per key."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from task_mapreduce_spark.session import get_spark
from task_mapreduce_spark.parity import check_key, duck_con
from task_mapreduce_spark.registry import ORACLES, QUERIES


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    if only:
        unknown = sorted(set(only) - set(QUERIES))
        if unknown:
            print(f"unknown keys: {', '.join(unknown)}", file=sys.stderr)
            return 2
    spark = get_spark("tmrs-parity")
    con = duck_con(sf_dir)
    failed = []
    for key in sorted(QUERIES):
        if only and key not in only:
            continue
        t0 = time.time()
        try:
            errs = check_key(spark, con, key, sf_dir)
        except Exception as exc:  # noqa: BLE001
            errs = [f"{key}: EXCEPTION {type(exc).__name__}: {exc}"]
        dt = time.time() - t0
        mode = "oracle" if key in ORACLES else "rows-only"
        status = "OK" if not errs else "FAIL"
        print(f"{status:4s} {key:28s} [{mode}] {dt:6.2f}s")
        for e in errs:
            print(f"     {e}")
        if errs:
            failed.append(key)
    n_ran = len([k for k in QUERIES if not only or k in only])
    print(f"\n{n_ran - len(failed)}/{n_ran} keys pass at {sf_dir}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
