#!/usr/bin/env python
"""Dump .explain("formatted") for the given keys to a directory.

Usage: python scripts/dump_plan.py key[,key...] out_dir [suffix] [sf_dir]

Writes ``out_dir/<key>_<suffix>.txt`` (suffix defaults to "after").
Run it from a git worktree of an older commit to produce the
``_before`` dumps the optimization evidence pairs with.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from task_mapreduce_spark.session import get_spark  # noqa: E402
from task_mapreduce_spark.registry import QUERIES  # noqa: E402


def main() -> int:
    keys = sys.argv[1].split(",")
    out_dir = sys.argv[2]
    suffix = sys.argv[3] if len(sys.argv) > 3 else "after"
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("tmrs-dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    for key in keys:
        df = QUERIES[key](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{key}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
