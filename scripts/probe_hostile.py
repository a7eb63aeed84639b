"""Hostile-harness probes (the verify skill's checklist, automated).

1. TAINTED SESSION TIMEZONE: the driver may hand us a SparkSession
   whose ``spark.sql.session.timeZone`` is already set to something
   non-UTC.  ``tune()`` must override it, or every timestamp-touching
   key silently shifts.  The probe pre-sets America/New_York and
   re-runs the timestamp keys against their DuckDB oracles.
2. BOGUS sf_dir: a missing path must surface as Spark's clean
   PATH_NOT_FOUND AnalysisException, not a hang or a wrong-answer.

Run: ``python scripts/probe_hostile.py`` (exit 0 = all probes pass).
"""

from __future__ import annotations

import importlib.util
import os
import sys

def _norm(v, collapse_midnight: bool = False) -> str:
    """Canonicalize a collected value before comparison, so engine-side
    rendering differences (Decimal vs float repr, naive vs tz-aware
    timestamp repr) cannot produce a false MISMATCH for keys added
    later.  Mirrors what the repo's oracle contract already guarantees
    semantically: values equal at 9-decimal scale ARE equal.

    ``collapse_midnight`` renders a midnight timestamp as its bare
    date.  It is set PER COLUMN, and only when the two engines disagree
    on the column's Python type (one side date, the other datetime —
    the DuckDB-1.0 date_trunc drift) — an unconditional collapse would
    also mask a genuine bug where one engine wrongly truncates a real
    time-of-day to midnight while the other returns the DATE of the
    same day."""
    import datetime
    import decimal

    if isinstance(v, datetime.datetime):
        v = v.replace(tzinfo=None)
        if collapse_midnight and v.time() == datetime.time(0, 0):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (float, decimal.Decimal)):
        s = f"{v:.9f}".rstrip("0").rstrip(".")
        if s in ("-0", ""):
            s = "0"
        # keep fractional types visibly fractional ("5.0", not "5"):
        # an engine returning BIGINT where the other returns DOUBLE is
        # a real mismatch (the CLAUDE.md cast-to-BIGINT rule) that a
        # fully integer-collapsed rendering would silently absorb
        return s if "." in s else s + ".0"
    return str(v)


def _collapse_flags(s_rows, o_rows, ncols) -> list[bool]:
    """Per-column midnight-collapse decision: True only where the two
    engines disagree on the value type (exactly one side returns bare
    ``date`` objects while the other returns ``datetime``)."""
    import datetime

    def tset(rows, j):
        return {type(x) for x in (r[j] for r in rows) if x is not None}

    flags = []
    for j in range(ncols):
        ts_, to_ = tset(s_rows, j), tset(o_rows, j)
        # exact-class check: datetime.datetime subclasses datetime.date,
        # so isinstance would not distinguish them
        flags.append(
            (datetime.date in ts_ and datetime.datetime in to_)
            or (datetime.datetime in ts_ and datetime.date in to_)
        )
    return flags


TS_KEYS = [
    "tpch_q1",
    "project_rename_cast",
    "stream_tumbling",
    "rollup_hypertable",
    "sessionize_events",
    "fn_date",
    # both derive ordering from unix_micros(cast(ts_ntz as timestamp)),
    # which is session-tz-dependent (DST-gap wall clocks can collapse
    # and reorder seq) — exactly what this probe exists to exercise
    "events_pattern_match",
    "sessions_concurrency",
    # bucket index = unix_micros(cast(ts_ntz as timestamp)) div 1h —
    # a non-UTC session shifts every bucket boundary (round 7)
    "events_resample_gapfill",
    # carried-touch order + latency both ride unix_micros(cast(ntz))
    # (round 10)
    "events_attribution",
]

# keys sensitive to the OTHER runtime-settable semantics a hostile
# session could flip (both tainted in the builder below; tune() must
# pin them back): ANSI arithmetic/casts, legacy size(NULL) = -1
SEMANTICS_KEYS = [
    "dedup_near_minhash",  # size()-based integer Jaccard + clamps
    "fn_array",            # size/slice/element_at surface
    "agg_count_sum_avg",   # long arithmetic the ANSI rules govern
    "dedup_span_exact",    # size()-gated windows + position arithmetic
    "select_dsir",         # size() filter + ANSI long bucket arithmetic
]

SF = os.environ.get("SPARK_GRAFT_PROBE_SF", "/root/testdata/sf0.01")


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")  # taint
        .config("spark.sql.ansi.enabled", "false")                 # taint
        .config("spark.sql.legacy.sizeOfNull", "true")             # taint
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "entry_probe", os.path.join(repo, "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    import duckdb

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'"
        )

    queries, oracles = mod.queries(), mod.oracle_sql()
    fails = []
    for key in TS_KEYS + SEMANTICS_KEYS:
        sdf = queries[key](spark, SF)
        scols = sorted(sdf.columns)
        s_raw = [tuple(r[c] for c in scols) for r in sdf.collect()]
        cur = con.execute(oracles[key])
        ocols_raw = [d[0] for d in cur.description]
        order = sorted(range(len(ocols_raw)), key=lambda i: ocols_raw[i])
        o_raw = [tuple(row[i] for i in order) for row in cur.fetchall()]
        flags = (
            _collapse_flags(s_raw, o_raw, len(scols))
            if len(ocols_raw) == len(scols)
            else [False] * len(scols)
        )
        srows = sorted(
            tuple(_norm(v, flags[j]) for j, v in enumerate(r)) for r in s_raw
        )
        orows = sorted(
            tuple(_norm(v, flags[j]) for j, v in enumerate(r)) for r in o_raw
        )
        ok = srows == orows and scols == sorted(ocols_raw)
        print(f"tz-probe {key}: {'ok' if ok else 'MISMATCH'} rows={len(srows)}")
        if not ok:
            fails.append(key)

    # bogus sf_dir: expect a clean analysis-time path error
    try:
        queries["tpch_q1"](spark, "/root/testdata/sf_nonexistent").collect()
        print("bogus-dir probe: NO ERROR (bad)")
        fails.append("bogus_dir")
    except Exception as exc:  # noqa: BLE001 — the class name is the assertion
        name = type(exc).__name__
        ok = "AnalysisException" in name or "PATH_NOT_FOUND" in str(exc)
        print(f"bogus-dir probe: {'ok' if ok else 'UNEXPECTED'} ({name})")
        if not ok:
            fails.append("bogus_dir")

    print("PROBE FAILS:", ", ".join(fails) if fails else "none")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
