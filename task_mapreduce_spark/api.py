"""MapReduce compatibility API — the migration path for users of the
reference (a MapReduce task runner): bring your ``map(k1, v1) →
[(k2, v2)]`` and ``reduce(k2, [v2]) → [v3]`` functions unchanged, get a
DataFrame-backed distributed execution.

Mapping onto Spark (Dean & Ghemawat §3.1 → Catalyst):

| MR phase | here |
| --- | --- |
| input splits | the input DataFrame's partitions |
| map | ``mapInPandas`` — user fn is row-at-a-time BY CONTRACT, but rows cross the JVM↔Python boundary in Arrow batches, not one by one |
| combine | optional per-partition pre-reduce (``mapInPandas`` grouping within each batch) — the map-side combiner |
| shuffle/sort | ``groupBy(k)`` hash shuffle; values sorted per key for deterministic reduces (MR sorts keys; we sort values too so reduce output is reproducible) |
| reduce | ``applyInPandas`` per key group |
| output files | the returned DataFrame (write it wherever) |

Keys and values are strings, as in the paper's model; parse/format in
your functions.  All user functions must be picklable (defined at the
caller's module top level or as closures).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], Iterable[str]]

_KV_SCHEMA = "k STRING, v STRING"


def map_reduce(
    records: DataFrame,
    mapper: MapFn,
    reducer: ReduceFn | None,
    combiner: ReduceFn | None = None,
    key_col: str = "k",
    value_col: str = "v",
) -> DataFrame:
    """Run a classic MapReduce job over ``records`` (a 2-column
    DataFrame of (key, value) strings; use ``select`` to adapt).

    Returns a DataFrame of (k, v) reduce outputs.  The combiner, when
    given, must be associative+commutative over its value lists (the
    MR contract); it runs map-side so the shuffle carries one value per
    (Arrow batch, key) instead of every mapped pair — batches default
    to 10k rows, so that's still ~a 10^4 shuffle reduction on hot keys.

    ``reducer=None`` declares a MAP-ONLY job (Hadoop's
    ``numReduceTasks=0``): mapper output is the job output, with no
    shuffle, no per-key grouping, no sort — the right contract for
    grep/filter/transform jobs, where forcing every record through a
    single-row reduce group costs a full exchange for an identity.
    """
    if reducer is None and combiner is not None:
        # deliberately STRICTER than Hadoop, which silently ignores the
        # combiner when numReduceTasks=0: running it map-side would
        # emit per-batch partials whose multiset depends on partition
        # layout, and a caller passing one almost certainly expected a
        # reduce phase — surface the mistake instead of dropping it
        raise ValueError("a map-only job (reducer=None) cannot take a combiner")
    kv = records.select(key_col, value_col)

    def run_map(batches):
        for pdf in batches:
            out_k, out_v = [], []
            for k1, v1 in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                for k2, v2 in mapper(k1, v1):
                    out_k.append(k2)
                    out_v.append(v2)
            yield pd.DataFrame({"k": out_k, "v": out_v})

    mapped = kv.mapInPandas(run_map, _KV_SCHEMA)

    if combiner is not None:

        def run_combine(batches):
            for pdf in batches:
                out_k, out_v = [], []
                # dropna=False: pandas drops null group keys by default,
                # which would make combiner-on lose null-keyed pairs that
                # combiner-off keeps — a combiner must be a pure
                # optimization, never a semantics change
                for k2, vals in pdf.groupby("k", sort=True, dropna=False)["v"]:
                    for v in combiner(k2, sorted(vals.tolist())):
                        out_k.append(k2)
                        out_v.append(v)
                yield pd.DataFrame({"k": out_k, "v": out_v})

        mapped = mapped.mapInPandas(run_combine, _KV_SCHEMA)

    if reducer is None:  # map-only job: no shuffle, mapper output IS the output
        return mapped

    def run_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
        k2 = pdf["k"].iloc[0]
        out = list(reducer(k2, sorted(pdf["v"].tolist())))
        return pd.DataFrame({"k": [k2] * len(out), "v": out})

    return mapped.groupBy("k").applyInPandas(run_reduce, _KV_SCHEMA)
