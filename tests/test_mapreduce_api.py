"""Contract tests for the MapReduce compatibility API: a combiner must
be a pure optimization — identical output with and without it — and
job output must be deterministic."""

from __future__ import annotations

from task_mapreduce_spark.api import map_reduce


def _result_set(df):
    return sorted(
        ((r["k"], r["v"]) for r in df.collect()),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def test_combiner_is_pure_optimization_including_null_keys(spark):
    records = spark.createDataFrame(
        [("r1", "a b"), ("r2", "b"), ("r3", "")],
        "k STRING, v STRING",
    )

    def mapper(_k, text):
        for tok in text.split(" "):
            # empty token maps to a NULL key — the regression case:
            # pandas groupby drops null keys unless dropna=False
            yield (tok or None), "1"

    def summer(_k, values):
        yield str(sum(int(v) for v in values))

    plain = _result_set(map_reduce(records, mapper, summer))
    combined = _result_set(map_reduce(records, mapper, summer, combiner=summer))
    assert plain == combined
    assert (None, "1") in plain  # the null-keyed pair survives both paths


def test_output_deterministic_across_runs(spark):
    records = spark.createDataFrame(
        [(str(i), f"w{i % 3} w{i % 5}") for i in range(100)],
        "k STRING, v STRING",
    )

    def mapper(_k, text):
        for tok in text.split(" "):
            yield tok, _k

    def join_sorted(_k, values):
        yield ",".join(values)  # api pre-sorts values per key

    a = _result_set(map_reduce(records, mapper, join_sorted))
    b = _result_set(map_reduce(records, mapper, join_sorted))
    assert a == b


def test_map_only_equals_identity_reduce(spark):
    # reducer=None (Hadoop numReduceTasks=0) must produce exactly what
    # an explicit identity reduce produces — minus the shuffle
    records = spark.createDataFrame(
        [(str(i), f"text {i}") for i in range(50)],
        "k STRING, v STRING",
    )

    def mapper(k, text):
        if int(k) % 2 == 0:
            yield k, text.upper()

    def identity(_k, values):
        yield from values

    map_only = _result_set(map_reduce(records, mapper, reducer=None))
    reduced = _result_set(map_reduce(records, mapper, identity))
    assert map_only == reduced
    assert len(map_only) == 25
