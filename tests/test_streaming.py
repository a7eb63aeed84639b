"""Smoke tests for the genuinely-streaming twins (§2.9): readStream →
watermark/window/dedup/stateful → memory sink.  Values are checked by
the batch twins' oracles; these tests assert the STREAMING execution
path runs and produces sane row counts."""

from __future__ import annotations

import itertools
import os

import pandas as pd
import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T

_uid = itertools.count()

def _raw_schema(spark, sf_dir):
    # ts is parquet TIMESTAMP(NANOS): native TIMESTAMP_NTZ on newer
    # readers, epoch-nanos long under the legacy conf on older ones —
    # probe the batch reader and mirror whatever it produces.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ts_type = spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    return schema, isinstance(ts_type, T.LongType)


def _ts_to_micros(df, nanos_as_long):
    if nanos_as_long:
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def _batch_events(spark, sf_dir):
    raw, nal = _raw_schema(spark, sf_dir)
    return _ts_to_micros(
        spark.read.schema(raw).option("pathGlobFilter", "events.parquet").parquet(sf_dir),
        nal,
    )


def _stream_events(spark, sf_dir):
    raw, nal = _raw_schema(spark, sf_dir)
    return _ts_to_micros(
        spark.readStream.schema(raw)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir),
        nal,
    )


def _run(sdf, mode="append"):
    name = f"smoke_{os.getpid()}_{next(_uid)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    return name


def test_stream_watermark_windowed_agg(spark, sf_dir):
    sdf = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = _run(sdf, mode="append")
    out = spark.table(name)
    # all windows except those still open at the final watermark emit
    assert out.count() > 0
    assert out.filter(F.col("cnt") <= 0).count() == 0


def test_stream_dedup_within_watermark(spark, sf_dir):
    sdf = (
        _stream_events(spark, sf_dir)
        .withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = _run(sdf, mode="append")
    n = spark.table(name).count()
    batch_n = _batch_events(spark, sf_dir).count()
    assert n == batch_n  # event_id is unique → nothing dropped


def test_incremental_microbatches_match_batch(spark, sf_dir, tmp_path):
    # split events into several files; one file per micro-batch forces
    # watermark advancement and state merging ACROSS batches — the
    # genuinely incremental path, checked against the one-shot batch agg
    src = str(tmp_path / "landing")
    ev = _batch_events(spark, sf_dir)
    ev.repartition(8).write.mode("overwrite").parquet(src)

    # NO watermark here: file order after repartition is arbitrary, so a
    # watermark would (correctly) drop whichever events land in a later
    # micro-batch than newer ones — the late-drop path has its own test.
    # Without one, incremental state merging must reproduce the batch
    # result exactly.
    sdf = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    name = _run(sdf, mode="update")
    # update mode re-emits a window each time it changes; the LAST
    # update per (window, type) is the final count
    final = (
        spark.table(name)
        .groupBy("window", "event_type")
        .agg(F.max("cnt").alias("cnt"))
    )
    batch = (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    a = {(r["window"], r["event_type"]): r["cnt"] for r in final.collect()}
    b = {(r["window"], r["event_type"]): r["cnt"] for r in batch.collect()}
    assert a == b


def test_checkpoint_recovery_processes_only_new_files(spark, sf_dir, tmp_path):
    # exactly-once across restarts: run 1 consumes the landing dir with
    # a checkpoint; run 2 (same checkpoint, same sink table) must pick
    # up ONLY the file that arrived in between — no reprocessing
    src = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    ev = _batch_events(spark, sf_dir)
    first_half = ev.filter(F.col("event_id") % 2 == 0)
    second_half = ev.filter(F.col("event_id") % 2 == 1)
    first_half.coalesce(1).write.mode("overwrite").parquet(src)

    sink = str(tmp_path / "sink")

    def run_once():
        # memory sink can't recover from a checkpoint; the file sink can
        q = (
            spark.readStream.schema(ev.schema)
            .parquet(src)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    def sink_count():
        return spark.read.schema(ev.schema).parquet(sink).count()

    run_once()
    n1 = sink_count()
    assert n1 == first_half.count()

    # a new file lands; restart from the same checkpoint
    second_half.coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert sink_count() == n1 + second_half.count()  # new rows only, none twice


def test_stream_stateful_applyinpandas_with_state(spark, sf_dir):
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    state_schema = T.StructType([T.StructField("n", T.LongType())])

    def count_events(key, pdfs, state: GroupState):
        n = state.get[0] if state.exists else 0
        for pdf in pdfs:
            n += len(pdf)
        state.update((n,))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n]})

    sdf = (
        _stream_events(spark, sf_dir)
        .groupBy("user_id")
        .applyInPandasWithState(
            count_events,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = _run(sdf, mode="update")
    out = spark.table(name)
    total = out.groupBy("user_id").agg(F.max("n_events").alias("n")).agg(F.sum("n")).first()[0]
    batch_n = _batch_events(spark, sf_dir).count()
    assert total == batch_n  # every event counted exactly once across state updates


def test_stream_stateful_transform_with_state_matches_batch(
    spark, sf_dir, tmp_path
):
    """The true Spark-4 stateful primitive: the SAME purchase-streak
    fold as the stream_stateful batch key, run through
    ``transformWithStateInPandas`` across ≥2 micro-batches (time-sliced
    files, one per trigger, mtime-ordered so arrival respects event
    time), with the carried (current streak, best streak, n_purchases)
    tuple in a ValueState.  Falls back to ``applyInPandasWithState``
    where the build lacks the operator (SURVEY §7c).  The final
    emission per user must equal the batch key's answer exactly —
    value parity, not a smoke check."""
    import glob
    import shutil

    from task_mapreduce_spark.registry import QUERIES

    ev = _batch_events(spark, sf_dir).select(
        "user_id", "event_id", "ts", "event_type"
    )
    us = F.unix_micros("ts")
    # tertile split by event time -> 3 chronological micro-batches;
    # literals collected ONCE and reused (approx_percentile is not
    # reproducible across jobs)
    b0, b1 = ev.select(
        F.percentile_approx(us, [1.0 / 3, 2.0 / 3], 10000).alias("b")
    ).first()["b"]
    landing = str(tmp_path / "landing")
    os.makedirs(landing)
    slices = [us <= b0, (us > b0) & (us <= b1), us > b1]
    for i, pred in enumerate(slices):
        stage = str(tmp_path / f"stage{i}")
        ev.filter(pred).coalesce(1).write.mode("overwrite").parquet(stage)
        dst = f"{landing}/{i:02d}.parquet"
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], dst)
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))

    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(landing)
        .groupBy("user_id")
    )
    out_schema = "user_id BIGINT, max_purchase_streak BIGINT, n_purchases BIGINT"

    def fold(carry, pdf):
        # identical state transition to the batch key's closure: longest
        # consecutive purchase run in (ts, event_id) order, resumed from
        # the carried (current, best, n_purchases)
        cur, best, n_p = carry
        pdf = pdf.sort_values(["ts", "event_id"])
        for flag in (pdf["event_type"] == "purchase").to_numpy():
            cur = cur + 1 if flag else 0
            best = max(best, cur)
            n_p += int(flag)
        return cur, best, n_p

    def run_tws():
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        class StreakProcessor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._st = handle.getValueState(
                    "streak", "cur LONG, best LONG, n_p LONG"
                )

            def handleInputRows(self, key, rows, timerValues):
                carry = self._st.get() if self._st.exists() else (0, 0, 0)
                cur, best, n_p = fold(carry, pd.concat(list(rows)))
                self._st.update((cur, best, n_p))
                yield pd.DataFrame(
                    {
                        "user_id": [key[0]],
                        "max_purchase_streak": [best],
                        "n_purchases": [n_p],
                    }
                )

            def close(self) -> None:
                pass

        return src.transformWithStateInPandas(
            StreakProcessor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )

    def run_aipws():
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def streaks(key, pdfs, state: GroupState):
            carry = tuple(state.get) if state.exists else (0, 0, 0)
            cur, best, n_p = fold(carry, pd.concat(list(pdfs)))
            state.update((cur, best, n_p))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "max_purchase_streak": [best],
                    "n_purchases": [n_p],
                }
            )

        return src.applyInPandasWithState(
            streaks,
            outputStructType=out_schema,
            stateStructType="cur LONG, best LONG, n_p LONG",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    try:
        name = _run(run_tws(), mode="update")
    except Exception:
        # older build without transformWithStateInPandas (or without a
        # state-store provider supporting it): same fold, v1 API
        name = _run(run_aipws(), mode="update")

    # update mode re-emits a user whenever its state changes; all three
    # outputs are monotone, so the final value is the max
    got = {
        r["user_id"]: (r["max_purchase_streak"], r["n_purchases"])
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("max_purchase_streak").alias("max_purchase_streak"),
            F.max("n_purchases").alias("n_purchases"),
        )
        .collect()
    }
    want = {
        r["user_id"]: (r["max_purchase_streak"], r["n_purchases"])
        for r in QUERIES["stream_stateful"](spark, sf_dir).collect()
    }
    assert got == want


def test_stream_stream_interval_join(spark, sf_dir):
    """The true streaming twin of stream_join: purchases ⋈ clicks on
    user within a time range, BOTH sides watermarked so click state is
    bounded by the interval instead of growing forever."""
    ev = _stream_events(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .withWatermark("ts", "2 hours")
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "2 hours")
    )
    pairs = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("ts")),
    )
    name = _run(pairs)
    got = spark.sql(f"SELECT COUNT(*) AS n FROM {name}").collect()[0]["n"]
    # batch reference: the same inner pair join on the static table
    from task_mapreduce_spark.tables import load

    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts")
    )
    want = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") >= F.col("ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") < F.col("ts")),
    ).count()
    assert got == want and want > 0, (got, want)


def test_foreachbatch_cdc_merge_matches_batch_upsert(spark, sf_dir):
    """Streaming CDC: merge each micro-batch into a keyed store with
    last-write-wins (the foreachBatch upsert idiom) — after draining
    the log, the store must equal cdc_upsert's batch answer."""
    from task_mapreduce_spark.registry import QUERIES

    store: dict[tuple, tuple] = {}

    def merge_batch(batch_df, _batch_id):
        # per micro-batch: reduce to latest-per-key locally, then upsert
        from pyspark.sql.window import Window

        w = Window.partitionBy("user_id", "event_type").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        latest = (
            batch_df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .collect()
        )
        for r in latest:
            k = (r["user_id"], r["event_type"])
            v = (r["ts"], r["event_id"], r["value"])
            if k not in store or v[:2] > store[k][:2]:
                store[k] = v

    name_src = _stream_events(spark, sf_dir)
    q = (
        name_src.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()

    batch = {
        (r["user_id"], r["event_type"]): (r["last_ts"], r["last_value"])
        for r in QUERIES["cdc_upsert"](spark, sf_dir).collect()
    }
    got = {k: (v[0], v[2]) for k, v in store.items()}
    assert got == batch


def test_foreachbatch_upsert_recovers_from_mid_stream_crash(spark, sf_dir, tmp_path):
    """Crash-recovery proof for the stream_foreachbatch_upsert
    contract: the exactly-once claim rests on idempotent per-batch
    overwrite, so kill the query AFTER batch 1's partial hits disk but
    BEFORE its offset commits, restart from the SAME checkpoint, and
    require the replayed run to converge to the batch answer with no
    duplicate and no loss (the retried batch id rewrites its own
    partial)."""
    from pyspark.sql.window import Window

    from task_mapreduce_spark.tables import load

    e = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    src, part_root, ckpt = f"{tmp_path}/src", f"{tmp_path}/part", f"{tmp_path}/ckpt"
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", us.alias("us"), "user_id", "value"
    )
    purchases.repartition(3).write.mode("overwrite").parquet(src)
    schema = "event_id LONG, us LONG, user_id LONG, value DOUBLE"

    def latest_per_user(df):
        w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
        return df.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")

    def run(crash_at):
        def merge(batch_df, batch_id):
            latest_per_user(batch_df).write.mode("overwrite").parquet(
                f"{part_root}/batch={batch_id}"
            )
            if batch_id == crash_at:
                raise RuntimeError("injected crash: partial written, offset NOT committed")

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(merge)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(300)
        except Exception:
            pass  # the injected crash surfaces here on the failing run
        return q

    q1 = run(crash_at=1)
    assert q1.exception() is not None, "the injected crash must kill the query"
    assert os.path.isdir(f"{part_root}/batch=1"), "half-committed batch must be on disk"

    q2 = run(crash_at=None)
    assert q2.exception() is None, q2.exception()
    parts = sorted(d for d in os.listdir(part_root) if d.startswith("batch="))
    assert parts == ["batch=0", "batch=1", "batch=2"]  # batch 1 replayed once, in place

    folded = latest_per_user(
        spark.read.schema(schema).parquet(*[f"{part_root}/{d}" for d in parts])
    )
    got = {r["user_id"]: (r["event_id"], r["value"]) for r in folded.collect()}
    want = {
        r["user_id"]: (r["event_id"], r["value"])
        for r in latest_per_user(purchases).collect()
    }
    assert got == want


def test_foreachbatch_chunk_dedup_matches_batch_content(spark, sf_dir, tmp_path):
    """Streaming twin of dedup_chunks (the round-8 verdict's open
    decision): chunk dedup over ARRIVING documents is first-accepted-
    wins per content digest against persisted state — the foreachBatch
    idiom stream_foreachbatch_upsert already exercises, with the
    micro-batch chunked by the IDENTICAL _chunk_frame rule the batch
    key uses.  Owner IDENTITY is arrival-order-dependent by design
    (the batch key's global-min owner needs the full corpus), but the
    deduped CONTENT is not: after draining the log, the kept digest
    set must equal the batch key's kept digest set, with exactly one
    owner per digest and the same total chunk volume seen."""
    from task_mapreduce_spark.operators.corpus_tools import _chunk_frame
    from task_mapreduce_spark.registry import QUERIES

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    d.repartition(3).write.mode("overwrite").parquet(f"{tmp_path}/docs_src")
    src = (
        spark.readStream.schema(d.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/docs_src")
    )
    state: dict[str, tuple] = {}  # digest -> (batch_id, doc_id, chunk_id)
    batch_sizes: list[int] = []

    def dedup_batch(batch_df, batch_id):
        rows = (
            _chunk_frame(batch_df)
            .select("doc_id", "chunk_id", F.sha2("chunk_text", 256).alias("h"))
            .collect()
        )
        batch_sizes.append(len(rows))
        # within a micro-batch the batch key's own tiebreak applies;
        # across batches first arrival wins (setdefault = persisted
        # digest-keyed state, the dedup_incremental index discipline)
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_id"])):
            state.setdefault(r["h"], (batch_id, r["doc_id"], r["chunk_id"]))

    q = (
        src.writeStream.foreachBatch(dedup_batch)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.exception() is None, q.exception()
    assert len(batch_sizes) >= 2, "stream did not split into micro-batches"

    batch_rows = QUERIES["dedup_chunks"](spark, sf_dir).collect()
    assert set(state) == {r["h"] for r in batch_rows if r["keep"]}
    assert sum(batch_sizes) == len(batch_rows)


def test_stream_state_evolve_restart_keeps_state_layout(spark, sf_dir):
    """The restart contract stream_state_evolve claims: run 2 restarts
    from run 1's checkpoint under a CHANGED shuffle-partition conf, the
    on-disk state layout stays pinned at run 1's count, and users seen
    ONLY before the restart surface in the final emission with their
    exact pre-restart state."""
    import glob
    import tempfile

    from task_mapreduce_spark.functions.exact import dsum
    from task_mapreduce_spark.registry import QUERIES
    from task_mapreduce_spark.streaming.ops import (
        _SSE_PARTS_RUN1,
        _SSE_PARTS_RUN2,
    )
    from task_mapreduce_spark.tables import load

    orig = spark.conf.get("spark.sql.shuffle.partitions")
    out = {
        r["user_id"]: (r["n_purchases"], r["total_value"])
        for r in QUERIES["stream_state_evolve"](spark, sf_dir).collect()
    }
    assert out, "empty emission — fixture drift?"
    # the operator restored the session conf it perturbed
    assert spark.conf.get("spark.sql.shuffle.partitions") == orig

    # state layout on disk: pinned at run 1's count, NOT run 2's conf
    tmp = os.path.join(tempfile.gettempdir(), f"tmrs_sse_{os.getpid()}")
    cks = sorted(glob.glob(f"{tmp}/ckpt_*"), key=os.path.getmtime)
    assert cks, "no checkpoint left behind"
    state0 = os.path.join(cks[-1], "state", "0")
    parts = [d for d in os.listdir(state0) if d.isdigit()]
    assert len(parts) == _SSE_PARTS_RUN1
    assert len(parts) != _SSE_PARTS_RUN2

    # users whose EVERY purchase is in the pre-restart half (the
    # user-hash slice the operator routes to run 1 in its entirety):
    # their state crossed the restart untouched — run 2 never saw a
    # row of theirs
    e = load(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "value"
    )
    uhash = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    per_user = (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dsum("value").alias("tv"),
            F.min((uhash % 4 == 0).cast("int")).alias("all_half1"),
        )
        .collect()
    )
    run1_only = [r for r in per_user if r["all_half1"] == 1]
    assert run1_only, "no run-1-only user in the fixture — weaken split?"
    for r in run1_only:
        assert out[r["user_id"]] == (r["n"], r["tv"]), (
            f"user {r['user_id']} lost pre-restart state"
        )


def test_watermark_eviction_timing_across_three_batches(spark, tmp_path):
    """Round-12 verdict #7: assert WHICH rows the watermark evicts, not
    just final values.  Three hand-built micro-batches (one file each,
    drained with processAllAvailable between writes) drive the full
    event-time lifecycle under a 10-minute watermark and 1-hour
    append-mode windows:

    - batch 1: 10:00 / 10:15 / 10:30  → watermark 10:20, nothing emits
      (the 10:00 window is still open);
    - batch 2: 10:45 (LATE but inside the batch-boundary watermark —
      Spark consults the watermark computed from PRIOR batches, so this
      row is ADMITTED into the open window) + 12:30 (advances the
      watermark to 12:20, closing the 10:00 window);
    - batch 3: 10:05 (late BEYOND the watermark — must be EVICTED:
      the already-emitted 10:00 window must not change or re-emit)
      + 13:30 (closes the 12:00 window).

    Final emitted set: exactly {[10:00,11:00) → 4, [12:00,13:00) → 1};
    the 13:00 window stays open (never emitted), and the 10:05 row
    appears in NO emitted window."""
    import datetime as dt

    src = str(tmp_path / "landing")
    schema = T.StructType(
        [T.StructField("ts", T.TimestampType()), T.StructField("k", T.StringType())]
    )

    def drop(*hhmm):
        rows = [
            (dt.datetime(2024, 1, 1, int(x[:2]), int(x[3:])), x) for x in hhmm
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    drop("10:00", "10:15", "10:30")  # batch 1 present before start
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.collect_set("k").alias("ks"))
    )
    name = f"evict_{os.getpid()}_{next(_uid)}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        assert spark.table(name).count() == 0, (
            "window emitted before the watermark passed its end"
        )

        drop("10:45", "12:30")  # batch 2
        q.processAllAvailable()
        got2 = {
            r["window"].start.hour: (r["cnt"], sorted(r["ks"]))
            for r in spark.table(name).collect()
        }
        assert got2 == {10: (4, ["10:00", "10:15", "10:30", "10:45"])}, (
            f"the 10:45 row must be ADMITTED (batch-boundary watermark "
            f"was 10:20) and the 10:00 window must emit once closed: {got2}"
        )

        drop("10:05", "13:30")  # batch 3: one evicted row + one opener
        q.processAllAvailable()
        rows = spark.table(name).collect()
        got3 = {
            r["window"].start.hour: (r["cnt"], sorted(r["ks"]))
            for r in rows
        }
        assert got3 == {
            10: (4, ["10:00", "10:15", "10:30", "10:45"]),
            12: (1, ["12:30"]),
        }, f"10:05 must be evicted, 12:00 window must close: {got3}"
        # eviction is per-ROW provable: 10:05 appears in no emitted
        # window, and the closed 10:00 window did not re-emit
        assert len(rows) == 2
        assert all("10:05" not in r["ks"] for r in rows)
    finally:
        q.stop()
