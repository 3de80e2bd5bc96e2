"""Structured Streaming parity tests: availableNow runs over the driver
events parquet must reproduce the batch analogues."""

import pytest
from pyspark.sql import Window as W, functions as F

from docetl_spark.streaming import (
    read_events_stream,
    run_available_now,
    sessionize_stateful,
    windowed_rollup,
)

EVENTS_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def event_stream(spark):
    return read_events_stream(spark, f"{EVENTS_DIR}/events.parquet")


def _batch_events(spark):
    from docetl_spark.sources.readers import normalize_epoch_nanos

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return normalize_epoch_nanos(spark.read.parquet(f"{EVENTS_DIR}/events.parquet"))


def test_event_time_floor_is_exact_for_negative_epoch_ns(spark):
    """The stream reader's event_time expression must FLOOR epoch-ns to
    microseconds: bare DIV truncates toward zero, rounding pre-1970
    (negative) timestamps UP, which can shift an event across a
    window/watermark boundary."""
    df = spark.createDataFrame([(-1500,), (1500,), (-1000,), (0,)], ["ts"])
    out = df.withColumn(
        "event_time", F.expr("timestamp_micros((ts - pmod(ts, 1000)) DIV 1000)")
    ).withColumn("us", F.unix_micros("event_time")).orderBy("ts")
    got = [r["us"] for r in out.collect()]
    # floor(-1.5) = -2, floor(-1.0) = -1, floor(0) = 0, floor(1.5) = 1
    assert got == [-2, -1, 0, 1]


def test_windowed_rollup_matches_batch(spark, event_stream, tmp_path):
    out = run_available_now(
        windowed_rollup(event_stream, window="1 hour", watermark="2 hours"),
        checkpoint=str(tmp_path / "ck1"),
        dedupe_keys=["window_start", "event_type"],
    )
    ev = _batch_events(spark)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    win = F.window(F.timestamp_seconds(F.col("ts") / F.lit(1_000_000_000.0)), "1 hour")
    batch = (
        ev.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("value_cents"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "value_cents")
        .collect()
    )
    b = {(r["window_start"], r["event_type"]): (r["n"], r["value_cents"]) for r in batch}
    s = {(r["window_start"], r["event_type"]): (r["n"], r["value_cents"]) for r in out}
    assert s == b


def test_sessionize_stateful_matches_batch(spark, event_stream, tmp_path):
    out = run_available_now(
        sessionize_stateful(event_stream, gap_seconds=1800),
        checkpoint=str(tmp_path / "ck2"),
        dedupe_keys=["user_id", "session_id"],
    )
    ev = _batch_events(spark)
    w = W.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    epoch = F.expr("ts DIV 1000000000")
    sess = (
        ev.withColumn("_prev", F.lag(epoch).over(w))
        .withColumn("_new", F.when(F.col("_prev").isNull() | ((epoch - F.col("_prev")) > 1800), 1).otherwise(0))
        .withColumn("session_id", F.sum("_new").over(w).cast("long"))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.min(epoch).alias("start_epoch"), F.max(epoch).alias("end_epoch"))
        .collect()
    )
    # session numbering differs (batch is 1-based); compare the session
    # boundary structure instead
    b = sorted((r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"]) for r in sess)
    s = sorted((r["user_id"], r["start_epoch"], r["end_epoch"], r["n_events"]) for r in out)
    assert s == b


def test_windowed_rollup_is_streaming(event_stream):
    assert event_stream.isStreaming
    assert windowed_rollup(event_stream).isStreaming


def test_stateless_curation_ops_compose_on_streams(spark, tmp_path):
    """Curation ops that are pure row-local expressions — split
    assignment, quality rules, PII redaction, shard keys — must apply
    unchanged to a streaming frame (stateless: no watermark needed)."""
    from docetl_spark.functions import text as text_fn
    from docetl_spark.functions.training import assign_splits
    from docetl_spark.streaming.events import run_available_now

    docs_schema = spark.read.parquet(f"{EVENTS_DIR}/documents.parquet").schema
    stream = (
        spark.readStream.schema(docs_schema)
        .option("pathGlobFilter", "documents.parquet")  # file source needs a dir
        .parquet(EVENTS_DIR)
    )
    assert stream.isStreaming
    curated = (
        assign_splits(stream, id_cols=["doc_id"])
        .withColumn("quality", text_fn.quality_score(F.col("text")))
        .withColumn("clean", text_fn.pii_redact(F.col("text")))
    )
    rows = run_available_now(curated, checkpoint=str(tmp_path / "ck"))
    assert len(rows) == 500
    batch = assign_splits(
        spark.read.parquet(f"{EVENTS_DIR}/documents.parquet"), id_cols=["doc_id"]
    ).select("doc_id", "split").collect()
    stream_splits = {r["doc_id"]: r["split"] for r in rows}
    assert stream_splits == {r["doc_id"]: r["split"] for r in batch}


def test_semantic_map_stream_matches_batch(spark, tmp_path):
    """Streaming semantic map drains to exactly the batch semantic_map
    result (stateless mapInPandas — identical per-row semantics), and
    bounded-input knobs are rejected on streams."""
    import pytest

    from docetl_spark import FakeBackend
    from docetl_spark.operators.semantic import semantic_map
    from docetl_spark.streaming.events import (
        read_parquet_stream,
        run_available_now,
        semantic_map_stream,
    )

    be = FakeBackend(rules={"flag": lambda row: "hit" if row["doc_id"] % 3 == 0 else "miss"})
    path = f"{EVENTS_DIR}/documents.parquet"
    stream = read_parquet_stream(spark, path)
    out = semantic_map_stream(stream, "p: {{ input.doc_id }}", {"flag": "str"}, be)
    assert out.isStreaming
    rows = run_available_now(
        out.select("doc_id", "flag"), checkpoint=str(tmp_path / "ckpt")
    )
    got = {(r["doc_id"], r["flag"]) for r in rows}

    batch = semantic_map(
        spark.read.parquet(path), "p: {{ input.doc_id }}", {"flag": "str"}, be
    )
    want = {(r["doc_id"], r["flag"]) for r in batch.select("doc_id", "flag").collect()}
    assert got == want and got

    with pytest.raises(ValueError, match="streaming DataFrame"):
        semantic_map_stream(spark.read.parquet(path), "p", {"flag": "str"}, be)
    with pytest.raises(ValueError, match="bounded batch input"):
        semantic_map_stream(stream, "p", {"flag": "str"}, be, limit=5)


def test_semantic_filter_stream_matches_batch(spark, tmp_path):
    import pytest

    from docetl_spark import FakeBackend
    from docetl_spark.operators.semantic import semantic_filter
    from docetl_spark.streaming.events import (
        read_parquet_stream,
        run_available_now,
        semantic_filter_stream,
    )

    be = FakeBackend(rules={"keep": lambda row: row["doc_id"] % 4 == 0})
    path = f"{EVENTS_DIR}/documents.parquet"
    stream = read_parquet_stream(spark, path)
    out = semantic_filter_stream(stream, "keep? {{ input.doc_id }}", {"keep": "bool"}, be)
    rows = run_available_now(out.select("doc_id"), checkpoint=str(tmp_path / "ckpt_f"))
    got = {r["doc_id"] for r in rows}
    want = {
        r["doc_id"]
        for r in semantic_filter(
            spark.read.parquet(path), "keep? {{ input.doc_id }}", {"keep": "bool"}, be
        ).select("doc_id").collect()
    }
    assert got == want and got

    with pytest.raises(ValueError, match="bounded batch input"):
        semantic_filter_stream(stream, "p", {"keep": "bool"}, be, limit=3)
    with pytest.raises(ValueError, match="calibrat"):
        semantic_filter_stream(stream, "p", {"keep": "bool"}, be,
                               cascade={"guarantee": "recall", "target": 0.9})


def test_stream_interval_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join == the batch range join on
    exact nanos (boundary pairs included — the ns predicate, not the
    µs-rounded timestamps, decides membership)."""
    from docetl_spark.streaming.events import (
        read_events_stream as _res,
        run_available_now as _ran,
        stream_interval_join,
    )

    def side(et):
        return _res(spark, f"{EVENTS_DIR}/events.parquet").filter(
            F.col("event_type") == et
        ).select("user_id", "event_id", "ts", "event_time")

    joined = stream_interval_join(
        side("click"), side("error"), on="user_id",
        lower_seconds=1800, upper_seconds=0, exact_ns_col="ts",
    ).select("l_user_id", "l_event_id", "r_event_id")
    rows = _ran(joined, checkpoint=str(tmp_path / "ckpt_ivj"), output_mode="append")
    got = {(r["l_user_id"], r["l_event_id"], r["r_event_id"]) for r in rows}

    ev = _batch_events(spark)
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("cid"), F.col("ts").alias("cts"))
    e = ev.filter("event_type = 'error'").select(
        F.col("user_id").alias("eu"), F.col("event_id").alias("eid"), F.col("ts").alias("ets"))
    want = {
        (r["cu"], r["cid"], r["eid"])
        for r in c.join(
            e,
            (F.col("cu") == F.col("eu"))
            & (F.col("ets") >= F.col("cts") - 1800 * 10**9)
            & (F.col("ets") <= F.col("cts")),
        ).collect()
    }
    assert got == want and got


def test_rolling_features_stateful_matches_batch(spark, event_stream, tmp_path):
    """The online rolling-features state machine must reproduce the
    batch window-function operator exactly (index, gap, trailing-k)."""
    from docetl_spark.functions import timeseries
    from docetl_spark.streaming.events import rolling_features_stateful

    out = run_available_now(
        rolling_features_stateful(
            event_stream.select("event_id", "user_id", "ts", "value"), lookback_rows=10
        ),
        checkpoint=str(tmp_path / "ckroll"),
        dedupe_keys=["event_id"],
    )
    ev = _batch_events(spark)
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    batch = timeseries.rolling_features(
        ev.select("event_id", "user_id", "ts", "value").withColumn("_c", cents),
        "ts", keys=["user_id"], value_aggs={"rolling_cents": F.sum("_c")},
        lookback_rows=10, tiebreak=["event_id"],
    ).select(
        "event_id", "user_id", "event_idx",
        (F.col("ts") - F.col("prev_ts")).alias("gap_ns"), "rolling_n", "rolling_cents",
    ).collect()
    b = sorted(tuple(r) for r in batch)
    s = sorted(
        (r["event_id"], r["user_id"], r["event_idx"], r["gap_ns"], r["rolling_n"], r["rolling_cents"])
        for r in out
    )
    assert s == b


def test_rolling_features_stateful_carries_state_across_batches(spark, tmp_path):
    """Two availableNow drains over a growing directory: the second
    batch's features must continue from the first batch's state (index,
    prev_ts, trailing window) — the property that distinguishes the
    stateful op from a per-batch map."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        read_events_stream, rolling_features_stateful, run_available_now,
    )

    d = tmp_path / "ev"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write(batch_id, rows):
        pd.DataFrame(rows, columns=cols).to_parquet(d / f"b{batch_id}.parquet")

    base = 1_700_000_000 * 1_000_000_000
    write(0, [(1, base + 1_000, 7, "a", 1.0, ""), (2, base + 2_000, 7, "a", 2.0, "")])
    ck = str(tmp_path / "ck")

    def drain():
        # memory sinks refuse checkpoint recovery, so the second drain
        # must go through foreachBatch (recovery-capable) to observe the
        # state carried across restarts
        captured = []
        ev = read_events_stream(spark, str(d))
        feat = rolling_features_stateful(
            ev.select("event_id", "user_id", "ts", "value"), lookback_rows=2
        )
        (
            feat.writeStream.foreachBatch(
                lambda df, _id: captured.extend(df.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return captured

    first = {r["event_id"]: r for r in drain()}
    assert first[1]["event_idx"] == 1 and first[1]["gap_ns"] is None
    assert first[2]["event_idx"] == 2 and first[2]["gap_ns"] == 1_000
    assert first[2]["rolling_cents"] == 300  # 1.00 + 2.00 in cents

    write(1, [(3, base + 5_000, 7, "a", 4.0, "")])
    second = {r["event_id"]: r for r in drain()}
    r3 = second[3]
    # state carried: index continues, gap measured against batch-0's
    # last event, trailing-2 window holds (2.0, 4.0)
    assert r3["event_idx"] == 3 and r3["gap_ns"] == 3_000
    assert r3["rolling_n"] == 2 and r3["rolling_cents"] == 600


def test_rolling_features_stateful_tolerates_null_value(spark, tmp_path):
    """NULL value must occupy a window slot without crashing the stream
    (the batch frame counts the row; the null-skipping SUM ignores it)."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        read_events_stream, rolling_features_stateful, run_available_now,
    )

    d = tmp_path / "ev"
    d.mkdir()
    base = 1_700_000_000 * 1_000_000_000
    pd.DataFrame(
        [(1, base + 1_000, 3, "a", 1.0, ""), (2, base + 2_000, 3, "a", None, ""),
         (3, base + 3_000, 3, "a", 2.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    out = {r["event_id"]: r for r in run_available_now(
        rolling_features_stateful(
            read_events_stream(spark, str(d)).select("event_id", "user_id", "ts", "value"),
            lookback_rows=2,
        ),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["event_id"],
    )}
    assert out[2]["rolling_n"] == 2 and out[2]["rolling_cents"] == 100  # null skipped in sum
    assert out[3]["rolling_n"] == 2 and out[3]["rolling_cents"] == 200  # window slid past


def test_stateful_ops_sort_across_arrow_chunks(spark, tmp_path):
    """applyInPandasWithState hands groups over as MULTIPLE Arrow chunks
    once a batch exceeds arrow.maxRecordsPerBatch; events must still
    fold in global (ts, event_id) order, not per-chunk order."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        read_events_stream, rolling_features_stateful, run_available_now,
    )

    base = 1_700_000_000 * 1_000_000_000
    n = 400
    # write deliberately ts-DESCENDING so any unsorted fold is wrong
    rows = [
        (i, base + (n - i) * 1_000, 1, "a", float(i % 7), "")
        for i in range(n)
    ]
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    ).to_parquet(d / "b0.parquet")

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "50")
    try:
        out = run_available_now(
            rolling_features_stateful(
                read_events_stream(spark, str(d)).select("event_id", "user_id", "ts", "value"),
                lookback_rows=3,
            ),
            checkpoint=str(tmp_path / "ck"), dedupe_keys=["event_id"],
        )
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    got = {r["event_id"]: r for r in out}
    assert len(got) == n
    # ts ascending means event_id DESCENDING: event n-1 is first
    assert got[n - 1]["event_idx"] == 1 and got[n - 1]["gap_ns"] is None
    assert got[0]["event_idx"] == n
    # every consecutive gap is exactly 1000ns — any chunk-local fold
    # would produce a negative or >1000 gap somewhere
    assert all(got[i]["gap_ns"] == 1_000 for i in range(n - 1))


def test_funnel_stateful_state_carries_across_batches(spark, tmp_path):
    """Step 1 in batch 0, step 2 in batch 1: the user's state array must
    carry so the later batch's click qualifies."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        funnel_stateful, read_events_stream, run_available_now,
    )

    base = 1_700_000_000 * 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        [(1, base + 100, 7, "view", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    pd.DataFrame(
        [(2, base + 200, 7, "click", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b1.parquet")
    out = run_available_now(
        funnel_stateful(
            read_events_stream(
                spark, str(d), max_files_per_trigger=1
            ).select("event_id", "user_id", "ts", "event_type"),
            ["view", "click"],
        ),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["user_id"],
    )
    (row,) = out
    assert row["reached"] == 2
    assert row["step1_ts"] == base + 100 and row["step2_ts"] == base + 200


def test_funnel_stateful_out_of_order_within_batch_sorted(spark, tmp_path):
    """A click written BEFORE the view in file order but after in event
    time must still qualify — rows fold in (ts, event_id) order."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        funnel_stateful, read_events_stream, run_available_now,
    )

    base = 1_700_000_000 * 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        [(2, base + 200, 7, "click", 0.0, ""), (1, base + 100, 7, "view", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    out = run_available_now(
        funnel_stateful(
            read_events_stream(spark, str(d)).select(
                "event_id", "user_id", "ts", "event_type"),
            ["view", "click"],
        ),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["user_id"],
    )
    assert out[0]["reached"] == 2


def test_funnel_stateful_wrong_order_never_qualifies(spark, tmp_path):
    """purchase before click (in event time) must not count as step 2
    even though both types occur."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        funnel_stateful, read_events_stream, run_available_now,
    )

    base = 1_700_000_000 * 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        [(1, base + 100, 7, "purchase", 0.0, ""), (2, base + 200, 7, "click", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    out = run_available_now(
        funnel_stateful(
            read_events_stream(spark, str(d)).select(
                "event_id", "user_id", "ts", "event_type"),
            ["click", "purchase"],
        ),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["user_id"],
    )
    (row,) = out
    assert row["reached"] == 1 and row["step1_ts"] == base + 200
    assert row["step2_ts"] is None


def test_drained_df_preserves_nullable_epoch_nanos(spark):
    """Review repro: pd.DataFrame(rows) infers float64 for a None+int
    column and corrupts epoch-ns above 2^53 (…791 -> …768); drained_df
    must build nullable Int64 columns instead."""
    from docetl_spark.streaming.events import drained_df

    ns = 1_700_000_000_123_456_791
    rows = [
        {"user_id": 1, "t": ns, "s": "a"},
        {"user_id": 2, "t": None, "s": None},
    ]
    out = {r["user_id"]: r for r in
           drained_df(spark, rows, "user_id long, t long, s string").collect()}
    assert out[1]["t"] == ns  # exact, not 1_700_000_000_123_456_768
    assert out[2]["t"] is None and out[2]["s"] is None


def test_funnel_drain_exact_ns_with_missing_step(spark, tmp_path):
    """End-to-end through drained_df: one user misses the click step, so
    the step2_ts column mixes None with >2^53 ns values — they must
    survive exactly."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        drained_df, funnel_stateful, read_events_stream, run_available_now,
    )

    ns = 1_700_000_000_123_456_791
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        [(1, ns, 7, "view", 0.0, ""), (2, ns + 7, 7, "click", 0.0, ""),
         (3, ns + 3, 8, "view", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    rows = run_available_now(
        funnel_stateful(
            read_events_stream(spark, str(d)).select(
                "event_id", "user_id", "ts", "event_type"),
            ["view", "click"],
        ),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["user_id"],
    )
    got = {r["user_id"]: r for r in drained_df(
        spark, rows, "user_id long, step1_ts long, step2_ts long, reached int"
    ).collect()}
    assert got[7]["step2_ts"] == ns + 7  # exact through the None-mixed column
    assert got[8]["step2_ts"] is None and got[8]["step1_ts"] == ns + 3


def test_funnel_stateful_string_keys(spark, tmp_path):
    """The key column keeps its input type — string session keys work."""
    import pandas as pd

    from docetl_spark.streaming.events import funnel_stateful, run_available_now

    base = 1_700_000_000 * 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    pd.DataFrame(
        [(1, base, "sess-a", "view"), (2, base + 1, "sess-a", "click")],
        columns=["event_id", "ts", "session_key", "event_type"],
    ).to_parquet(d / "b0.parquet")
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).parquet(str(d))
    out = run_available_now(
        funnel_stateful(stream, ["view", "click"], user_col="session_key"),
        checkpoint=str(tmp_path / "ck"), dedupe_keys=["session_key"],
    )
    (row,) = out
    assert row["session_key"] == "sess-a" and row["reached"] == 2


def test_funnel_stateful_state_survives_restart(spark, tmp_path):
    """Two SEPARATE availableNow queries over one checkpoint (a real
    restart, not one query's micro-batches): the step-1 completion from
    the first run must still qualify a click that only arrives in the
    second run. foreachBatch sink — memory sinks refuse checkpoint
    recovery."""
    import pandas as pd

    from docetl_spark.streaming.events import funnel_stateful, read_events_stream

    d = tmp_path / "ev"
    d.mkdir()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    base = 1_700_000_000 * 1_000_000_000
    pd.DataFrame(
        [(1, base + 100, 7, "view", 0.0, "")], columns=cols
    ).to_parquet(d / "b0.parquet")
    ck = str(tmp_path / "ck")

    def drain():
        captured = []
        fun = funnel_stateful(
            read_events_stream(spark, str(d)).select(
                "event_id", "user_id", "ts", "event_type"),
            ["view", "click"],
        )
        (
            fun.writeStream.foreachBatch(lambda df, _id: captured.extend(df.collect()))
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        return captured

    first = drain()
    assert first[-1]["reached"] == 1 and first[-1]["step2_ts"] is None

    pd.DataFrame(
        [(2, base + 200, 7, "click", 0.0, "")], columns=cols
    ).to_parquet(d / "b1.parquet")
    second = drain()
    r = second[-1]
    assert r["reached"] == 2  # view from the FIRST query's state qualified it
    assert r["step1_ts"] == base + 100 and r["step2_ts"] == base + 200


def test_sma_crossover_stateful_state_carries_across_batches(spark, tmp_path):
    """The window buffer and previous above/not-above bit must carry
    across micro-batches: a cross whose flanks straddle the batch
    boundary still signals exactly once, and matches the batch op."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        read_events_stream, run_available_now, scratch_checkpoint_dir,
        sma_crossover_stateful,
    )

    base = 1_700_000_000 * 1_000_000_000
    vals = [1.0, 1.0, 1.0, 1.0, 9.0, 9.0, 1.0, 1.0, 1.0, 1.0]
    d = tmp_path / "ev"
    d.mkdir()
    # split mid-stream so state must persist between batches
    for bi, chunk in enumerate((vals[:5], vals[5:])):
        pd.DataFrame(
            [(bi * 5 + i, base + (bi * 5 + i) * 100, 3, "view", v, "")
             for i, v in enumerate(chunk)],
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        ).to_parquet(d / f"b{bi}.parquet")
    rows = run_available_now(
        sma_crossover_stateful(
            read_events_stream(spark, str(d), max_files_per_trigger=1)
            .select("event_id", "user_id", "ts", "value"),
            short_n=2, long_n=4,
        ),
        checkpoint=scratch_checkpoint_dir("ckpt_smx_t_"),
        output_mode="append",
    )
    got = sorted((r["ts"], r["direction"]) for r in rows)

    # batch twin on the same rows
    from docetl_spark.functions.timeseries import sma_crossover

    bdf = spark.createDataFrame(
        [(3, base + i * 100, i, float(v)) for i, v in enumerate(vals)],
        "user_id long, ts long, event_id long, value double")
    want = sorted((r["ts"], r["direction"]) for r in sma_crossover(
        bdf, keys=["user_id"], ts_col="ts", value_col="value",
        short_n=2, long_n=4, tiebreak="event_id").collect())
    assert got == want and len(got) >= 2
    assert [d_ for _, d_ in got][0] == "golden"


# ------------------------------------------------------ drift twin

def test_dist_drift_stateful_cross_batch_and_reference(spark, tmp_path):
    """State (category count map) survives micro-batches: two files
    drain to the same final TV as one; exact floored-bp arithmetic vs
    the broadcast reference."""
    import pandas as pd

    from docetl_spark.streaming.events import (
        dist_drift_stateful, read_events_stream, run_available_now,
    )
    from pyspark.sql import functions as F

    base = 1_700_000_000 * 1_000_000_000
    d = tmp_path / "ev"
    d.mkdir()
    # one day window: 3 'a' + 1 'b' split across two files
    pd.DataFrame(
        [(1, base, 1, "a", 0.0, ""), (2, base + 1, 1, "a", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b0.parquet")
    pd.DataFrame(
        [(3, base + 2, 1, "a", 0.0, ""), (4, base + 3, 1, "b", 0.0, "")],
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(d / "b1.parquet")
    src = read_events_stream(spark, str(d), max_files_per_trigger=1).select(
        F.expr("(ts - pmod(ts, 86400000000000)) DIV 86400000000000")
        .alias("window_start"),
        "event_type",
    )
    out = run_available_now(
        dist_drift_stateful(src, ref_shares_bp={"a": 5000, "b": 3000, "c": 2000}),
        checkpoint=str(tmp_path / "ck"),
        dedupe_keys=["window_start"], output_mode="update",
        shuffle_partitions=4,
    )
    (row,) = out
    # shares: a = 30000//4 = 7500, b = 10000//4 = 2500
    # tv = (|7500-5000| + |2500-3000| + |0-2000|) // 2 = 5000 // 2 = 2500
    assert (row["n"], row["n_categories"], row["tv_bp"]) == (4, 2, 2500)
