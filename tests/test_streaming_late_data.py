"""Late-data CONTRACT tests for the streaming twins.

The stateful twins document cross-batch late data as "out of contract";
these tests turn that prose into regression guards by pinning what a
late event (arriving in a later micro-batch with an EARLIER event time)
actually DOES in each operator:

- windowed_rollup: within-watermark late amends its window; an event
  older than the watermark is DROPPED (its window was finalized and
  evicted, never amended).
- stream_dedup: a duplicate key arriving within the watermark horizon
  is dropped — no second emission.
- sessionize_stateful: a late event JOINS the open session at arrival
  (count grows, end regresses to the late timestamp); sessions are
  never retroactively split.
- transitions_stateful: rows fold in (ts, id) order WITHIN a batch, but
  across batches in arrival order — a late event emits a transition
  FROM the carried last state, and the carried last_ts regresses.
- running_totals_stateful: the cumulative sum is arrival-ordered across
  batches — a late event's cum_value includes later-ts events that
  arrived earlier; earlier emissions are never amended.

Harness: two availableNow drains over a growing parquet directory with
a shared checkpoint (foreachBatch — memory sinks refuse checkpoint
recovery), the established cross-batch pattern from test_streaming.py.
"""

import pandas as pd
import pytest

from docetl_spark.streaming.events import read_events_stream

COLS = ["event_id", "ts", "user_id", "event_type", "value", "props"]
BASE = 1_700_000_000 * 1_000_000_000  # epoch-ns
HOUR = 3_600 * 1_000_000_000


def _writer(d):
    d.mkdir()

    def write(batch_id, rows):
        pd.DataFrame(rows, columns=COLS).to_parquet(d / f"b{batch_id}.parquet")

    return write


def _drain(spark, src_dir, ck, build, output_mode="update"):
    captured = []
    ev = read_events_stream(spark, str(src_dir))
    out = build(ev)
    (
        out.writeStream.foreachBatch(lambda df, _id: captured.extend(df.collect()))
        .outputMode(output_mode)
        .option("checkpointLocation", str(ck))
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return captured


def test_windowed_rollup_drops_older_than_watermark_amends_within(spark, tmp_path):
    from docetl_spark.streaming.events import windowed_rollup

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    build = lambda ev: windowed_rollup(ev, window="1 hour", watermark="2 hours")

    # batch 0: events at t0 and t0+10h -> watermark after the batch is
    # max(event_time) - 2h = t0+8h
    write(0, [(1, BASE, 7, "a", 1.0, ""), (2, BASE + 10 * HOUR, 7, "a", 1.0, "")])
    first = _drain(spark, tmp_path / "ev", ck, build)
    assert {r["n"] for r in first} == {1}
    windows_b0 = {r["window_start"] for r in first}
    assert len(windows_b0) == 2

    # batch 1: one event 1h after t0 (BELOW the t0+8h watermark -> its
    # window was evicted; the event must be DROPPED, not re-aggregated)
    # and one at t0+9h (within watermark -> amends/creates its window)
    write(1, [(3, BASE + 1 * HOUR, 7, "a", 1.0, ""),
              (4, BASE + 9 * HOUR, 7, "a", 5.0, "")])
    second = _drain(spark, tmp_path / "ev", ck, build)
    starts = {r["window_start"]: r for r in second}
    assert not any(s.hour == pd.Timestamp(BASE + HOUR, unit="ns").hour and r["n"] > 0
                   for s, r in starts.items() if s in windows_b0), second
    # the t0+9h event produced exactly one updated window with its value
    in_time = [r for r in second if r["value_cents"] == 500]
    assert len(in_time) == 1 and in_time[0]["n"] == 1
    # the late t0+1h event appears NOWHERE in the second drain's updates
    assert all(r["value_cents"] == 500 for r in second), second


def test_stream_dedup_drops_duplicate_within_watermark(spark, tmp_path):
    from docetl_spark.streaming.events import stream_dedup

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    build = lambda ev: stream_dedup(
        ev.select("event_id", "user_id", "event_type", "event_time"),
        keys=["user_id", "event_type"], watermark="2 hours")

    write(0, [(1, BASE, 7, "a", 1.0, "")])
    first = _drain(spark, tmp_path / "ev", ck, build, output_mode="append")
    assert [r["event_id"] for r in first] == [1]

    # batch 1: same (user, type) arriving 30 min later — within the
    # 2h horizon -> dropped; a NEW key passes through
    write(1, [(2, BASE + HOUR // 2, 7, "a", 1.0, ""),
              (3, BASE + HOUR // 2, 8, "b", 1.0, "")])
    second = _drain(spark, tmp_path / "ev", ck, build, output_mode="append")
    assert [r["event_id"] for r in second] == [3]


def test_sessionize_stateful_late_event_joins_open_session(spark, tmp_path):
    from docetl_spark.streaming.events import sessionize_stateful

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    build = lambda ev: sessionize_stateful(ev, gap_seconds=1800)

    t0 = BASE // 1_000_000_000  # session epochs are seconds
    write(0, [(1, BASE + 100 * 10**9, 7, "a", 1.0, ""),
              (2, BASE + 200 * 10**9, 7, "a", 1.0, "")])
    first = {(r["user_id"], r["session_id"]): r for r in _drain(spark, tmp_path / "ev", ck, build)}
    s0 = first[(7, 0)]
    assert s0["n_events"] == 2 and s0["end_epoch"] == t0 + 200

    # batch 1: a LATE event at t0+150 (inside the open session's span,
    # gap to carried end = -50s < gap_seconds): pinned behavior — it
    # joins the open session at arrival, count grows, end REGRESSES to
    # the late timestamp; the session is not retroactively split
    write(1, [(3, BASE + 150 * 10**9, 7, "a", 1.0, "")])
    second = {(r["user_id"], r["session_id"]): r for r in _drain(spark, tmp_path / "ev", ck, build)}
    s0b = second[(7, 0)]
    assert s0b["n_events"] == 3
    assert s0b["end_epoch"] == t0 + 150      # end regressed — documented contract
    assert s0b["start_epoch"] == t0 + 100


def test_transitions_stateful_late_event_transitions_from_carried_state(spark, tmp_path):
    from docetl_spark.streaming.events import transitions_stateful

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    build = lambda ev: transitions_stateful(
        ev.select("event_id", "user_id", "event_type", "ts"))

    write(0, [(1, BASE + 1_000, 7, "login", 1.0, ""),
              (2, BASE + 2_000, 7, "browse", 1.0, "")])
    first = [(r["from_state"], r["to_state"]) for r in
             _drain(spark, tmp_path / "ev", ck, build, output_mode="append")]
    assert first == [("login", "browse")]

    # batch 1: late event with ts BETWEEN the two batch-0 events.
    # Pinned: cross-batch folding is ARRIVAL-ordered — the late event
    # transitions FROM the carried 'browse' (not from 'login' as a
    # ts-ordered replay would), and nothing already emitted is amended.
    write(1, [(3, BASE + 1_500, 7, "late_click", 1.0, "")])
    second = [(r["from_state"], r["to_state"]) for r in
              _drain(spark, tmp_path / "ev", ck, build, output_mode="append")]
    assert second == [("browse", "late_click")]


def test_running_totals_stateful_late_event_sums_at_arrival(spark, tmp_path):
    from docetl_spark.streaming.events import running_totals_stateful

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    build = lambda ev: running_totals_stateful(
        ev.select("event_id", "user_id", "ts", "value"))

    write(0, [(1, BASE + 1_000, 7, "a", 1.0, ""),
              (2, BASE + 3_000, 7, "a", 2.0, "")])
    first = {r["event_id"]: r["cum_value"] for r in
             _drain(spark, tmp_path / "ev", ck, build, output_mode="append")}
    assert first == {1: 100, 2: 300}

    # batch 1: late event at ts between the two — pinned: it adds to the
    # CARRIED total (arrival order), so its cum_value includes event 2's
    # later-ts value; event 2's earlier emission is never amended
    write(1, [(3, BASE + 2_000, 7, "a", 4.0, "")])
    second = {r["event_id"]: r["cum_value"] for r in
              _drain(spark, tmp_path / "ev", ck, build, output_mode="append")}
    assert second == {3: 700}


def test_funnel_stateful_cross_batch_late_first_step_counts_forward_only(spark, tmp_path):
    """A step-1 event arriving AFTER step-2 was folded cannot
    retroactively complete the funnel — but it does open a fresh
    progression for FUTURE events (forward-only semantics)."""
    from docetl_spark.streaming.events import funnel_stateful

    write = _writer(tmp_path / "ev")
    ck = tmp_path / "ck"
    steps = ["view", "buy"]
    build = lambda ev: funnel_stateful(
        ev.select("event_id", "user_id", "event_type", "ts"), steps=steps)

    # batch 0: only step 2 — no progression
    write(0, [(1, BASE + 2_000, 7, "buy", 1.0, "")])
    first = _drain(spark, tmp_path / "ev", ck, build)
    reached_first = {r["user_id"]: r["reached"] for r in first}
    assert reached_first.get(7, 0) == 0

    # batch 1: the LATE step-1 (earlier ts) then a new step-2 (later ts):
    # the late view opens the funnel at arrival and the following buy
    # completes it — late data counts forward, never backward
    write(1, [(2, BASE + 1_000, 7, "view", 1.0, ""),
              (3, BASE + 3_000, 7, "buy", 1.0, "")])
    second = {r["user_id"]: r["reached"] for r in _drain(spark, tmp_path / "ev", ck, build)}
    assert second[7] == 2
