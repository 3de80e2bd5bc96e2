"""Driver-environment parity gates (round-7, VERDICT r6 items 1/2/4).

The per-round driver builds its OWN SparkSession (none of get_spark's
confs: no UTC pin, no Arrow, no AQE tuning) and hashes results through
its own fetch path. Round 6 proved the engine was only verified under
its own session factory: one reproduced crash (drained_df needed the
Arrow conf) and six oracle-typing mismatches (HUGEINT columns,
representation-sensitive under a pandas fetch). These tests pin both
classes:

- the full driver 50-key window replayed in a SUBPROCESS on a vanilla
  ``SparkSession.builder`` session, with the pandas-representation
  cross-check on (``--vanilla --rep``);
- drained_df's conf-independence, directly;
- NULL-bearing long outputs round-trip as ``None``/int, never float
  ``nan`` (the >2^53 float64-corruption class).
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = "/root/testdata/sf0.001"


def test_driver_window_green_on_vanilla_session_with_rep_check():
    """Replay the driver's exact first-50-key window on a session built
    with a bare ``SparkSession.builder`` (subprocess: session state
    cannot leak from the pytest session), including the pandas-
    representation hash comparison. This is the gate that would have
    caught BOTH round-6 failure classes before the driver did."""
    import __spark_entry__ as entry

    keys = list(entry.queries())[:50]
    proc = subprocess.run(
        [sys.executable, "scripts/check_oracle.py", "--vanilla", "--rep",
         SF_DIR, *keys],
        capture_output=True, text=True, cwd=str(REPO), timeout=2400,
    )
    tail = "\n".join(proc.stdout.splitlines()[-25:])
    assert proc.returncode == 0, f"vanilla-session gate failed:\n{tail}\n{proc.stderr[-2000:]}"


def test_drained_df_exact_under_arrow_disabled(spark):
    """Regression: round 6's driver crash (`LongType can not accept
    object nan`) — drained_df must preserve NULLs and >2^53 longs with
    the Arrow conf OFF."""
    from docetl_spark.streaming.events import drained_df

    old = spark.conf.get("spark.sql.execution.arrow.pyspark.enabled")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "false")
    try:
        rows = [
            {"gap_ns": None, "n": 1},
            {"gap_ns": 1700000000123456791, "n": 2},
        ]
        got = drained_df(spark, rows, "gap_ns long, n long").orderBy("n").collect()
        assert got[0]["gap_ns"] is None
        assert got[1]["gap_ns"] == 1700000000123456791
    finally:
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", old)


# Registry queries whose output schema admits NULL in a long column —
# the class where a float64 round-trip would both lose NULL-ness (nan)
# and corrupt values above 2^53 (epoch-nanos, ns gaps).
NULLABLE_LONG_QUERIES = [
    "events_rolling_features",   # gap_ns NULL on each user's first event
    "events_gap_fill",           # value_cents NULL on gap rows
]
# events_funnel admits NULL step ts, but at sf0.001/sf0.01 every user
# happens to complete all steps (the reason it dodged the r6 reds) —
# its NULL path is pinned synthetically below instead.


@pytest.mark.parametrize("qname", NULLABLE_LONG_QUERIES)
def test_nullable_long_outputs_roundtrip_as_none(spark, qname):
    import __spark_entry__ as entry

    from pyspark.sql import types as T

    sdf = entry.queries()[qname](spark, SF_DIR)
    long_cols = [f.name for f in sdf.schema.fields
                 if isinstance(f.dataType, T.LongType)]
    assert long_cols, f"{qname}: expected long columns in output"
    saw_null = False
    for row in sdf.collect():
        for c in long_cols:
            v = row[c]
            if v is None:
                saw_null = True
                continue
            assert isinstance(v, int) and not isinstance(v, bool), (
                f"{qname}.{c}: long column value {v!r} ({type(v).__name__}) "
                "— floats here mean a pandas/Arrow round-trip corrupted the column"
            )
    spark.catalog.clearCache()
    # the test exists FOR the NULL case: if the dataset stops producing
    # one, the query no longer belongs on this list
    assert saw_null, f"{qname}: no NULL long observed — update NULLABLE_LONG_QUERIES"


def test_funnel_null_steps_roundtrip_as_none(spark):
    """Synthetic funnel with an incomplete user: the NULL step ts (an
    epoch-nanos long above 2^53 when present) must collect as None,
    and the completed user's exact nanos must survive."""
    from docetl_spark.functions.timeseries import funnel

    ns = 1_700_000_000_123_456_789
    rows = [
        (1, ns, "view"), (1, ns + 7, "click"), (1, ns + 9, "purchase"),
        (2, ns + 3, "view"),  # never clicks
    ]
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    out = {r["user_id"]: r for r in funnel(
        df, ["view", "click", "purchase"], user_col="user_id",
        ts_col="ts", type_col="event_type",
    ).collect()}
    assert out[1]["step3_ts"] == ns + 9 and out[1]["reached"] == 3
    assert out[2]["step1_ts"] == ns + 3
    assert out[2]["step2_ts"] is None and out[2]["step3_ts"] is None
    assert out[2]["reached"] == 1
