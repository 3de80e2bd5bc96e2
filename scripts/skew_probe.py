"""Key-skew probe for keyed-window / keyed-groupBy operators (r9 VERDICT
ask #7): the round-9 scale probes grew keys UNIFORMLY, but real event
data skews (one bot user = one hot partition). This probe remaps
events.user_id at sf0.1 so one user owns 90% / 99% of rows
(deterministically, via xxhash64 of event_id) and times the ops whose
plans shuffle on the user key.

Reading the output: `skew90 / uniform` and `skew99 / uniform` ratios.
A groupBy-collapse op (mode_by, target_encode) partial-aggregates
map-side, so the hot key arrives pre-collapsed — expect ~1x. A
per-key-window op (bursts, transitions, session_paths) serialises the
hot key's whole timeline into ONE task — wall-time tracking the hot
key share is the hazard signature; >3x is the fix threshold (the
sessionize `hot_key_bucket` escape-hatch pattern).

Usage: python scripts/skew_probe.py            # all ops, 3 layouts
       SKEW_PROBE_OPS=bursts,markov python scripts/skew_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from docetl_spark import get_spark  # noqa: E402

BASE = "/root/testdata/sf0.1"


def timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return round(time.perf_counter() - t0, 2)


def layouts(spark):
    from docetl_spark.sources.readers import (
        normalize_epoch_nanos, set_nanos_conf_if_needed,
    )

    set_nanos_conf_if_needed(spark, f"{BASE}/events.parquet")
    ev = normalize_epoch_nanos(spark.read.parquet(f"{BASE}/events.parquet"))
    out = {"uniform": ev}
    for name, hot_pct in (("skew90", 90), ("skew99", 99)):
        out[name] = ev.withColumn(
            "user_id",
            F.when(F.pmod(F.xxhash64("event_id"), F.lit(100)) < hot_pct,
                   F.lit(0)).otherwise(F.col("user_id")),
        )
    return out


def probe(spark, ev) -> dict:
    only = set(filter(None, os.environ.get("SKEW_PROBE_OPS", "").split(",")))

    def want(name: str) -> bool:
        return not only or name in only

    res = {}
    if want("mode_by"):
        from docetl_spark.functions.stats import mode_by

        res["mode_by"] = timed(lambda: (
            mode_by(ev, "event_type", by=["user_id"]).agg(F.count(F.lit(1))).collect()))
    if want("target_encode"):
        from docetl_spark.functions.stats import target_encode_loo

        res["target_encode"] = timed(lambda: (
            target_encode_loo(
                ev.withColumn("cat", F.col("user_id").cast("string"))
                  .filter(F.col("value").isNotNull()),
                "cat", "value",
            ).agg(F.count(F.lit(1))).collect()))
    if want("bursts"):
        from docetl_spark.functions.timeseries import bursts as _bursts

        res["bursts"] = timed(lambda: (
            _bursts(ev, keys=["user_id"], ts_col="ts",
                    window_ns=3_600_000_000_000).agg(F.count(F.lit(1))).collect()))
    if want("markov"):
        from docetl_spark.functions.timeseries import transition_probs

        res["markov"] = timed(lambda: (
            transition_probs(ev, keys=["user_id"], ts_col="ts",
                             state_col="event_type", tiebreak="event_id")
            .agg(F.count(F.lit(1))).collect()))
    if want("session_paths"):
        from docetl_spark.functions.timeseries import session_paths

        res["session_paths"] = timed(lambda: (
            session_paths(
                ev.withColumn("sid", F.lit(1)),
                session_keys=["user_id", "sid"], state_col="event_type",
                ts_col="ts", tiebreak="event_id",
            ).agg(F.count(F.lit(1))).collect()))
    if want("changepoint"):
        from docetl_spark.functions.timeseries import changepoint_mean_shift

        res["changepoint"] = timed(lambda: (
            changepoint_mean_shift(ev, keys=["user_id"], ts_col="ts",
                                   value_col="value", tiebreak="event_id")
            .agg(F.count(F.lit(1))).collect()))
    if want("runs"):
        from docetl_spark.functions.timeseries import runs_by

        res["runs"] = timed(lambda: (
            runs_by(ev, keys=["user_id"], ts_col="ts", value_col="value",
                    tiebreak="event_id").agg(F.count(F.lit(1))).collect()))
    return res


def main():
    spark = get_spark("skew-probe", shuffle_partitions=32)
    ls = layouts(spark)
    # warm pass on uniform (JVM/worker spin-up, parquet footer caches)
    probe(spark, ls["uniform"])
    report = {}
    for name, ev in ls.items():
        report[name] = probe(spark, ev)
    for s in ("skew90", "skew99"):
        report[f"{s}_ratio"] = {
            k: round(report[s][k] / max(report["uniform"][k], 1e-9), 2)
            for k in report["uniform"]
        }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
