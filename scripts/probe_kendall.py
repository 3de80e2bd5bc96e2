"""Growth probe for the O(n log n) Kendall/Mann-Kendall rewrite
(VERDICT r10 ask #2 'done' criterion): time mann_kendall_by and
kendall_tau_by on ONE group at n, 10n, 100n rows and report the wall
ratios. The old pairwise join was O(n²) (raising the guard 100× would
have cost 10,000× the pairs); the inversion-count path should land
near-linear wall ratios (n log n / Arrow overhead) at both steps.

Single Spark workload per measurement window (PLANS.md probe hygiene):
run this alone.

Usage: python scripts/probe_kendall.py [n0] (default 5000)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from docetl_spark import get_spark  # noqa: E402
from docetl_spark.functions.mlstats import kendall_tau_by, mann_kendall_by  # noqa: E402


def one(spark, n: int) -> dict:
    # deterministic value stream with heavy ties (mod grid) — the worst
    # decomposition shape; single group = the one-task bound being probed
    df = spark.range(n).select(
        F.lit(1).alias("g"),
        F.col("id").alias("t"),
        ((F.col("id") * 37) % 1009).cast("double").alias("v"),
    )
    df = df.cache()
    df.count()
    t0 = time.time()
    mk = mann_kendall_by(df, "t", "v", by=["g"], max_group_rows=10**9).collect()
    t_mk = time.time() - t0
    t0 = time.time()
    kt = kendall_tau_by(df, "t", "v", by=["g"], max_group_rows=10**9).collect()
    t_kt = time.time() - t0
    df.unpersist()
    assert mk[0]["n"] == n and kt[0]["n"] == n
    return {"n": n, "mann_kendall_sec": round(t_mk, 3),
            "kendall_sec": round(t_kt, 3),
            "s": int(mk[0]["s"]), "tau_a_bp": int(kt[0]["tau_a_bp"])}


def main(n0: int = 5000, out_path: str = "artifacts/PROBE_KENDALL_r11.json") -> None:
    spark = get_spark(
        "docetl-spark-probe-kendall", shuffle_partitions=8,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    steps = [one(spark, n0), one(spark, n0 * 10), one(spark, n0 * 100)]
    ratios = {
        "mk_10x": round(steps[1]["mann_kendall_sec"] / steps[0]["mann_kendall_sec"], 2),
        "mk_100x": round(steps[2]["mann_kendall_sec"] / steps[0]["mann_kendall_sec"], 2),
        "kt_10x": round(steps[1]["kendall_sec"] / steps[0]["kendall_sec"], 2),
        "kt_100x": round(steps[2]["kendall_sec"] / steps[0]["kendall_sec"], 2),
    }
    payload = {"steps": steps, "ratios": ratios,
               "note": "single group; old pairwise path would be 100x/10000x work"}
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 5000)
