"""Profile the availableNow drain floor (r12 VERDICT #3/#4): run a
streaming query end-to-end, print per-micro-batch durationMs breakdown
(queryPlanning, walCommit, commitOffsets, getBatch, addBatch,
latestOffset) plus the wall time OUTSIDE micro-batches (query start/stop
protocol) — the part a shared-session scheme could amortize.

Usage: python scripts/probe_stream.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from docetl_spark import get_spark
from docetl_spark.streaming import events as stream_ops

# monkey-patch run_available_now to capture the StreamingQuery progress
_orig = stream_ops.run_available_now
LAST = {}


def traced(stream_df, **kw):
    import uuid

    spark = stream_df.sparkSession
    old_parts = None
    sp = kw.get("shuffle_partitions")
    if sp is not None:
        old_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(sp))
    name = f"mem_{uuid.uuid4().hex[:8]}"
    t0 = time.perf_counter()
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(kw.get("output_mode", "update"))
            .option("checkpointLocation", kw["checkpoint"])
            .trigger(availableNow=True)
            .start()
        )
        t_started = time.perf_counter()
        q.awaitTermination()
        t_done = time.perf_counter()
        prog = [json.loads(p.json) for p in q.recentProgress]
    finally:
        if old_parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", old_parts)
    LAST["start_sec"] = round(t_started - t0, 3)
    LAST["drain_sec"] = round(t_done - t_started, 3)
    LAST["batches"] = [
        {
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "durationMs": p.get("durationMs"),
        }
        for p in prog
    ]
    tbl = spark.table(name)
    rows = [r.asDict() for r in tbl.collect()] if tbl.schema else []
    try:
        rows = tbl.toArrow().to_pylist()
    except Exception:
        pass
    dk = kw.get("dedupe_keys")
    if dk:
        last = {}
        for r in rows:
            last[tuple(r[k] for k in dk)] = r
        rows = list(last.values())
    return rows


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("probe-stream", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1000).agg(F.sum("id")).collect()
    # same streaming warmup as bench.py
    import shutil
    import tempfile

    warm = tempfile.mkdtemp(prefix="probe_warm_")
    try:
        spark.range(10).write.mode("overwrite").parquet(f"{warm}/in")
        tiny = spark.read.parquet(f"{warm}/in")
        (
            spark.readStream.schema(tiny.schema).parquet(f"{warm}/in")
            .groupBy((F.col("id") % 3).alias("k")).count()
            .writeStream.format("memory").queryName("warm")
            .outputMode("update").option("checkpointLocation", f"{warm}/ck")
            .trigger(availableNow=True).start().awaitTermination()
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    stream_ops.run_available_now = traced
    qs = entry.queries()
    for name in sys.argv[1:]:
        for rep in range(2):
            LAST.clear()
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            df.agg(F.count(F.lit(1)), F.max(F.xxhash64(*[F.col(c) for c in df.columns]))).collect()
            total = time.perf_counter() - t0
            spark.catalog.clearCache()
            batches = LAST.get("batches", [])
            in_batch = sum(
                (b["durationMs"] or {}).get("triggerExecution", 0) for b in batches
            ) / 1000.0
            print(f"\n=== {name} rep{rep}: total={total:.2f}s "
                  f"start={LAST.get('start_sec')}s drain={LAST.get('drain_sec')}s "
                  f"in-batch={in_batch:.2f}s outside-batch={LAST.get('drain_sec', 0) + LAST.get('start_sec', 0) - in_batch:.2f}s")
            for b in batches:
                print(f"  batch {b['batchId']}: rows={b['numInputRows']} {b['durationMs']}")


if __name__ == "__main__":
    main()
