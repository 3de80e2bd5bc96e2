"""Round-11 optimization measurement harness.

Isolates declared queries for the optimization loop (guide §1):

  * ``explain`` — write ``.explain("formatted")`` for each query to
    plans/r11/<query>_<tag>.txt and print a one-line plan-shape summary
    (Exchange count, join strategies, Python-boundary nodes,
    PushedFilters presence).
  * ``time`` — time each query in isolation with the SAME action the
    bench uses (count + xxhash64-of-all-columns agg: materializes every
    column of every row, like the noop sink, while staying comparable
    with the BENCH_r* series), plus an optional true noop-sink rep.

Usage:
  python scripts/opt_measure.py explain before q1_pricing_summary ...
  python scripts/opt_measure.py time q1_pricing_summary ...
  python scripts/opt_measure.py explain after --top 25
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from docetl_spark import get_spark

REPO = Path(__file__).resolve().parent.parent
PLANS_DIR = REPO / "plans" / os.environ.get("OPT_PLANS_ROUND", "r12")


def plan_summary(txt: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", txt))
    joins = re.findall(
        r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
        r"BroadcastNestedLoopJoin|CartesianProduct)\b", txt)
    py = re.findall(r"\b(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|MapInArrow)\b", txt)
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", txt))
    from collections import Counter
    return (
        f"exchanges={n_ex} joins={dict(Counter(joins))} "
        f"python={dict(Counter(py))} scans_with_pushed_filters={pushed}"
    )


def main() -> None:
    mode = sys.argv[1]
    rest = sys.argv[2:]
    tag = None
    if mode == "explain":
        tag, rest = rest[0], rest[1:]
    names: list[str] = []
    if rest and rest[0] == "--top":
        n = int(rest[1])
        b = json.load(open(REPO / "bench_out.json"))
        qs = sorted(((k, v) for k, v in b["queries"].items() if v),
                    key=lambda kv: -kv[1])
        names = [k for k, _ in qs[:n]]
        names += rest[2:]
    else:
        names = rest

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("opt-measure",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.range(1000).agg(F.sum("id")).collect()  # codegen warmup
    qfns = entry.queries()
    PLANS_DIR.mkdir(parents=True, exist_ok=True)
    reps = int(os.environ.get("OPT_MEASURE_REPS", "3"))

    out = {}
    for name in names:
        fn = qfns[name]
        if mode == "explain":
            df = fn(spark, sf_dir)
            if df.isStreaming:
                txt = "(streaming DataFrame — no batch physical plan; see code)"
            else:
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted")
            (PLANS_DIR / f"{name}_{tag}.txt").write_text(txt)
            print(f"{name}: {plan_summary(txt)}")
            spark.catalog.clearCache()
        elif mode == "time":
            runs = []
            for _ in range(reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                spark.sparkContext.setJobDescription(f"opt:{name}")
                df.agg(F.count(F.lit(1)),
                       F.max(F.xxhash64(*[F.col(c) for c in df.columns]))
                       ).collect()
                runs.append(time.perf_counter() - t0)
                spark.catalog.clearCache()
            out[name] = [round(r, 3) for r in runs]
            print(f"{name}: min={min(runs):.3f} runs={[round(r,3) for r in runs]}")
    if out:
        print(json.dumps(out))


if __name__ == "__main__":
    main()
