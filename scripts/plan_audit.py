"""Regenerate artifacts/PLAN_AUDIT_r11.json: plan-shape metrics for
every non-streaming declared query — UNIQUE physical-operator counts
(parsed from the formatted explain's ``Operator (id)`` tree lines, so
repeated tree references and InMemoryRelation-embedded child plans are
counted once per operator id), join strategies, Python-boundary nodes,
and scans with pushed filters.

Usage: python scripts/plan_audit.py [out_json]
"""

from __future__ import annotations

import json
import os
import re
import sys
from collections import Counter
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

import __spark_entry__ as entry
from docetl_spark import get_spark

OP_LINE = re.compile(r"([A-Za-z][A-Za-z0-9]*)[^()\n]*\((\d+)\)\s*$")
JOINS = {"BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
         "BroadcastNestedLoopJoin", "CartesianProduct"}
PY = {"BatchEvalPython", "ArrowEvalPython", "MapInPandas",
      "FlatMapGroupsInPandas", "MapInArrow"}


def audit(txt: str) -> dict:
    ops: dict[int, str] = {}
    for line in txt.splitlines():
        m = OP_LINE.search(line)
        if m:
            ops.setdefault(int(m.group(2)), m.group(1))
    names = Counter(ops.values())
    return {
        "ex": names.get("Exchange", 0),
        "joins": {k: v for k, v in names.items() if k in JOINS},
        "py": {k: v for k, v in names.items() if k in PY},
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", txt)),
    }


def main(out_path: str) -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan-audit",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    out: dict[str, dict] = {}
    for name, fn in entry.queries().items():
        df = fn(spark, sf_dir)
        if df.isStreaming:
            continue
        txt = spark._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        out[name] = audit(txt)
        spark.catalog.clearCache()
    json.dump(out, open(out_path, "w"), indent=1, sort_keys=True)
    buckets = Counter()
    for v in out.values():
        e = v["ex"]
        buckets["0-4" if e < 5 else "5-9" if e < 10 else
                "10-14" if e < 15 else "15+"] += 1
    print(json.dumps({"n": len(out), "exchange_buckets": dict(buckets)}))
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "artifacts/PLAN_AUDIT_r11.json")
