"""Growth probe for the wave-5 graph family: run the part co-order
graph queries (triangles, pagerank, jaccard, components, label
propagation) and the new rank/variance stats at sf0.01, sf0.1 and the
emulated sf1 (scripts/make_sf1.py — 10x orders with offset part keys,
i.e. 10 disjoint replicas of the sf0.1 graph), and report wall ratios
per 10x step.

What "healthy" looks like: the co-order edge build and every
aggregation are linear in lineitem rows; the triangle wedge join is
O(m^1.5) IN THE WORST CASE but linear here (replicas are disjoint, so
m and the wedge count both scale 10x); pagerank/label-prop are O(m)
per fixed iteration. Ratios well under 10x at each step = fixed
per-stage overhead still amortizing; ~10x = honestly linear; >>10x =
a superlinear stage (finding).

Single Spark workload per measurement window (PLANS.md probe
hygiene): run this alone.

Usage: python scripts/probe_graphs.py [out_json]
       (default artifacts/PROBE_GRAPH_r11.json; requires /tmp/sf1)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from docetl_spark import get_spark  # noqa: E402

QUERIES = [
    "part_triangles", "part_pagerank", "part_components",
    "part_jaccard", "part_label_prop",
    "events_kruskal", "events_mutual_info", "orders_anova",
]


def main(out_path: str = "artifacts/PROBE_GRAPH_r11.json") -> None:
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark(
        "docetl-spark-probe-graphs",
        extra_conf={"spark.ui.showConsoleProgress": "false",
                    "spark.driver.memory": "8g"},
    )
    sfs = [("sf0.01", "/root/testdata/sf0.01"),
           ("sf0.1", "/root/testdata/sf0.1"),
           ("sf1", os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1"))]
    out: dict = {"queries": {}, "note": (
        "emulated sf1 = 10 disjoint key-offset replicas of sf0.1 "
        "(make_sf1.py); graph work should scale ~linearly in lineitem "
        "rows at every step")}
    for name in QUERIES:
        rec = {}
        for label, d in sfs:
            # warm the query shape once at the smallest sf only
            t0 = time.time()
            n = qs[name](spark, d).count()
            rec[label] = {"sec": round(time.time() - t0, 2), "rows": n}
            spark.catalog.clearCache()
        r1 = rec["sf0.1"]["sec"] / max(rec["sf0.01"]["sec"], 1e-9)
        r2 = rec["sf1"]["sec"] / max(rec["sf0.1"]["sec"], 1e-9)
        rec["ratio_10x_a"] = round(r1, 2)
        rec["ratio_10x_b"] = round(r2, 2)
        out["queries"][name] = rec
        print(f"{name}: sf0.01 {rec['sf0.01']['sec']}s -> sf0.1 "
              f"{rec['sf0.1']['sec']}s ({r1:.1f}x) -> sf1 "
              f"{rec['sf1']['sec']}s ({r2:.1f}x)", flush=True)
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print("wrote", out_path)


if __name__ == "__main__":
    main(*sys.argv[1:])
