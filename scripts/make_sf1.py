"""Emulate an sf1 (10x the bench's sf0.1) dataset for the scale-slice
bench (BENCH_SF1_*.json).

Replication scheme — facts replicate 10x with CONSISTENT key offsets so
join cardinalities scale linearly (each replica is a self-contained
shard of the key space); dimensions (region, nation) stay fixed, like a
real scale-out where the dim tables remain broadcast-sized:

- customer/orders/lineitem/supplier/part: primary/foreign keys offset by
  replica * STRIDE (stride > max key), nationkeys untouched.
- events: event_id/user_id offset -> 10x users with the original per-user
  history each (grouped-window work scales by GROUP COUNT, the realistic
  axis; per-task state stays constant).
- documents: doc_id offset AND ~70% of words deterministically rewritten
  per replica (hash-gated suffix) so cross-replica Jaccard falls to
  ~0.18, BELOW the LSH band-collision knee — a naive copy would hand
  minhash/fuzzy-dedup a degenerate corpus where every doc has 9 exact
  twins; even a 30% rewrite (Jaccard ~0.54) left a ~94% per-band-set
  candidate probability at bands=32/r=4 and inflated candidates 21x
  (measured), which benchmarks the DATA's duplicate density, not the
  plan. At 70% the per-replica dup structure matches sf0.1's.
- embeddings: vec_id offset; vectors perturbed by a small deterministic
  per-replica rotation-free jitter (first component) so ANN answers are
  not 10-way ties.

Usage: python scripts/make_sf1.py [out_dir]   (default /tmp/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from docetl_spark import get_spark

SRC = "/root/testdata/sf0.1"
REPLICAS = 10
STRIDE = 10_000_000  # > every key in sf0.1


def _replicate(df, key_offsets: dict[str, int], extra=None):
    """Union REPLICAS copies; each key column in ``key_offsets`` gets
    replica * STRIDE added (one explode, no driver loop over unions)."""
    r = F.explode(F.sequence(F.lit(0), F.lit(REPLICAS - 1))).alias("_rep")
    out = df.select("*", r)
    for col in key_offsets:
        out = out.withColumn(col, F.col(col) + F.col("_rep").cast("long") * STRIDE)
    if extra is not None:
        out = extra(out)
    return out.drop("_rep")


def _perturb_text(out):
    """Rewrite ~70% of words per non-zero replica (deterministic hash
    gate) so cross-replica Jaccard lands ~0.18, below the LSH knee."""
    words = F.split(F.col("text"), " ")
    rewritten = F.transform(
        words,
        lambda w, i: F.when(
            (F.col("_rep") > 0)
            & (F.pmod(F.xxhash64(w, i, F.col("_rep")), F.lit(10)) < 7),
            F.concat(w, F.lit("x"), F.col("_rep").cast("string")),
        ).otherwise(w),
    )
    return out.withColumn("text", F.array_join(rewritten, " "))


def _jitter_embedding(out):
    jitter = (F.pmod(F.col("_rep").cast("long") * 7919, F.lit(1000)).cast("double") / 1e5)
    return out.withColumn(
        "embedding",
        F.concat(
            F.array(F.element_at("embedding", 1) + jitter),
            F.slice("embedding", 2, 100_000),
        ),
    )


def main(out_dir: str = "/tmp/sf1") -> None:
    spark = get_spark("make-sf1", shuffle_partitions=32)
    plans = {
        "region": {},
        "nation": {},
        "customer": {"c_custkey": 1},
        "supplier": {"s_suppkey": 1},
        "part": {"p_partkey": 1},
        "orders": {"o_orderkey": 1, "o_custkey": 1},
        "lineitem": {"l_orderkey": 1, "l_partkey": 1, "l_suppkey": 1},
        "events": {"event_id": 1, "user_id": 1},
        "documents": {"doc_id": 1},
        "embeddings": {"vec_id": 1},
    }
    extras = {"documents": _perturb_text, "embeddings": _jitter_embedding}
    os.makedirs(out_dir, exist_ok=True)
    for table, keys in plans.items():
        df = spark.read.parquet(f"{SRC}/{table}.parquet")
        out = df if not keys else _replicate(df, keys, extras.get(table))
        dest = f"{out_dir}/{table}.parquet"
        # r12: the old ``coalesce(8)`` was a silent no-op — the sf0.1
        # source is ONE single-row-group file, so the scan is ONE
        # partition and coalesce cannot RAISE the count. Every sf1 table
        # therefore landed as one unsplittable row group, and every
        # sf1 query paid a serial scan+decompress (3s for documents'
        # text column, more for lineitem) that measured the FIXTURE,
        # not the plan — real 100 TB inputs arrive in thousands of
        # splits. repartition() actually widens; 16 files for the
        # replicated fact tables keeps files ~0.5-5 MB (split-friendly,
        # still few enough that listing stays trivial).
        n_files = 16 if keys else 1
        out.repartition(n_files).write.mode("overwrite").parquet(dest)
        print(f"{table}: {spark.read.parquet(dest).count()} rows -> {dest}")
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1")
