"""SparkSession factory tuned for the docetl_spark engine.

Defaults follow the scale posture in SURVEY.md §7.4: AQE on (runtime
re-planning + skew-join handling), Arrow enabled for the Pandas-UDF slow
path, shuffle partitions sized to the local core count rather than the
200 default (on a real cluster this should be ~2-3x total executor
cores; AQE coalesces down as needed).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "docetl-spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(master or f"local[{cpus}]")
        .appName(app_name)
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def widen_for_udf(df, min_partitions: int | None = None):
    """Repartition ``df`` up to the session's default parallelism when
    the current plan yields fewer partitions — and leave it alone
    otherwise.

    A 100 TB scan arrives in thousands of input splits and never takes
    this branch; a small or single-row-group parquet file arrives in ONE
    partition, which would serialize every downstream Arrow/pandas-UDF
    batch onto a single core while 31 sit idle. CPU-heavy UDF stages
    (shingling, MinHash permutations, embedding math) should be widened
    to the core count first — a one-time round-robin shuffle of the
    narrow input is orders of magnitude cheaper than losing the
    parallelism. Partition count is read from the physical plan's file
    listing (no job is triggered)."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Load the driver's parquet tables as a dict of DataFrames.

    Tables: region nation customer supplier part orders lineitem events
    documents embeddings (TESTDATA.md).
    """
    names = names or [
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    ]
    return {n: spark.read.parquet(f"{sf_dir}/{n}.parquet") for n in names}
