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
    """Repartition scan-shaped ``df`` up to the session's default
    parallelism when the plan yields fewer partitions — and leave it
    alone otherwise. Canonical implementation behind
    ``operators.semantic.widen_for_model_stage`` (model-call stages) and
    the CPU-heavy Arrow-UDF stages (shingling, MinHash permutations,
    embedding math).

    A 100 TB scan arrives in thousands of input splits and never takes
    the repartition branch; a small or single-row-group parquet file
    arrives in ONE partition (below maxPartitionBytes Spark doesn't
    split it), which would serialize every downstream Python batch onto
    a single core while the rest sit idle. Deliberately skipped when the
    plan already contains a width-giving op (join/aggregate/sort/window/
    exchange): those inputs are at least ``spark.sql.shuffle.partitions``
    wide, the repartition would be a pointless full shuffle at scale,
    and even inspecting ``rdd.getNumPartitions()`` on such a plan can
    materialize AQE query stages. Row-local semantics make the
    round-robin reshuffle result-invariant."""
    if df.isStreaming:
        return df  # .rdd is invalid on streams; micro-batch width rules apply
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism or 8
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return df
    # Node-header-anchored match: plan nodes print at line starts after
    # the tree prefix ("+- ", ":  +- ", ...). A bare substring test would
    # false-positive on user data (a column literal containing "Join")
    # and silently skip the widening.
    import re

    if re.search(
        r"^[\s+:|-]*(?:Join|Aggregate|Sort|Window|Repartition|RepartitionByExpression|Exchange)\b",
        plan,
        re.MULTILINE,
    ):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def widen_scan_for_agg(df, *keys):
    """Hash-repartition a scan-shaped ``df`` on the grouping ``keys`` it
    is about to be aggregated on, IF the scan arrives narrower than the
    session's shuffle parallelism — and leave it alone otherwise.

    Why (guide §2.2/§6, r12): a single-row-group parquet file scans as
    ONE task no matter how files are split, so the map-side partial
    aggregation (and any pre-exchange projection/explosion) of a
    downstream groupBy runs serially on one core. Hash-repartitioning on
    the SAME key the aggregation needs costs no extra exchange — the
    groupBy reuses the partitioning (EnsureRequirements sees compatible
    hashpartitioning) — and moves the aggregation work behind the
    exchange at full width. The partition count is the session's
    ``spark.sql.shuffle.partitions`` (scales with $SPARK_GRAFT_CPUS /
    cluster sizing), passed explicitly so AQE does not coalesce the
    small local shuffle back to one task (measured: collect_set edge
    build 1.11 s -> 0.59 s at sf0.1).

    A 100 TB scan arrives in thousands of splits and never takes the
    branch — the plan is then byte-identical to the un-widened one.
    Same no-width-op plan guard as ``widen_for_udf``: post-join/agg
    inputs are already exchange-wide."""
    if df.isStreaming:
        return df
    spark = df.sparkSession
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    try:
        plan = df._jdf.queryExecution().optimizedPlan().toString()
    except Exception:
        return df
    import re

    if re.search(
        r"^[\s+:|-]*(?:Join|Aggregate|Sort|Window|Repartition|RepartitionByExpression|Exchange)\b",
        plan,
        re.MULTILINE,
    ):
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, *keys)
    return df


def arrow_literal_ok(schema) -> bool:
    """True when every field of ``schema`` is a flat atomic NON-TEMPORAL
    type the Arrow literal-frame path (``spark.createDataFrame(pa.Table
    .from_pylist(...))`` -> JVM LocalRelation) is known value-exact for.

    Why an explicit allow-list (ADVICE r11): the Arrow sites fall back
    on Exception, which catches hard errors but not silent VALUE
    differences — naive-datetime/timezone handling differs between the
    Arrow conversion and the pickled-row path without raising, and
    nested types change representation. Timestamps, dates, intervals
    and nested types take the portable pickled path explicitly."""
    allowed = {"string", "long", "integer", "short", "byte", "double",
               "float", "boolean", "binary"}
    for f in schema.fields:
        t = f.dataType.typeName()
        if t in allowed or t.startswith("decimal"):
            continue
        return False
    return True


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
