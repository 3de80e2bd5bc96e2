"""End-to-end event-analytics walkthrough over the SemanticFrame verbs:
profile key skew, pick the right sessionize/rolling plan from it, then
run funnel / pivot / quantile reporting — the "know your distribution
before you shuffle" workflow the hot_key_bucket escape hatches assume.

Run directly (pure deterministic ops, no model backend, no network):

    PYTHONPATH=/root/repo python examples/event_analytics.py

or import ``main`` from a test with an injected SparkSession.
"""

from __future__ import annotations


def main(spark=None, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from pyspark.sql import functions as F

    from docetl_spark import SemanticFrame, get_spark
    from docetl_spark.sources.readers import normalize_epoch_nanos

    own_spark = spark is None
    spark = spark or get_spark("event-analytics-example")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = SemanticFrame(
        normalize_epoch_nanos(spark.read.parquet(f"{sf_dir}/events.parquet"))
    )

    # 1. Profile the shuffle key BEFORE choosing a plan: share_bp of the
    #    top user tells whether the default per-key window is safe or the
    #    hot_key_bucket variant is needed.
    skew = ev.skew_profile(["user_id"], top=5).df.collect()
    hot_share_bp = skew[0]["share_bp"]

    # 2. Funnel conversion: first view -> click -> purchase per user.
    fun = ev.funnel(["view", "click", "purchase"], tiebreak="event_id")
    conv = fun.df.groupBy("reached").count().orderBy("reached").collect()

    # 3. Behaviour pivot + exact value quantiles for the purchase step.
    pivot = (
        fun.df.filter(F.col("reached") >= 3)
        .join(ev.df, "user_id")
        .filter(F.col("event_type") == "purchase")
    )
    q = SemanticFrame(pivot).exact_quantiles("value", [0.5, 0.9]).df.collect()

    # 4. Exact-quota eval split of the converted users (no leakage, exact
    #    sizes even on a tiny cohort).
    splits = (
        SemanticFrame(fun.df.filter(F.col("reached") >= 2))
        .split_exact(id_cols=["user_id"], weights={"train": 4, "holdout": 1})
        .df.groupBy("split").count().collect()
    )

    # 5. Engagement-over-time reporting: weekly cohort retention, a
    #    gap-filled daily activity series (LOCF carries the last observed
    #    spend into silent days), and the time-weighted average spend —
    #    irregular sampling weighted by how long each level persisted.
    retention = ev.cohort_retention("ts", "user_id", period=604800 * 10**9)
    week0 = (
        retention.df.filter(F.col("period_offset") == 1)
        .orderBy("cohort_period").collect()
    )
    cents = F.floor(F.col("value") * 100 + 0.5).cast("long")
    daily = ev.with_columns(_cents=cents).gap_fill(
        "ts", keys=["user_id"], bucket_width=86400 * 10**9,
        aggs={"n": F.count(F.lit(1)), "cents": F.sum("_cents")},
        locf_cols=["cents"],
    )
    gap_days = daily.df.filter(F.col("n").isNull()).count()
    twa = (
        ev.with_columns(_cents=cents)
        .time_weighted_avg("ts", "_cents", keys=["user_id"],
                           order_cols=["event_id"])
        .df.agg(F.avg("twa").alias("avg_twa_cents")).collect()[0]
    )

    out = {
        "hot_user_share_bp": hot_share_bp,
        "funnel_counts": {r["reached"]: r["count"] for r in conv},
        "purchase_value_p50": q[0]["p50"] if q else None,
        "split_counts": {r["split"]: r["count"] for r in splits},
        "week1_retention_pct": [r["retention_pct"] for r in week0],
        "gap_days_filled": gap_days,
        "avg_twa_cents": twa["avg_twa_cents"],
    }
    if own_spark:
        spark.stop()
    return out


if __name__ == "__main__":
    print(main())
