"""widen_for_model_stage: Python model-call stages must not inherit a
single-partition scan's parallelism, and must not add an exchange to
plans that are already shuffle-wide."""

from pyspark.sql import functions as F

from docetl_spark.operators.semantic import widen_for_model_stage


def test_widen_repartitions_narrow_scan(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    assert docs.rdd.getNumPartitions() < spark.sparkContext.defaultParallelism
    widened = widen_for_model_stage(docs)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    # row-local invariance: same rows either way
    assert widened.count() == docs.count()


def test_widen_skips_shuffle_bearing_plans(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    assert widen_for_model_stage(agg) is agg  # untouched, no extra exchange
    joined = docs.join(docs.select("doc_id"), "doc_id")
    assert widen_for_model_stage(joined) is joined


def test_widen_respects_already_wide_input(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(64)
    out = widen_for_model_stage(docs)
    # repartition shows in the plan -> skipped before the partition probe
    assert out is docs
