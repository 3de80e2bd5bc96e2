"""Regression tests for the round-8 ADVICE findings (fixed in round 9).

1. stats.heavy_hitters GLOBAL path: zero weighted total must yield NULL
   share_bp (matching the grouped path's new structural zero guard),
   not ZeroDivisionError; schemas must agree between the two paths.
2. stats.histogram: a bin_width that is not an integral number of
   1/scale units must raise, not silently substitute a different width.
3. timeseries.apply_cdc: NULL/unknown op codes fail loudly; change
   presence is detected by an explicit marker, never op nullness.
4. plans.fast_decompose: the target op may sit AFTER upstream ops that
   create the fields it reads — candidates must run on the target's
   input, not the raw step input.
5. timeseries.time_profile: reserved names are checked against the
   whole input schema, not just `by`.
"""

import pytest
from pyspark.sql import functions as F

from docetl_spark.functions.stats import heavy_hitters, histogram
from docetl_spark.functions.timeseries import apply_cdc, time_profile


# ---------------------------------------------------------------- 1
def test_heavy_hitters_zero_weight_total_global_and_grouped(spark):
    df = spark.createDataFrame(
        [("a", "x", 0), ("a", "y", 0), ("b", "x", 0)], "g string, v string, w int"
    )
    glob = heavy_hitters(df, "v", weight_col="w", top=1)
    grp = heavy_hitters(df, "v", by=["g"], weight_col="w", top=1)
    grows = glob.collect()
    assert all(r["share_bp"] is None for r in grows)
    assert {r["value"] for r in grows} == {"x", "__other__"}
    assert all(r["share_bp"] is None for r in grp.collect())
    # the two formulations must agree on output dtypes
    want = {"value": "string", "rank": "bigint", "n_rows": "bigint", "share_bp": "bigint"}
    assert {f.name: f.dataType.simpleString() for f in glob.schema.fields} == want
    assert {
        f.name: f.dataType.simpleString() for f in grp.schema.fields if f.name != "g"
    } == want


def test_heavy_hitters_nonzero_paths_still_agree(spark):
    rows = [("a", "x", 3), ("a", "x", 2), ("a", "y", 1), ("a", "z", 1)]
    df = spark.createDataFrame(rows, "g string, v string, w int")
    glob = {(r["value"], r["rank"], r["n_rows"], r["share_bp"])
            for r in heavy_hitters(df, "v", weight_col="w", top=1).collect()}
    grp = {(r["value"], r["rank"], r["n_rows"], r["share_bp"])
           for r in heavy_hitters(df, "v", by=["g"], weight_col="w", top=1).collect()}
    assert glob == grp == {("x", 1, 5, 7142), ("__other__", 2, 2, 2857)}


# ---------------------------------------------------------------- 2
def test_histogram_rejects_non_integral_bin_width(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    with pytest.raises(ValueError, match="not an integral"):
        histogram(df, "v", bin_width=0.125)  # 12.5 cents at scale=100
    # the same width at a finer scale is fine
    out = histogram(df, "v", bin_width=0.125, scale=1000)
    assert out.count() == 2


# ---------------------------------------------------------------- 3
def _cdc_frames(spark, op_value):
    base = spark.createDataFrame([(1, "old"), (2, "keep")], "k int, payload string")
    changes = spark.createDataFrame(
        [(1, 10, op_value, "new")], "k int, ts long, op string, payload string"
    )
    return base, changes


def test_apply_cdc_rejects_null_op(spark):
    base, changes = _cdc_frames(spark, None)
    with pytest.raises(Exception, match="invalid 'op' code NULL"):
        apply_cdc(base, changes, keys=["k"], ts_col="ts").collect()


def test_apply_cdc_rejects_unknown_op(spark):
    base, changes = _cdc_frames(spark, "X")
    with pytest.raises(Exception, match="invalid 'op' code X"):
        apply_cdc(base, changes, keys=["k"], ts_col="ts").collect()


def test_apply_cdc_valid_ops_still_merge(spark):
    base, changes = _cdc_frames(spark, "U")
    got = {(r["k"], r["payload"]) for r in
           apply_cdc(base, changes, keys=["k"], ts_col="ts").collect()}
    assert got == {(1, "new"), (2, "keep")}


# ---------------------------------------------------------------- 4
def test_fast_decompose_target_after_upstream_ops(spark, backend):
    """The target map reads a field created by the PRECEDING op; before
    the fix every candidate (including 'original') ran on the raw step
    input, failed on the missing field, and the decompose silently
    no-opped with 'All decomposition candidates failed to execute.'"""
    from docetl_spark.frame import SemanticFrame
    from docetl_spark.plans.fast_decomposer import fast_decompose
    from docetl_spark.plans.ir import lift

    rows = [{"id": i, "text": f"document number {i} body"} for i in range(6)]
    sf = SemanticFrame.from_df(spark.createDataFrame(rows), backend=backend)
    ops = lift([
        {"type": "code_map", "name": "derive",
         "code": "def transform(d): return {'derived_text': d['text'].upper()}",
         "output": {"schema": {"derived_text": "str"}}},
        {"type": "map", "name": "target_map",
         "prompt": "Summarize: {{ input.derived_text }}",
         "output": {"schema": {"summary": "str"}}},
    ])
    res = fast_decompose(sf, ops, "target_map", backend=backend, sample_size=3)
    assert res.candidates_evaluated >= 1
    assert "failed to execute" not in res.comparison_rationale
    # the winner actually produced outputs, on the DERIVED schema
    assert res.decomposed_outputs
    assert any("derived_text" in r or "summary" in r for r in res.decomposed_outputs)


# ---------------------------------------------------------------- 5
def test_time_profile_rejects_reserved_input_columns(spark):
    df = spark.createDataFrame([(1, 5)], "ts long, dow int")
    with pytest.raises(ValueError, match="reserves column names"):
        time_profile(df, "ts")
