"""The shipped example pipelines must actually run."""


def test_pretrain_corpus_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/pretrain_corpus.yaml")
    rows = out.collect()
    assert rows, "pipeline produced no packed sequences"
    assert set(out.df.columns) == {
        "doc_id", "shard", "seq_id", "doc_tok_start", "doc_tok_end", "seq_off"
    }
    # step output registered as a queryable view
    assert spark.sql("SELECT * FROM curated").count() == len(rows)
    # decontamination: no surviving doc is a benchmark member
    surviving = {r["doc_id"] for r in rows}
    assert not any(d % 17 == 0 for d in surviving)


def test_semantic_extraction_example_runs(spark):
    from docetl_spark import FakeBackend
    from docetl_spark.plans.yaml_front import run_yaml

    def topics_rule(ctx):
        if isinstance(ctx, dict):  # map: extract from the doc
            return ["spark" if "spark" in ctx.get("text", "") else "general"]
        # resolve canonicalization: list of member rows -> canonical string
        vals = [c.get("topics") for c in ctx if isinstance(c, dict)]
        v = vals[0] if vals else "general"
        return v if isinstance(v, str) else (v[0] if v else "general")

    be = FakeBackend(
        rules={
            "topics": topics_rule,
            "sentiment": lambda row: "positive" if "fast" in row.get("text", "") else "neutral",
            "keep": lambda row: row.get("sentiment") == "positive",
            "summary": lambda rows: f"docs about {(rows[0] if isinstance(rows, list) else rows).get('topics')}",
        }
    )
    out = run_yaml(spark, "examples/semantic_extraction.yaml", backend=be)
    rows = out.collect()
    assert rows
    assert {"topics", "summary"} <= set(out.df.columns)
    assert all(r["summary"] for r in rows)


def test_semantic_curation_example_runs(spark):
    from docetl_spark import FakeBackend
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/semantic_curation.yaml", backend=FakeBackend())
    rows = out.collect()
    assert rows, "curation pipeline produced no packed sequences"
    assert {"doc_id", "shard", "seq_id"} <= set(out.df.columns)
    # the mixture dropped every language outside the 60/40 en/de blend:
    # surviving doc ids must come from en/de docs only
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    allowed = {r["doc_id"] for r in docs.filter("lang IN ('en','de')").collect()}
    assert {r["doc_id"] for r in rows} <= allowed


def test_optimize_pipeline_example_runs(spark, sf_dir):
    """The whole MOAR loop, integration-level (VERDICT r4 item #8):
    should_optimize probe -> estimate_cost dry-run -> directive search ->
    the WINNING plan replays end-to-end with FakeBackend."""
    import sys

    sys.path.insert(0, "examples")
    from optimize_pipeline import main

    from docetl_spark import FakeBackend

    out = main(spark=spark, sf_dir=sf_dir, backend=FakeBackend(), max_iterations=6)
    assert out["explored"] >= 2          # the search actually explored
    assert out["cost_best"] <= out["cost_before"]  # Pareto-best no worse
    assert out["rows"] > 0               # winning plan executed
    assert {"sentiment", "summary"} <= set(out["columns"])
    assert out["winning_ops"][0] == "scan"
    v = out["verdict"]
    assert hasattr(v, "should_optimize") and hasattr(v, "rationale")


def test_curate_mixture_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/curate_mixture.yaml")
    rows = out.collect()
    assert rows, "curation pipeline produced no rows"
    cols = set(out.df.columns)
    assert {"doc_id", "lang", "quality", "copy"} <= cols
    # host cap: at most 60 docs per synthetic source survive pre-unimax
    # stages, so no source exceeds 60 DISTINCT docs in the output
    from collections import Counter

    per_source = Counter()
    for r in rows:
        per_source[(r["source"], r["doc_id"])] = 1
    src_counts = Counter(s for (s, _) in per_source)
    assert max(src_counts.values()) <= 60
    # unimax copies are 1-based and bounded by the 1.5 epoch cap
    assert all(1 <= r["copy"] <= 2 for r in rows)


def test_event_analytics_example_runs(spark):
    from examples.event_analytics import main

    out = main(spark)
    assert out["hot_user_share_bp"] > 0
    assert sum(out["funnel_counts"].values()) > 0
    assert set(out["split_counts"]) <= {"train", "holdout"}
    n = sum(out["split_counts"].values())
    assert out["split_counts"].get("train", 0) == (n * 4) // 5
    assert all(0 < p <= 100 for p in out["week1_retention_pct"])
    assert out["gap_days_filled"] >= 0
    assert out["avg_twa_cents"] > 0


def test_event_analytics_yaml_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/event_analytics.yaml")
    rows = out.df.collect()
    assert rows, "retention matrix is empty"
    assert all(0 < r["retention_pct"] <= 100 for r in rows)
    assert any(r["period_offset"] > 0 for r in rows)
    # intermediate step registered as a queryable view; gap rows carry
    # LOCF cents but no observed events
    grid = spark.sql(
        "SELECT * FROM user_grid WHERE n_events IS NULL AND cents_filled IS NOT NULL"
    )
    assert grid.count() > 0


def test_product_analytics_yaml_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/product_analytics.yaml")
    # final step: SCD2 history — exactly one current version per user
    rows = out.df.collect()
    assert rows
    current = [r for r in rows if r["is_current"]]
    users = {r["user_id"] for r in rows}
    assert len(current) == len(users)
    assert all(r["valid_to"] is None for r in current)
    # step views: attributed purchases and top-type report
    attr = spark.sql("SELECT * FROM attributed_purchases").collect()
    assert attr and any(r["touch_type"] in ("click", "view") for r in attr)
    assert all(r["lag_ns"] is None or 0 <= r["lag_ns"] <= 86400000000000 for r in attr)
    top = spark.sql("SELECT * FROM user_top_types").collect()
    assert top and all(1 <= r["rank"] <= 4 for r in top)


def test_quality_weighted_mix_example(spark):
    from docetl_spark import run_yaml

    out = run_yaml(spark, "examples/quality_weighted_mix.yaml")
    rows = out.collect()
    # histogram report per lang: bins carry exact shares
    assert rows and all(0 <= r["share_bp"] <= 10000 for r in rows)
    assert set(out.df.columns) == {"lang", "bin_lo", "n_rows", "share_bp"}
    # the side steps registered as views: profile + constraint gates ran
    assert spark.table("profile_report").count() == 5
    gates = {r["constraint_name"]: r["n_violations"]
             for r in spark.table("gate_report").collect()}
    assert gates["has_text"] == 0 and gates["chars_match"] == 0


def test_behavior_analytics_example(spark):
    """Round-9 family end to end: seasonal anomaly flags -> filter ->
    week-over-week comparison, all through the YAML surface."""
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/behavior_analytics.yaml")
    rows = out.collect()
    assert rows and {"event_type", "bucket_ns", "cur_cents",
                     "prev_cents", "pct_change_bp"} <= set(rows[0])
    # weekly buckets per type; at least one adjacent-week comparison fires
    assert any(r["pct_change_bp"] is not None for r in rows)


def test_experiment_analysis_example(spark):
    """Round-9 second wave end to end: rare-category fold -> LOO target
    encoding -> derived variant/conversion -> exact A/B scorecard."""
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/experiment_analysis.yaml")
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["variant_a"] == "A" and r["variant_b"] == "B"
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert r["rate_a_bp"] is not None and r["rate_b_bp"] is not None


def test_model_evaluation_example(spark):
    """Round-9 third-wave end to end: code-map label -> exact decile
    lift table (integer-bp rates, cumulative lift)."""
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/model_evaluation.yaml")
    rows = sorted(out.collect(), key=lambda r: r["bucket"])
    assert [r["bucket"] for r in rows] == [1, 2, 3, 4, 5]
    assert sum(r["n"] for r in rows) == 1000  # sf0.001 events
    last = rows[-1]
    assert last["lift_bp"] == 10000  # full population = base rate
    assert all(0 <= r["rate_bp"] <= 10000 for r in rows)


def test_association_audit_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/association_audit.yaml")
    rows = out.collect()  # final step = the evidence table
    assert {r["value"] for r in rows} >= {"purchase"}
    # purchase IS the label -> all positives concentrate there
    p = next(r for r in rows if r["value"] == "purchase")
    assert p["pos_share_bp"] == 10000 and p["n_neg"] == 0
    # intermediate step outputs are registered, queryable views
    drift = spark.sql("SELECT * FROM drift_report").collect()
    assert drift and all(r["base_share_bp"] is not None for r in drift)
    imp = spark.sql("SELECT * FROM impurity_report").collect()[0]
    assert 0 <= imp["reduction_bp"] <= imp["parent_gini_bp"]


def test_rag_hybrid_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/rag_hybrid.yaml")
    rows = {r["qid"]: r for r in out.collect()}
    assert set(rows) == {1, 2}
    # exact-text query wins both lists -> fused rank 1 is itself
    assert rows[1]["_retrieved_context"].startswith(
        "[doc 1] spark shuffles on groupBy and join")
    assert rows[2]["_retrieved_context"].startswith(
        "[doc 1] parquet stores columns with statistics")
    assert all("[doc 2]" in r["_retrieved_context"] for r in rows.values())
    assert all(r["answer"] for r in rows.values())


def test_graph_audit_example_runs(spark):
    from docetl_spark.plans.yaml_front import run_yaml

    out = run_yaml(spark, "examples/graph_audit.yaml")
    labels = out.collect()  # final step = the label-propagation report
    assert labels and {"node", "label", "is_seed"} <= set(labels[0])
    assert any(r["is_seed"] for r in labels)
    # seeds never change; some non-seed nodes picked up a brand
    spread = [r for r in labels if not r["is_seed"] and r["label"]]
    assert spread
    tri = spark.sql("SELECT * FROM triangle_report").collect()
    assert tri and all(r["triangles"] >= 0 for r in tri)
    assert any(r["cc_bp"] is not None for r in tri)
    pr = spark.sql("SELECT * FROM influence_report").collect()
    assert pr and sum(r["rank_e12"] for r in pr) <= 10 ** 12
    sim = spark.sql("SELECT * FROM similar_report").collect()
    assert sim and all(1 <= r["jaccard_bp"] <= 10000 for r in sim)
