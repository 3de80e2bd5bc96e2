"""Plan-shape regression net: the perf properties the engine is built
on (broadcasts, pushdown, no accidental cartesian joins) must survive
refactors. Plans are inspected WITHOUT executing the heavy queries —
queryExecution().executedPlan() only plans."""

import pytest

import importlib.util

spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
entry = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry)

SF_DIR = "/root/testdata/sf0.001"

# queries whose construction is cheap (no model-call loops, no driver
# iteration) — plan them all and forbid unbounded join strategies
PLAN_ONLY = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue", "q6_revenue_delta",
    "q13_order_histogram", "q19_disjunct_revenue", "q4_priority_semijoin",
    "customers_without_orders", "set_ops_nations",
    "code_filter_highvalue", "code_map_enrich", "code_reduce_nation",
    "split_words", "split_grouped", "unnest_word_freq", "gather_events",
    "text_stats", "quality_filter_rules", "pii_redact_docs", "repetition_stats_docs",
    "dedup_exact", "minhash_near_dup", "simhash_near_dup",
    "pack_sequences_docs", "contamination_check", "corpus_split_docs",
    "corpus_profile", "corpus_shard_manifest", "vocab_top_terms",
    "lm_score_docs", "quality_model_score",
    "events_sessionize", "events_user_stats", "events_asof_join",
    "events_range_join", "events_time_rollup",
    "semdedup_embeddings", "corpus_mixture_plan", "corpus_mixture_docs",
    "events_asof_join_bucketed", "pack_documents_docs",
    # round-6 additions
    "substring_dedup_docs", "unimax_plan_docs", "unimax_apply_docs",
    "q17_small_quantity_revenue", "q18_large_orders",
    "events_rolling_features", "events_rolling_features_bucketed",
    "quality_top_quartile_docs", "cap_per_source_docs",
    "trim_repeated_lines_docs", "events_sessionize_bucketed",
    "winnow_dup_pairs",
    # NOT sn_blocking_pairs: its distributed-rank construction runs real
    # jobs (range-boundary sampling + per-partition count collect), which
    # violates this list's plan-only contract
    "q7_nation_volume", "q10_returned_revenue", "q22_idle_above_avg",
    "q2_min_cost_supplier", "q8_market_share", "q9_product_profit",
    "q11_part_concentration", "q12_priority_by_status", "q14_promo_share",
    "q15_top_supplier", "q16_supplier_count", "q20_heavy_shippers",
    "q21_sole_returners", "bm25_search_docs", "corpus_split_exact",
    "events_skew_profile", "corpus_length_quantiles", "events_pivot_by_type",
    "events_funnel", "events_hopping_rollup",
    "events_gap_fill", "events_time_weighted", "events_cohort_retention",
    "docs_cooccurrence",
    # round-7 additions (excluded like sn_blocking_pairs for running
    # real jobs at plan time: docs_ngram_jaccard + docs_quantile_buckets'
    # global path [SN/distributed rank]; stream_* queries drain streams)
    "events_streaks", "events_attribution_last", "events_attribution_first",
    "events_heavy_hitters", "events_value_outliers", "events_json_props",
    "events_melt_pivot", "orders_cube_status_priority", "docs_tfdf_keywords",
    "events_ewma_value", "events_scd2_type", "docs_winsorize_len",
    "events_transitions", "docs_quantile_buckets", "orders_salted_join",
    "docs_ngram_stats", "events_snapshot_latest", "events_interval_join",
    "docs_readability",
    # round-8 additions — all construct plan-only (the grouped
    # exact_quantiles inside mad_outliers never touches the
    # distributed-rank job path)
    "events_value_histogram", "events_mad_outliers", "events_running_totals",
    "orders_data_diff", "nation_supplier_concat", "events_time_profile",
    "events_ewma_bucketed", "docs_approx_quantiles",
    "docs_profile", "orders_constraints", "lineitem_fk_orphans",
    "events_active_users", "docs_pps_sample", "docs_percentile_normalize",
    "events_merge_rollup", "orders_apply_cdc", "events_state_durations",
    "events_active_users_approx", "events_debounce", "events_throttle",
    # round-9 additions (events_stream_cusum excluded: it drains a
    # stream; customer_rfm/orders_ship_latency run the distributed-rank
    # sampling jobs at plan time, which is fine at this SF)
    "events_weighted_quantiles", "events_trend_fit", "events_benford",
    "events_interval_union", "events_session_paths", "events_autocorr",
    "events_null_runs", "events_cusum", "lineitem_basket_pairs",
    "events_audience_overlap", "customer_rfm", "part_fuzzy_names",
    "orders_gini", "part_skyline", "events_pop", "orders_ship_latency",
    "events_seasonal_outliers", "docs_blocker_metrics",
    "events_cohort_values", "events_decade_histogram",
    "events_session_quantiles", "events_ab_test",
    "events_funnel_windowed", "docs_collapse_rare",
    "events_target_encode", "events_funnel_rates",
    "events_stickiness", "events_new_returning", "events_gap_histogram",
    # round-9 second wave (events_lift runs the distributed-rank
    # sampling jobs at plan time, fine at this SF; the chi2 marginal
    # grid must compile to BroadcastHashJoin via the non-foldable key)
    "events_auc", "events_chi2", "events_ks", "orders_hhi",
    "users_event_diversity", "events_mode_by", "events_lift",
    "docs_vocab_profile", "docs_dup_clusters", "events_bursts",
    "events_markov",
    "orders_pareto", "lineitem_r2", "events_trigrams", "docs_zipf",
    # round-10 wave (events_spearman_daily / events_value_ecdf /
    # docs_vocab_growth / docs_curriculum run the distributed-rank /
    # prefix-sum sampling jobs at plan time — fine at this SF; the
    # cramers / impurity / woe / drift scalar attachments and the
    # chi2-style global grids must all stay BroadcastHashJoin via the
    # non-foldable key)
    "lineitem_spearman", "events_spearman_daily", "orders_cramers",
    "docs_impurity", "events_drift", "events_drift_detail", "orders_woe",
    "lineitem_trimmed_mean", "events_mann_kendall", "customer_survival",
    "events_changepoint", "events_sma_crossover", "events_runs",
    "events_acf", "events_session_bounce", "docs_vocab_growth",
    "docs_curriculum", "events_value_ecdf", "part_topk_ties",
    "orders_rollup_gid", "lineitem_kendall", "events_theil_sen",
    "events_conversion_latency", "users_event_degree",
]

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")


@pytest.mark.parametrize("name", PLAN_ONLY)
def test_no_unbounded_join_strategies(spark, name):
    df = entry.queries()[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    for bad in FORBIDDEN:
        assert bad not in plan, f"{name}: {bad} in physical plan"


def test_q5_broadcasts_small_dims(spark):
    plan = entry.queries()["q5_nation_revenue"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q6_pushes_filters_to_scan(spark):
    plan = entry.queries()["q6_revenue_delta"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "IsNotNull" in plan


def test_curriculum_prunes_text_at_scan(spark):
    """curriculum_order projects BEFORE the persisted distributed-rank
    frame — without it the cache pins every document column including
    the text (r10 plan-audit finding)."""
    import contextlib
    import io
    import re

    df = entry.queries()["docs_curriculum"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    for m in re.findall(r"ReadSchema: struct<([^>]*)>", buf.getvalue()):
        cols = [c.split(":")[0] for c in m.split(",") if c]
        assert "text" not in cols, cols


def test_q1_prunes_columns_at_scan(spark):
    import contextlib
    import io
    import re

    df = entry.queries()["q1_pricing_summary"](spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    m = re.search(r"ReadSchema: struct<([^>]*)>", buf.getvalue())
    assert m, "no ReadSchema in formatted plan"
    cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    assert "l_orderkey" not in cols and len(cols) <= 8, cols


def test_semdedup_single_exchange_for_dominance(spark):
    """semdedup's dominance pass must be groupBy-cluster applyInPandas:
    one exchange on the cluster id feeding FlatMapGroupsInPandas — no
    pair-table self-join resurfacing."""
    df = entry.queries()["semdedup_embeddings"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    assert "SortMergeJoin" not in plan.split("FlatMapGroupsInPandas")[0]


def test_apply_mixture_broadcasts_plan(spark):
    """The mixture plan table (source cardinality) must broadcast-join
    to the corpus — a shuffled join would move the corpus for a
    KB-sized dimension."""
    plan = entry.queries()["corpus_mixture_docs"](spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_equijoin_no_joins_above_adjudication(spark):
    """r5: the adjudication stage emits the matched payload itself, so
    NOTHING above the MapInPandas node may be a join — the old plan
    re-assembled via two joins against the base tables. (The plan tree
    prints root-first, so 'above' = before the first MapInPandas.)"""
    df = entry.queries()["equijoin_part_supplier"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    head = plan.split("MapInPandas", 1)[0]
    assert "MapInPandas" in plan
    assert "Join" not in head, head


def test_pack_documents_single_shuffle(spark):
    """pack_documents = one groupBy-shard exchange feeding FlatMapGroups;
    no joins, no extra exchanges above the packing stage."""
    df = entry.queries()["pack_documents_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan


def test_asof_bucketed_windows_by_bucket(spark):
    """The hot-key plan's final window partitions by (keys, _bkt), never
    by the bare key over the unioned data."""
    df = entry.queries()["events_asof_join_bucketed"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    # every last()-carry window ordered by the row timestamp (_ats) must
    # partition by (keys, _bkt) — a bare-key partition there would be the
    # single-task-per-key shape this plan exists to avoid. (The one
    # legitimate bare-key window is the carry-in pass over the BUCKET
    # SUMMARY, which orders by _bkt, not _ats.)
    found = 0
    for m in re.finditer(r"Window \[[^\]]*last\([^\]]*\], \[([^\]]*)\], \[([^\]]*)\]", plan):
        part, order = m.group(1), m.group(2)
        if "_ats" in order:
            found += 1
            assert "_bkt" in part, (part, order)
    assert found >= 1, plan


def test_sample_outliers_single_scan_for_count_cutoff(spark, monkeypatch):
    """The count-cutoff path must derive the row count from the per-dim
    stats aggregate (one scan), never a separate df.count() — two counts
    on the same lineage is a wasted full scan at 100 TB."""
    from pyspark.sql import DataFrame

    from docetl_spark.operators import sample as sample_op

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select("vec_id", "embedding")
    calls = {"n": 0}
    orig = DataFrame.count

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "count", counting)
    out = sample_op.sample_outliers(emb, "embedding", samples=0.1)
    rows = orig(out)  # materialize via the unpatched action
    assert rows > 0
    assert calls["n"] == 0, f"sample_outliers ran {calls['n']} df.count() jobs; stats agg should carry the row count"


def test_gather_fast_path_has_no_quadratic_window_frame(spark):
    """Spark recomputes aggregates over (bounded, unboundedFollowing)
    frames FROM SCRATCH per row — O(chunks^2) per document (a 300k-chunk
    hot doc ran minutes). gather's next-context skip sum must come from
    whole-partition total minus a running prefix; whole-partition frames
    (unboundedpreceding, unboundedfollowing) evaluate once and stay."""
    import re

    df = entry.queries()["split_gather_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    bad = [
        m.group(0)
        for m in re.finditer(r"specifiedwindowframe\(RowFrame, ([^,]+), unboundedfollowing\$\(\)\)", plan)
        if "unboundedpreceding" not in m.group(1)
    ]
    assert not bad, f"quadratic unboundedFollowing frames in gather plan: {bad}"


def test_sample_outliers_counts_null_embedding_rows(spark):
    """Fraction-based sample size must be computed against ALL rows, not
    just rows with a non-null embedding (posexplode_outer carries them);
    an all-null column raises nothing and returns an empty result."""
    from pyspark.sql import types as T

    from docetl_spark.operators import sample as sample_op

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    rows = [(i, [float(i), 0.0]) for i in range(8)] + [(100, None), (101, None)]
    df = spark.createDataFrame(rows, schema)
    out = sample_op.sample_outliers(df, "embedding", samples=0.5)
    # n = int(0.5 * 10-row total) = 5; NULL-distance rows sort first and
    # occupy cutoff slots (historical df.count() semantics), so 4 real
    # rows survive. The posexplode bug (total=8 -> n=4) would give 3.
    assert out.count() == 4
    allnull = spark.createDataFrame([(1, None), (2, None)], schema)
    assert sample_op.sample_outliers(allnull, "embedding", samples=0.5).count() == 0


def test_substring_dedup_keeper_election_is_partial_agg(spark):
    """The keeper election must be an aggregate (map-side combinable),
    never a row_number window, and all hashing stays JVM-side."""
    df = entry.queries()["substring_dedup_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_unimax_plan_is_collect_free_summary_windows(spark):
    """UniMax's water-filling closed form is one window pass over the
    source-cardinality table — no Python, no iterative driver loop."""
    df = entry.queries()["unimax_plan_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "Window" in plan  # the saturation/prefix pass


def test_unimax_apply_broadcasts_plan_table(spark):
    df = entry.queries()["unimax_apply_docs"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # corpus never shuffles
    assert "Generate" in plan  # explode(sequence) upsampling


def test_q17_filters_before_per_part_agg(spark):
    """The brand filter must prune lineitem BEFORE the per-part
    aggregate (via the broadcast join), not after."""
    df = entry.queries()["q17_small_quantity_revenue"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the correlated subquery is decorrelated: no SubqueryExec per row
    assert "Subquery" not in plan


def test_rolling_features_single_exchange(spark):
    """Default rolling plan: every feature shares ONE window — one
    shuffle on the entity key."""
    df = entry.queries()["events_rolling_features"](spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2  # scan normalize + the key shuffle
    assert "Window" in plan
