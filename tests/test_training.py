"""Training-pipeline operators (functions/training.py): sequence
packing, contamination checks, temperature sampling — plus the
deterministic axis-plane LSH variant."""

from pyspark.sql import functions as F

from docetl_spark.functions import similarity, training


def _pack_rows(spark, texts, budget, n_shards=1):
    df = spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = training.pack_sequences(
        df,
        budget=budget,
        text_col="text",
        id_cols=["doc_id"],
        order_cols=["doc_id"],
        shard_expr=F.lit(0) if n_shards == 1 else F.col("doc_id") % n_shards,
    )
    return [r.asDict() for r in out.collect()]


def test_pack_sequences_covers_every_token_once(spark):
    texts = ["a b c d e", "f g h", "i j k l m n o p", "q r"]
    budget = 4
    rows = _pack_rows(spark, texts, budget)
    # every document's pieces tile [0, n_tok) exactly
    for i, t in enumerate(texts):
        n = len(t.split())
        pieces = sorted(
            (r["doc_tok_start"], r["doc_tok_end"]) for r in rows if r["doc_id"] == i
        )
        assert pieces[0][0] == 0 and pieces[-1][1] == n
        for (a, b), (c, d) in zip(pieces, pieces[1:]):
            assert b == c  # contiguous, no gap/overlap
    # every sequence holds exactly `budget` tokens except the last
    per_seq = {}
    for r in rows:
        per_seq.setdefault(r["seq_id"], 0)
        per_seq[r["seq_id"]] += r["doc_tok_end"] - r["doc_tok_start"]
    last = max(per_seq)
    for sid, tok in per_seq.items():
        assert tok == budget if sid != last else tok <= budget
    # seq_off matches the running position inside each sequence
    for r in rows:
        assert 0 <= r["seq_off"] < budget
        assert r["seq_off"] + (r["doc_tok_end"] - r["doc_tok_start"]) <= budget


def test_pack_sequences_doc_crossing_boundary_appears_twice(spark):
    rows = _pack_rows(spark, ["one two three", "four five six seven"], budget=4)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[0]) == 1
    assert len(by_doc[1]) == 2  # spans tokens 3..6 -> sequences 0 and 1
    spans = sorted((r["seq_id"], r["doc_tok_start"], r["doc_tok_end"]) for r in by_doc[1])
    assert spans == [(0, 0, 1), (1, 1, 4)]


def test_pack_sequences_sharding_isolates_streams(spark):
    texts = ["w x y z"] * 6
    rows = _pack_rows(spark, texts, budget=8, n_shards=2)
    for shard in (0, 1):
        tok = sum(
            r["doc_tok_end"] - r["doc_tok_start"] for r in rows if r["shard"] == shard
        )
        assert tok == 12  # 3 docs x 4 tokens per shard


def test_ngram_overlap_counts(spark):
    corpus = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "the quick brown fox jumps over the lazy dog"},
            {"doc_id": 1, "text": "entirely different words here appear now ok fine"},
            {"doc_id": 2, "text": "too short"},
        ]
    )
    bench = spark.createDataFrame(
        [{"text": "the quick brown fox jumps over the lazy dog indeed"}]
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in training.ngram_overlap(corpus, bench, n=3).collect()
    }
    assert out[0]["n_ngrams"] == 7 and out[0]["n_overlap"] == 7
    assert out[0]["overlap_ratio"] == 1.0
    assert out[1]["n_overlap"] == 0
    assert out[2]["n_ngrams"] == 0 and out[2]["overlap_ratio"] == 0.0


def test_sample_temperature_deterministic_and_upweights_small_groups(spark):
    rows = [{"id": i, "g": "big" if i < 900 else "small"} for i in range(1000)]
    df = spark.createDataFrame(rows)
    a = {r["id"] for r in training.sample_temperature(df, "g", temperature=4.0, target_fraction=0.2, id_cols=["id"]).collect()}
    b = {r["id"] for r in training.sample_temperature(df, "g", temperature=4.0, target_fraction=0.2, id_cols=["id"]).collect()}
    assert a == b  # hash draw, not RNG
    kept_small = len([i for i in a if i >= 900]) / 100
    kept_big = len([i for i in a if i < 900]) / 900
    assert kept_small > kept_big  # T>1 upsamples the minority group
    assert 0.1 < len(a) / 1000 < 0.35  # near target_fraction


def test_axis_lsh_query_finds_itself(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = similarity.lsh_topk(
        emb, q, 5, dim=64, planes=similarity.axis_planes(64, 8)
    ).collect()
    top = [r for r in out if r["rank"] == 1][0]
    assert top["vec_id"] == 1 and abs(top["score"] - 1.0) < 1e-6


def test_frame_training_ops_chain_and_roundtrip(spark, tmp_path, sf_dir):
    """Training ops as frame methods: fluent chain + YAML round-trip."""
    from docetl_spark import FakeBackend, SemanticFrame

    sf = (
        SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=FakeBackend())
        .sample_temperature("lang", temperature=2.0, target_fraction=0.5, id_cols=["doc_id"])
        .pack_sequences(budget=256, text_col="text", id_cols=["doc_id"], order_cols=["doc_id"], n_shards=4)
    )
    rows = sf.collect()
    assert rows and all(0 <= r["seq_off"] < 256 for r in rows)

    y1 = sf.to_yaml()
    p = str(tmp_path / "train_pipe.yaml")
    sf.to_yaml(p)
    sf2 = SemanticFrame.from_yaml(spark, p, backend=FakeBackend())
    assert sf2.to_yaml() == y1
    assert sorted(map(tuple, (r.values() for r in sf2.collect()))) == sorted(
        map(tuple, (r.values() for r in rows))
    )


def test_frame_dedup_and_contamination_methods(spark, sf_dir):
    from docetl_spark import FakeBackend, SemanticFrame

    docs = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=FakeBackend())
    from pyspark.sql import functions as F

    deduped = docs.dedup_exact("text", order_by=[F.col("doc_id").asc()])
    assert 0 < deduped.count() <= docs.count()

    bench = docs.where("doc_id % 10 = 0").select("text")
    cont = docs.contamination(bench, n=13)
    out = {r["doc_id"]: r["overlap_ratio"] for r in cont.collect()}
    assert out[0] == 1.0  # benchmark member is fully contaminated


def test_pii_redact_and_counts(spark):
    from docetl_spark.functions import text as text_fn

    df = spark.createDataFrame(
        [
            {"id": 0, "t": "mail a.b+c@ex.co or 192.168.1.1 call +1 (415) 555-0123 now"},
            {"id": 1, "t": "clean text with no pii at all"},
        ]
    )
    out = {
        r["id"]: r.asDict()
        for r in df.select(
            "id",
            text_fn.pii_redact(F.col("t")).alias("r"),
            text_fn.pii_counts(F.col("t")).alias("c"),
        ).collect()
    }
    assert out[0]["r"] == "mail [EMAIL] or [IP] call [PHONE] now"
    assert out[0]["c"].asDict() == {"email": 1, "ip": 1, "phone": 1}
    assert out[1]["r"] == "clean text with no pii at all"
    assert out[1]["c"].asDict() == {"email": 0, "ip": 0, "phone": 0}


def test_repetition_stats(spark):
    from docetl_spark.functions import text as text_fn

    df = spark.createDataFrame(
        [
            {"id": 0, "t": "spam spam spam spam spam"},
            {"id": 1, "t": "a\nb\na\nb\na"},
            {"id": 2, "t": "all words here are unique tokens"},
            {"id": 3, "t": ""},
        ]
    )
    out = {
        r["id"]: r["s"].asDict()
        for r in df.select("id", text_fn.repetition_stats(F.col("t")).alias("s")).collect()
    }
    assert out[0]["top_ngram_share"] == 1.0  # every bigram is "spam spam"
    assert out[1]["dup_line_frac"] == 0.6  # 5 lines, 2 distinct
    assert out[2]["top_ngram_share"] < 0.5 and out[2]["dup_line_frac"] == 0.0
    assert out[3] == {"dup_line_frac": 0.0, "top_ngram_share": 0.0}


def test_decontaminate_batch_and_bounded_bench(spark):
    from docetl_spark.functions import training
    import pytest

    corpus = spark.createDataFrame(
        [
            {"doc_id": 0, "text": "alpha beta gamma delta"},
            {"doc_id": 1, "text": "epsilon zeta eta theta"},
            {"doc_id": 2, "text": "totally different words here"},
        ]
    )
    bench = spark.createDataFrame([{"text": "alpha beta gamma delta and more"}])
    kept = {r["doc_id"] for r in training.decontaminate(corpus, bench, n=3).collect()}
    assert kept == {1, 2}  # doc 0 shares 3-grams with the benchmark

    with pytest.raises(ValueError, match="broadcasts the key set"):
        training.decontaminate(corpus, bench, n=3, max_bench_ngrams=1)


def test_decontaminate_bloom_and_exact_paths_agree(spark):
    rows = [
        {"doc_id": i, "text": f"doc {i} " + " ".join(f"w{i}_{j}" for j in range(15))}
        for i in range(30)
    ]
    # plant benchmark text inside docs 3 and 17
    bench_txt = ("held out benchmark question about the capital of assyria "
                 "answered in exactly fourteen carefully chosen words")
    rows[3]["text"] += " " + bench_txt
    rows[17]["text"] = bench_txt + " " + rows[17]["text"]
    df = spark.createDataFrame(rows)
    bench = spark.createDataFrame([{"text": bench_txt}])

    from docetl_spark.functions import training

    with_bloom = training.decontaminate(df, bench, n=13, bloom_fpp=0.01)
    no_bloom = training.decontaminate(df, bench, n=13, bloom_fpp=None)
    a = sorted(r["doc_id"] for r in with_bloom.collect())
    b = sorted(r["doc_id"] for r in no_bloom.collect())
    assert a == b
    assert 3 not in a and 17 not in a and len(a) == 28


def test_dsir_weights_prefer_target_like_docs(spark):
    from docetl_spark.functions.training import dsir_select, dsir_weights

    raw = spark.createDataFrame(
        [
            (1, "spark shuffle partition join broadcast"),
            (2, "spark join window aggregate shuffle"),
            (3, "recipe butter flour sugar oven"),
            (4, "butter sugar oven recipe whisk"),
            (5, ""),
        ],
        ["doc_id", "text"],
    )
    # target must be large enough that add-1 smoothing doesn't drown the
    # signal (with a 7-token target every llr is negative and the empty
    # doc's logw=0 would top the ranking — correct DSIR math, wrong test)
    target = spark.createDataFrame(
        [(10 + i, "spark join shuffle broadcast aggregate partition window") for i in range(20)],
        ["doc_id", "text"],
    )
    w = {r["doc_id"]: r["dsir_logw"] for r in dsir_weights(raw, target, "text", id_col="doc_id", buckets=64).collect()}
    assert len(w) == 5
    assert w[5] == 0.0  # empty doc: no evidence either way
    assert min(w[1], w[2]) > max(w[3], w[4])  # spark docs score above recipes
    sel = dsir_select(raw, target, "text", id_col="doc_id", k=2, buckets=64, gumbel=False)
    assert {r["doc_id"] for r in sel.collect()} == {1, 2}
    ranks = [r["sel_rank"] for r in sel.orderBy("sel_rank").collect()]
    assert ranks == [1, 2]


def test_shard_manifest_partitions_all_docs_deterministically(spark):
    from docetl_spark.functions.training import shard_manifest

    df = spark.createDataFrame([(i, "a b c") for i in range(200)], ["doc_id", "text"])
    m = shard_manifest(df, id_col="doc_id", text_col="text", num_shards=8)
    rows = m.collect()
    assert {r["shard"] for r in rows} <= set(range(8))
    assert sum(r["num_docs"] for r in rows) == 200
    assert sum(r["num_tokens"] for r in rows) == 600
    again = {r["shard"]: r["num_docs"] for r in shard_manifest(df, id_col="doc_id", text_col="text", num_shards=8).collect()}
    assert again == {r["shard"]: r["num_docs"] for r in rows}


def test_minhash_dedup_keep_best_and_stats(spark):
    from docetl_spark.functions.dedup import minhash_dedup
    from pyspark.sql import functions as F

    base = "the quick brown fox jumps over the lazy dog again and again today"
    rows = [
        (1, base),
        (2, base + " extended with more tokens"),  # near-dup of 1, longer
        (3, "completely different content about spark accumulators"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    ntok = F.size(F.split("text", " "))
    out = minhash_dedup(
        df.withColumn("n", ntok), "doc_id", "text",
        jaccard_threshold=0.5,
        keep_order=[F.col("n").desc(), F.col("doc_id")],
        with_stats=True,
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {2, 3}  # longest rep kept, min-id component label
    assert by_id[2]["component"] == 1 and by_id[2]["cluster_size"] == 2
    assert by_id[3]["cluster_size"] == 1


def test_term_stats_tf_df(spark):
    from docetl_spark.functions.text import term_stats

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c"), (3, "")], ["doc_id", "text"]
    )
    rows = {r["term"]: (r["tf"], r["df"]) for r in term_stats(df, "text", id_col="doc_id").collect()}
    assert rows == {"a": (2, 1), "b": (2, 2), "c": (1, 1)}


def test_frame_verbs_dsir_terms_shards(spark, sf_dir, tmp_path):
    """New corpus-curation verbs on the Frame + pandas accessor + YAML op
    types compile."""
    from docetl_spark import FakeBackend, SemanticFrame

    docs = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=FakeBackend())
    target = docs.where("source = 'src0'")

    sel = docs.select("doc_id", "text").dsir_select(target, "text", id_col="doc_id", k=10, buckets=64)
    assert sel.count() == 10

    terms = docs.term_stats("text", id_col="doc_id", top_n=5)
    assert 0 < terms.count() <= 5

    man = docs.shard_manifest(id_col="doc_id", text_col="text", num_shards=4)
    rows = man.collect()
    assert sum(r["num_docs"] for r in rows) == docs.count()

    # YAML op types round-trip through the compiler
    from docetl_spark.plans.yaml_front import run_yaml

    cfg = {
        "datasets": {
            "docs": {"type": "file", "format": "parquet", "path": f"{sf_dir}/documents.parquet"},
            "tgt": {"type": "file", "format": "parquet", "path": f"{sf_dir}/documents.parquet"},
        },
        "default_model": "fake",
        "operations": [
            {"name": "pick", "type": "dsir_select", "target": "tgt", "text_col": "text",
             "id_col": "doc_id", "k": 7, "buckets": 32},
        ],
        "pipeline": {
            "steps": [{"name": "s1", "input": "docs", "operations": ["pick"]}],
        },
    }
    import yaml

    p = str(tmp_path / "dsir_pipe.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    out = run_yaml(spark, p, backend=FakeBackend())
    assert out.count() == 7


def test_lm_score_flags_surprising_docs(spark):
    from docetl_spark.functions.training import lm_score

    common = "the cat sat on the mat and the dog sat on the rug"
    rows = [(i, common) for i in range(10)] + [
        (100, "zxqv wvut qpolm zzyx vbnm qwer"),  # gibberish: unseen bigrams
        (101, "x"),  # <2 tokens -> 0.0
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["lm_nll"] for r in lm_score(df, text_col="text", id_col="doc_id").collect()}
    assert len(out) == 12
    assert out[101] == 0.0
    assert out[100] > out[0]  # gibberish is more surprising than the common doc
    # deterministic to the precision the query layer exposes (float
    # aggregation order may differ by a ulp between runs; queries
    # round to 4 decimals)
    again = {r["doc_id"]: r["lm_nll"] for r in lm_score(df, text_col="text", id_col="doc_id").collect()}
    assert {k: round(v, 6) for k, v in again.items()} == {k: round(v, 6) for k, v in out.items()}


def test_assign_splits_deterministic_and_proportional(spark):
    from docetl_spark.functions.training import assign_splits
    import pytest as _pt

    df = spark.createDataFrame([(i,) for i in range(2000)], ["id"])
    out = assign_splits(df, id_cols=["id"], fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["count"] for r in out.groupBy("split").count().collect()}
    assert set(counts) == {"train", "val", "test"}
    assert 0.75 < counts["train"] / 2000 < 0.85
    # same assignment under different partitioning
    re = assign_splits(df.repartition(13), id_cols=["id"], fractions={"train": 0.8, "val": 0.1, "test": 0.1})
    a = {r["id"]: r["split"] for r in out.collect()}
    b = {r["id"]: r["split"] for r in re.collect()}
    assert a == b
    with _pt.raises(ValueError):
        assign_splits(df, id_cols=["id"], fractions={"a": 0.9, "b": 0.2})


def test_new_ops_handle_empty_and_degenerate_inputs(spark):
    """Edge hygiene: empty frames and degenerate corpora must not throw."""
    from docetl_spark.functions.training import (
        assign_splits, dsir_select, dsir_weights, lm_score, shard_manifest,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    docs = spark.createDataFrame([(1, "only one doc here")], ["doc_id", "text"])

    assert dsir_weights(empty, docs, "text", id_col="doc_id", buckets=16).count() == 0
    assert dsir_select(empty, docs, "text", id_col="doc_id", k=5, buckets=16).count() == 0
    # empty TARGET corpus: smoothing-only model, still scores every doc
    w = dsir_weights(docs, empty, "text", id_col="doc_id", buckets=16)
    assert w.count() == 1
    assert lm_score(empty, text_col="text", id_col="doc_id").count() == 0
    assert shard_manifest(empty, id_col="doc_id", text_col="text").count() == 0
    assert assign_splits(empty, id_cols=["doc_id"]).count() == 0
    # single-doc corpus under its own LM: every bigram seen, finite nll
    one = lm_score(docs, text_col="text", id_col="doc_id").collect()[0]
    assert one["lm_nll"] >= 0.0


def test_fuzzy_dedup_empty_and_no_dups(spark):
    from docetl_spark.functions.dedup import minhash_dedup

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert minhash_dedup(empty, "doc_id", "text").count() == 0
    uniq = spark.createDataFrame(
        [(i, f"totally distinct text number {i} with unique words w{i} x{i} y{i} z{i}") for i in range(8)],
        ["doc_id", "text"],
    )
    out = minhash_dedup(uniq, "doc_id", "text", with_stats=True).collect()
    assert len(out) == 8 and all(r["cluster_size"] == 1 for r in out)


def test_mixture_plan_and_apply(spark):
    from docetl_spark.functions.training import apply_mixture, mixture_plan

    rows = [(i, "web") for i in range(600)] + [(i + 1000, "books") for i in range(100)] \
         + [(i + 2000, "code") for i in range(300)] + [(i + 3000, "junk") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    plan = mixture_plan(df, "source", {"web": 0.5, "books": 0.25, "code": 0.25})
    p = {r["group"]: r for r in plan.collect()}
    # books is scarcest: T = 100/0.25 = 400 -> web 200, books 100, code 100
    assert p["books"]["rate"] == 1.0 and p["books"]["planned"] == 100.0
    assert abs(p["web"]["rate"] - 200 / 600) < 1e-9 and p["web"]["planned"] == 200.0
    assert abs(p["code"]["rate"] - 100 / 300) < 1e-9
    # untargeted group dropped entirely
    assert p["junk"]["rate"] == 0.0 and p["junk"]["weight"] == 0.0

    out = apply_mixture(df, plan, "source", id_cols=["doc_id"])
    got = {r["source"]: 1 for r in out.select("source").distinct().collect()}
    assert "junk" not in got
    n_books = out.filter("source = 'books'").count()
    assert n_books == 100  # rate 1.0 keeps everything
    n_web = out.filter("source = 'web'").count()
    assert 150 < n_web < 250  # Bernoulli around 200
    assert out.columns == df.columns  # plan columns don't leak

    # dict-rate form and empty-targeted-group behavior
    out2 = apply_mixture(df, {"web": 0.1}, "source", id_cols=["doc_id"])
    assert out2.filter("source <> 'web'").count() == 0
    plan2 = mixture_plan(df, "source", {"web": 1.0, "absent": 1.0})
    p2 = {r["group"]: r for r in plan2.collect()}
    assert p2["web"]["rate"] == 1.0  # absent group doesn't zero T

    import pytest

    with pytest.raises(ValueError, match="sum > 0"):
        mixture_plan(df, "source", {"web": 0.0})


def test_sample_temperature_group_cardinality_gate(spark):
    # a high-cardinality group_col (e.g. doc ids) must raise instead of
    # collecting the counts unboundedly
    import pytest

    from docetl_spark.functions.training import sample_temperature

    df = spark.range(500).select(F.col("id").alias("doc_id"), F.col("id").alias("g"))
    with pytest.raises(ValueError, match="distinct values"):
        sample_temperature(df, "g", temperature=2.0, max_groups=100)
    # under the gate it still runs
    df2 = df.withColumn("g", F.col("g") % 3)
    out = sample_temperature(df2, "g", temperature=2.0, max_groups=100)
    assert 0 < out.count() < 500
    out._docetl_cached_input.unpersist()


def test_mixture_plan_int_group_keys(spark):
    # non-string target_weights keys (int source ids) must match the
    # string-cast group column — key literals are coerced to str
    from docetl_spark.functions.training import apply_mixture, mixture_plan

    rows = [(i, 1) for i in range(200)] + [(i + 1000, 2) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "src_id"])
    plan = mixture_plan(df, "src_id", {1: 0.5, 2: 0.5})
    p = {r["group"]: r for r in plan.collect()}
    # src 2 is scarcest: T = 200 -> each keeps 100
    assert p["2"]["rate"] == 1.0 and p["2"]["planned"] == 100.0
    assert abs(p["1"]["rate"] - 0.5) < 1e-9
    out = apply_mixture(df, plan, "src_id", id_cols=["doc_id"])
    assert out.filter("src_id = 2").count() == 100
    # dict-rate form with int keys too
    out2 = apply_mixture(df, {2: 1.0}, "src_id", id_cols=["doc_id"])
    assert out2.count() == 100 and out2.filter("src_id = 1").count() == 0


def test_sample_mixture_frame_and_yaml(spark, tmp_path):
    from docetl_spark import FakeBackend, SemanticFrame
    from docetl_spark.plans.yaml_front import run_yaml

    sf_dir = "/root/testdata/sf0.001"
    docs = SemanticFrame(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    out = docs.sample_mixture("lang", {"en": 0.5, "de": 0.5})
    langs = {r["lang"] for r in out.df.select("lang").distinct().collect()}
    assert langs <= {"en", "de"} and out.df.count() > 0

    cfg = {
        "datasets": {"docs": {"type": "file", "format": "parquet",
                              "path": f"{sf_dir}/documents.parquet"}},
        "default_model": "fake",
        "operations": [{"name": "mx", "type": "sample_mixture", "group_col": "lang",
                        "target_weights": {"en": 0.5, "de": 0.5}}],
        "pipeline": {"steps": [{"name": "s1", "input": "docs", "operations": ["mx"]}]},
    }
    import yaml

    p = str(tmp_path / "mx.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(cfg, f)
    got = run_yaml(spark, p, backend=FakeBackend())
    assert got.count() == out.df.count()


def test_pack_documents_next_fit_invariants(spark):
    """No-split packing: every doc appears once and intact; no bin except
    an oversized singleton exceeds the budget; offsets tile each bin
    contiguously from 0; next-fit order is doc order (a doc never skips
    back into an earlier bin)."""
    from docetl_spark.functions.training import pack_documents

    rows = [
        (i, " ".join(["w"] * n))
        for i, n in enumerate([5, 9, 3, 20, 2, 2, 2, 7, 1, 16, 4])
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_documents(df, budget=10, text_col="text", id_cols=["doc_id"],
                         shard_expr=F.lit(0)).collect()
    assert sorted(r["doc_id"] for r in out) == list(range(11))
    by_bin = {}
    for r in out:
        by_bin.setdefault(r["bin_id"], []).append(r)
    for bid, members in by_bin.items():
        members.sort(key=lambda r: r["bin_off"])
        fill = 0
        for m in members:
            assert m["bin_off"] == fill
            fill += m["n_tokens"]
        if len(members) > 1:
            assert fill <= 10
        else:
            assert fill <= 10 or members[0]["overflow"]
    # oversized docs sit alone and are flagged
    for r in out:
        assert r["overflow"] == (r["n_tokens"] > 10)
        if r["overflow"]:
            assert len(by_bin[r["bin_id"]]) == 1
    # bin ids follow doc order (next-fit never reopens a bin)
    ordered = sorted(out, key=lambda r: r["doc_id"])
    assert all(a["bin_id"] <= b["bin_id"] for a, b in zip(ordered, ordered[1:]))


def test_pack_documents_frame_verb_and_yaml(spark, tmp_path):
    from docetl_spark import SemanticFrame
    from docetl_spark.plans import run_pipeline

    docs = spark.createDataFrame(
        [(i, " ".join(["t"] * (3 + i % 5))) for i in range(40)], ["doc_id", "text"])
    sf = SemanticFrame.from_df(docs).pack_documents(
        budget=8, id_cols=["doc_id"], n_shards=4)
    assert sf.df.count() == 40
    p = str(tmp_path / "docs.parquet")
    docs.write.parquet(p)
    cfg = {
        "datasets": {"d": {"type": "file", "format": "parquet", "path": p}},
        "operations": [{"name": "pk", "type": "pack_documents", "budget": 8,
                        "id_cols": ["doc_id"], "n_shards": 4}],
        "pipeline": {"steps": [{"name": "s1", "input": "d", "operations": ["pk"]}]},
    }
    out = run_pipeline(spark, cfg)
    assert out.df.count() == 40
    assert {"bin_id", "bin_off", "overflow"} <= set(out.df.columns)


def test_trim_repeated_lines_semantics(spark):
    """Exact duplicate lines drop (first kept, order preserved); blank
    lines always survive with keep_blank; paragraph-mode dedups on the
    blank-line separator; null/empty pass through."""
    from docetl_spark.functions import text as tx

    df = spark.createDataFrame(
        [("a\nb\na\nc\nb",), ("x\n\n\nx\n\ny",), ("solo",), ("",), (None,)], ["t"]
    )
    got = [r["o"] for r in df.select(tx.trim_repeated_lines(F.col("t")).alias("o")).collect()]
    assert got == ["a\nb\nc", "x\n\n\n\ny", "solo", "", None]

    p = spark.createDataFrame([("p1\n\np2\n\np1\n\np3",)], ["t"])
    assert p.select(tx.trim_repeated_lines(F.col("t"), sep="\n\n").alias("o")).first()["o"] == "p1\n\np2\n\np3"

    nb = spark.createDataFrame([("a\n\n\na",)], ["t"])
    assert nb.select(
        tx.trim_repeated_lines(F.col("t"), keep_blank=False).alias("o")
    ).first()["o"] == "a\n"


def test_trim_repeated_lines_is_pure_expression(spark):
    """No Python stage: the plan must contain no ArrowEvalPython/
    BatchEvalPython node and no exchange."""
    from docetl_spark.functions import text as tx

    df = spark.range(5).select(F.concat(F.lit("l\nl\nm"), F.col("id").cast("string")).alias("t"))
    plan = df.select(tx.trim_repeated_lines(F.col("t")).alias("o"))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan, plan


# ---------------------------------------------------------------- unimax
def _unimax_ref(avail, budget, epochs):
    """The paper's sequential water-filling loop (UniMax Alg. 1)."""
    caps = sorted((epochs * c, g) for g, c in avail.items())
    rem, n, out = budget, len(caps), {}
    for i, (cap, g) in enumerate(caps):
        share = rem / (n - i)
        out[g] = min(cap, share)
        rem -= out[g]
    return out


def test_unimax_plan_matches_paper_loop(spark):
    avail = {"tiny": 10, "small": 50, "mid": 200, "big": 1000}
    rows = [(f"d{g}{i}", g) for g, n in avail.items() for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    for budget, epochs in [(400, 2.0), (50, 1.0), (1200, 1.0), (10_000, 1.5)]:
        plan = training.unimax_plan(df, "source", budget=budget, max_epochs=epochs)
        got = {r["group"]: r["allocated"] for r in plan.collect()}
        want = _unimax_ref(avail, budget, epochs)
        assert all(abs(got[g] - want[g]) < 1e-6 for g in want), (budget, epochs, got, want)


def test_unimax_plan_weight_col_and_epochs(spark):
    rows = [("a", "s1", 100), ("b", "s1", 100), ("c", "s2", 1000)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    plan = {r["group"]: r for r in training.unimax_plan(
        df, "source", budget=600.0, max_epochs=2.0, weight_col="n_tokens"
    ).collect()}
    # s1: 200 tokens, cap 400; share 300 -> saturates? 300 < 400 -> no:
    # uniform split 300/300, s1 upsamples to 1.5 epochs, s2 downsamples
    assert abs(plan["s1"]["allocated"] - 300.0) < 1e-6
    assert abs(plan["s1"]["epochs"] - 1.5) < 1e-9
    assert abs(plan["s2"]["epochs"] - 0.3) < 1e-9


def test_apply_unimax_upsamples_and_downsamples(spark):
    rows = [(f"d{g}{i}", g) for g, n in [("small", 20), ("big", 500)] for i in range(n)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    plan = training.unimax_plan(df, "source", budget=140, max_epochs=3.0)
    # small saturates at 60 (3 epochs): every small row appears EXACTLY 3x
    out = training.apply_unimax(df, plan, "source", id_cols=["doc_id"])
    cnt = {r["source"]: r["n"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert cnt["small"] == 60
    # big gets 80 of 500 -> bernoulli around 80, never more than 1 copy
    assert 40 <= cnt["big"] <= 120
    assert out.filter((F.col("source") == "big") & (F.col("copy") > 1)).count() == 0
    # copy indices on small are exactly {1,2,3} per doc
    copies = out.filter(F.col("source") == "small").groupBy("doc_id").agg(
        F.sort_array(F.collect_list("copy")).alias("cs")
    )
    assert all(r["cs"] == [1, 2, 3] for r in copies.collect())


def test_apply_unimax_zero_copy_rows_vanish(spark):
    df = spark.createDataFrame([("a", "s"), ("b", "s")], ["doc_id", "source"])
    plan = spark.createDataFrame([("s", 0.0)], ["group", "epochs"])
    assert training.apply_unimax(df, plan, "source", id_cols=["doc_id"]).count() == 0
    # unknown group (no plan row) also vanishes rather than erroring
    plan2 = spark.createDataFrame([("other", 2.0)], ["group", "epochs"])
    assert training.apply_unimax(df, plan2, "source", id_cols=["doc_id"]).count() == 0


def test_unimax_plan_rejects_bad_args(spark):
    df = spark.createDataFrame([("a", "s")], ["doc_id", "source"])
    import pytest as _pytest

    with _pytest.raises(ValueError):
        training.unimax_plan(df, "source", budget=0)
    with _pytest.raises(ValueError):
        training.unimax_plan(df, "source", budget=10, max_epochs=0)


def test_frame_verb_sample_unimax(spark):
    from docetl_spark import SemanticFrame

    rows = [(f"d{g}{i}", g) for g, n in [("small", 20), ("big", 500)] for i in range(n)]
    sf = SemanticFrame.from_df(spark.createDataFrame(rows, ["doc_id", "source"]))
    out = sf.sample_unimax("source", budget=140, max_epochs=3.0, id_cols=["doc_id"])
    cnt = {r["source"]: r["n"] for r in
           out.df.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert cnt["small"] == 60 and 40 <= cnt["big"] <= 120
    assert out.plan()[-1] == "sample_unimax"


# -------------------------------------------------- per-group curation cuts
def test_select_top_frac_exact_rank_semantics(spark):
    rows = [(i, "g", float(i)) for i in range(1, 9)]  # scores 1..8
    df = spark.createDataFrame(rows, ["id", "grp", "score"])
    # top 25% of 8 rows: percent_rank over desc = (rank-1)/7 < 0.25
    # -> ranks 1 and 2 -> scores 8, 7
    out = training.select_top_frac(df, "score", 0.25, by=["grp"], tiebreak=["id"])
    assert sorted(r["score"] for r in out.collect()) == [7.0, 8.0]
    # lower-is-better flips the direction
    low = training.select_top_frac(
        df, "score", 0.25, by=["grp"], tiebreak=["id"], higher_is_better=False
    )
    assert sorted(r["score"] for r in low.collect()) == [1.0, 2.0]
    # the best row always survives for any frac > 0 (singleton group)
    one = spark.createDataFrame([(1, "x", 5.0)], ["id", "grp", "score"])
    assert training.select_top_frac(one, "score", 0.01, by=["grp"]).count() == 1
    # frac = 0 keeps nothing; frac = 1.0 is identity (the last-ranked
    # row has percent_rank exactly 1.0 — a strict filter would drop it)
    assert training.select_top_frac(df, "score", 0.0, by=["grp"]).count() == 0
    assert training.select_top_frac(df, "score", 1.0, by=["grp"]).count() == 8
    import pytest as _pytest

    with _pytest.raises(ValueError):
        training.select_top_frac(df, "score", 1.5)


def test_cap_per_group_keeps_best_n(spark):
    rows = [(f"d{g}{i}", g, float(i)) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, ["id", "grp", "score"])
    out = training.cap_per_group(
        df, ["grp"], 3, order=[F.col("score").desc(), F.col("id")]
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], []).append(r["score"])
    assert sorted(got["a"]) == [7.0, 8.0, 9.0] and sorted(got["b"]) == [7.0, 8.0, 9.0]
    # groups under the cap pass through whole
    small = spark.createDataFrame([("x", "c", 1.0)], ["id", "grp", "score"])
    assert training.cap_per_group(small, ["grp"], 3, order=["id"]).count() == 1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        training.cap_per_group(df, ["grp"], 0, order=["id"])
    # order is REQUIRED: without it row_number ties on the partition
    # cols and the surviving subset is run-dependent
    with _pytest.raises(ValueError):
        training.cap_per_group(df, ["grp"], 3, order=[])


def test_select_top_frac_approx_threshold_mode(spark):
    """The no-sort scale path: approx-percentile threshold + broadcast
    filter. On a clean integer score distribution the sketch is exact
    enough to keep the same fraction as the rank path."""
    rows = [(i, "g%d" % (i % 2), float(i)) for i in range(1, 201)]
    df = spark.createDataFrame(rows, ["id", "grp", "score"])
    out = training.select_top_frac(
        df, "score", 0.25, by=["grp"], approx_threshold=True
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["grp"], []).append(r["score"])
    # each group has 100 rows; top-quartile threshold keeps ~25
    for g, scores in got.items():
        assert 23 <= len(scores) <= 27, (g, len(scores))
        assert min(scores) >= 140.0  # top quartile of that group's range
    # global (no by) works and lower-is-better flips the side
    low = training.select_top_frac(
        df, "score", 0.1, approx_threshold=True, higher_is_better=False
    )
    ls = [r["score"] for r in low.collect()]
    assert ls and max(ls) <= 25.0
    # no Window/sort in the plan — the property the mode exists for
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# ---------------------------------------------------- exact-quota splits


def test_assign_splits_exact_quotas(spark):
    from docetl_spark.functions.training import assign_splits_exact

    df = spark.createDataFrame(
        [(i, "en" if i < 100 else "fr") for i in range(140)], ["id", "lang"]
    )
    out = assign_splits_exact(
        df, id_cols=["id"], weights={"train": 8, "val": 1, "test": 1}, strata=["lang"]
    )
    counts = {
        (r["lang"], r["split"]): r["n"]
        for r in out.groupBy("lang", "split").count().withColumnRenamed("count", "n").collect()
    }
    # en: 100 rows -> exactly 80/10/10; fr: 40 rows -> exactly 32/4/4
    assert counts[("en", "train")] == 80 and counts[("en", "val")] == 10 and counts[("en", "test")] == 10
    assert counts[("fr", "train")] == 32 and counts[("fr", "val")] == 4 and counts[("fr", "test")] == 4


def test_assign_splits_exact_uneven_remainder_sums(spark):
    from docetl_spark.functions.training import assign_splits_exact

    # 7 rows at 3:2:2 -> floors 3/2/2 (cumulative-floor always sums to n)
    df = spark.createDataFrame([(i,) for i in range(7)], ["id"])
    out = assign_splits_exact(df, id_cols=["id"], weights={"a": 3, "b": 2, "c": 2})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert sum(counts.values()) == 7
    assert counts == {"a": 3, "b": 2, "c": 2}


def test_assign_splits_exact_deterministic_and_disjoint(spark):
    from docetl_spark.functions.training import assign_splits_exact

    df = spark.createDataFrame([(i,) for i in range(50)], ["id"]).repartition(7)
    a = {r["id"]: r["split"] for r in
         assign_splits_exact(df, id_cols=["id"], weights={"t": 9, "v": 1}).collect()}
    b = {r["id"]: r["split"] for r in
         assign_splits_exact(df.repartition(3), id_cols=["id"], weights={"t": 9, "v": 1}).collect()}
    assert a == b  # partitioning-independent
    assert sum(1 for s in a.values() if s == "t") == 45


def test_assign_splits_exact_rejects_bad_weights(spark):
    import pytest as _pytest

    from docetl_spark.functions.training import assign_splits_exact

    df = spark.createDataFrame([(1,)], ["id"])
    with _pytest.raises(ValueError):
        assign_splits_exact(df, id_cols=["id"], weights={"a": 0, "b": 1})
    with _pytest.raises(ValueError):
        assign_splits_exact(df, id_cols=["id"], weights={"a": 1.5, "b": 1})


def test_assign_splits_exact_global_path_distributed_and_stable(spark):
    """The unstratified path rides the distributed rank: same
    assignments as before, no single-partition window, and exact global
    quotas."""
    from pyspark.sql import functions as F

    from docetl_spark.functions.training import assign_splits_exact

    df = spark.createDataFrame([(i,) for i in range(100)], ["id"]).repartition(8)
    out = assign_splits_exact(df, id_cols=["id"], weights={"t": 8, "v": 1, "e": 1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"t": 80, "v": 10, "e": 10}
    # schema untouched beyond the split column
    assert set(out.columns) == {"id", "split"}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan


def test_cooccurrence_stats_counts_and_lift(spark):
    from docetl_spark.functions.text import cooccurrence_stats

    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "a c"), (4, "b b c")],
        ["doc_id", "text"],
    )
    out = {(r["t_a"], r["t_b"]): (r["df_ab"], r["df_a"], r["df_b"], r["lift"])
           for r in cooccurrence_stats(
               docs, "text", id_col="doc_id", vocab_size=10).collect()}
    # df: a=3 b=3 c=2, N=4
    assert out[("a", "b")] == (2, 3, 3, round(4 * 2 / 9, 6))
    assert out[("a", "c")] == (1, 3, 2, round(4 * 1 / 6, 6))
    assert out[("b", "c")] == (1, 3, 2, round(4 * 1 / 6, 6))
    assert len(out) == 3  # repeated "b b" in doc4 counts once per doc


def test_cooccurrence_vocab_cap_excludes_rare_terms(spark):
    from docetl_spark.functions.text import cooccurrence_stats

    docs = spark.createDataFrame(
        [(1, "a b rare1"), (2, "a b rare2"), (3, "a b")],
        ["doc_id", "text"],
    )
    out = cooccurrence_stats(docs, "text", id_col="doc_id", vocab_size=2).collect()
    terms = {t for r in out for t in (r["t_a"], r["t_b"])}
    assert terms == {"a", "b"}  # rare terms never reach the self-join


def test_cooccurrence_top_pairs_deterministic(spark):
    from docetl_spark.functions.text import cooccurrence_stats

    docs = spark.createDataFrame(
        [(i, "x y z") for i in range(5)] + [(9, "x q")], ["doc_id", "text"]
    )
    out = cooccurrence_stats(
        docs, "text", id_col="doc_id", vocab_size=10, top_pairs=2).collect()
    got = [(r["t_a"], r["t_b"], r["df_ab"]) for r in out]
    # ties broken by (t_a, t_b): x-y and x-z both df_ab=5, y-z dropped? no -
    # all three are 5; top-2 by (df_ab desc, t_a, t_b) = (x,y), (x,z)
    assert got == [("x", "y", 5), ("x", "z", 5)]
