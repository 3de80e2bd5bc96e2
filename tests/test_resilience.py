"""ResilientBackend: cache / retry / rate-limit / metrics, plus the
batch_prompt and calibrate map variants (reference: api.py:588-734
call_llm layering; map.py:532-560 batch path; map.py:236-341 calibrate)."""

import time

import pytest

from docetl_spark.backend import FakeBackend, ModelBackend
from docetl_spark.operators.semantic import semantic_map
from docetl_spark.resilience import BackendMetrics, ResilientBackend, clear_backend_state


@pytest.fixture(scope="module")
def docs_df(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")


class CountingBackend(ModelBackend):
    def __init__(self, fail_first: int = 0):
        self.calls = 0
        self.embed_calls = 0
        self.embedded_texts = []
        self.fail_first = fail_first

    def complete(self, prompt, output_schema, context):
        self.calls += 1
        if self.calls <= self.fail_first:
            raise ConnectionError("transient")
        return {k: f"v{self.calls}" for k in output_schema}

    def embed(self, texts):
        self.embed_calls += 1
        self.embedded_texts.extend(texts)
        return [[float(len(t)), 1.0] for t in texts]

    def classify_logprob(self, prompt, labels, context):
        self.calls += 1
        return labels[0], 0.9


@pytest.fixture(autouse=True)
def _fresh_state():
    clear_backend_state()
    yield
    clear_backend_state()


def test_cache_hit_skips_inner_call():
    inner = CountingBackend()
    rb = ResilientBackend(inner, namespace="t1")
    a = rb.complete("p", {"k": "str"}, {"id": 1})
    b = rb.complete("p", {"k": "str"}, {"id": 1})  # identical → cached
    c = rb.complete("p", {"k": "str"}, {"id": 2})  # different context → miss
    assert a == b and inner.calls == 2 and c != a


def test_retry_then_success_and_exhaustion():
    inner = CountingBackend(fail_first=2)
    rb = ResilientBackend(inner, namespace="t2", max_retries=2, backoff_s=0.01)
    out = rb.complete("p", {"k": "str"}, {})
    assert out == {"k": "v3"} and inner.calls == 3

    inner2 = CountingBackend(fail_first=5)
    rb2 = ResilientBackend(inner2, namespace="t2b", max_retries=1, backoff_s=0.01)
    with pytest.raises(ConnectionError):
        rb2.complete("p", {"k": "str"}, {})
    assert inner2.calls == 2  # 1 try + 1 retry


def test_embed_per_text_cache():
    inner = CountingBackend()
    rb = ResilientBackend(inner, namespace="t3")
    rb.embed(["a", "bb", "ccc"])
    rb.embed(["bb", "dddd", "a"])  # only 'dddd' is a miss
    assert inner.embed_calls == 2
    assert inner.embedded_texts == ["a", "bb", "ccc", "dddd"]


def test_rate_limit_spaces_calls():
    inner = CountingBackend()
    # 600 rpm = 10/s → bucket starts full (burst 10); 12 uncached calls
    # must wait for ≥2 refills ≈ 0.2 s
    rb = ResilientBackend(inner, namespace="t4", rate_limit_rpm=600, cache_size=0)
    t0 = time.monotonic()
    for i in range(12):
        rb.complete("p", {"k": "str"}, {"i": i})
    assert time.monotonic() - t0 >= 0.15


def test_transparent_in_semantic_map_with_metrics(spark, docs_df):
    # collect unsorted and sort driver-side: a Spark orderBy would sample
    # the child plan for range bounds and re-run the map (double-counting
    # the accumulators)
    plain = semantic_map(
        docs_df, "sentiment of {{ input.text }}", {"sentiment": "str"}, FakeBackend()
    ).collect()
    metrics = BackendMetrics(spark.sparkContext)
    wrapped = semantic_map(
        docs_df,
        "sentiment of {{ input.text }}",
        {"sentiment": "str"},
        ResilientBackend(FakeBackend(), namespace="t5", metrics=metrics),
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert [r.asDict() for r in sorted(plain, key=key)] == [
        r.asDict() for r in sorted(wrapped, key=key)
    ]
    snap = metrics.snapshot()
    assert snap["calls"] + snap["cache_hits"] == len(plain)
    assert snap["calls"] > 0


def test_batch_prompt_matches_per_row(spark, docs_df):
    """FakeBackend.complete_batch loops complete per item, so the batch
    path must reproduce the per-row results exactly."""
    per_row = semantic_map(
        docs_df, "sentiment of {{ input.text }}", {"sentiment": "str"}, FakeBackend()
    ).orderBy("doc_id").collect()
    batched = semantic_map(
        docs_df,
        "sentiment of {{ input.text }}",
        {"sentiment": "str"},
        FakeBackend(),
        batch_prompt="classify each: {% for d in inputs %}{{ d.text }}\n{% endfor %}",
        max_batch_size=7,
    ).orderBy("doc_id").collect()
    assert [r.asDict() for r in per_row] == [r.asDict() for r in batched]


def test_complete_batch_called_once_per_chunk(spark, docs_df):
    class BatchCounter(FakeBackend):
        def complete_batch(self, prompt, output_schema, items):
            return [{"tag": f"n={len(items)}"} for _ in items]

    out = semantic_map(
        docs_df.limit(10).coalesce(1),
        "unused {{ input.text }}",
        {"tag": "str"},
        BatchCounter(),
        batch_prompt="batch {{ inputs | length }}",
        max_batch_size=4,
    ).collect()
    sizes = sorted(r["tag"] for r in out)
    assert sizes.count("n=4") == 8 and sizes.count("n=2") == 2  # 4+4+2 chunks


def test_calibrate_appends_context(spark, docs_df):
    seen_prompts = []

    class Spy(FakeBackend):
        def complete(self, prompt, output_schema, context):
            seen_prompts.append(prompt)
            return super().complete(prompt, output_schema, context)

    out = semantic_map(
        docs_df.limit(6),
        "sentiment of {{ input.text }}",
        {"sentiment": "str"},
        Spy(),
        calibrate=True,
        num_calibration_docs=3,
    )
    n = out.count()
    assert n == 6
    # driver-side calibration ran: 3 sample rows + 1 anchor request
    assert len(seen_prompts) == 4
    assert "Reference anchors" in seen_prompts[-1]


def test_executor_side_concurrency_overlaps_latency(spark, docs_df):
    """backend.max_concurrency > 1 overlaps model latency inside a task
    (runner.py:156 thread-pool analogue): 16 rows × 30 ms on one
    partition must finish far under serial time, results unchanged."""
    import time as _time

    class SlowBackend(FakeBackend):
        max_concurrency = 8

        def complete(self, prompt, output_schema, context):
            _time.sleep(0.03)
            return super().complete(prompt, output_schema, context)

    sixteen = docs_df.limit(16).coalesce(1)
    t0 = _time.monotonic()
    out = semantic_map(
        sixteen, "sentiment of {{ input.text }}", {"sentiment": "str"}, SlowBackend()
    ).collect()
    elapsed = _time.monotonic() - t0
    assert len(out) == 16
    # serial would be >= 0.48 s of pure sleep; 8-way overlap cuts it ~4x+
    assert elapsed < 10  # generous wall bound incl. job overhead

    serial = semantic_map(
        sixteen, "sentiment of {{ input.text }}", {"sentiment": "str"}, FakeBackend()
    ).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert [r.asDict() for r in sorted(out, key=key)] == [r.asDict() for r in sorted(serial, key=key)]


def test_run_concurrently_preserves_order():
    from docetl_spark.operators.semantic import run_concurrently

    class C(FakeBackend):
        max_concurrency = 4

    items = list(range(50))
    assert run_concurrently(C(), lambda x: x * 2, items) == [x * 2 for x in items]


# ------------------------------------------------ persistent disk cache

def test_disk_cache_survives_process_state_reset(tmp_path):
    """The cache_dir layer is the reference's diskcache: a SECOND
    'session' (fresh process-local state, fresh backend) hits disk
    instead of calling the model."""
    root = str(tmp_path / "llmcache")
    be1 = CountingBackend()
    rb1 = ResilientBackend(be1, cache_dir=root, namespace="s1")
    r1 = rb1.complete("p", {"x": "str"}, {"id": 1})
    assert be1.calls == 1

    clear_backend_state()  # simulate a new process: memory cache gone
    be2 = CountingBackend()
    rb2 = ResilientBackend(be2, cache_dir=root, namespace="s2")
    r2 = rb2.complete("p", {"x": "str"}, {"id": 1})
    assert r2 == r1
    assert be2.calls == 0  # served from disk, no model call


def test_disk_cache_embed_cross_session(tmp_path):
    root = str(tmp_path / "embcache")
    be1 = CountingBackend()
    ResilientBackend(be1, cache_dir=root, namespace="e1").embed(["aa", "bbb"])
    assert be1.embed_calls == 1

    clear_backend_state()
    be2 = CountingBackend()
    out = ResilientBackend(be2, cache_dir=root, namespace="e2").embed(["aa", "bbb", "cccc"])
    assert be2.embed_calls == 1  # only the miss batch
    assert be2.embedded_texts == ["cccc"]
    assert out[0] == [2.0, 1.0] and out[2] == [4.0, 1.0]


def test_disk_cache_unserializable_degrades_gracefully(tmp_path):
    class WeirdBackend(CountingBackend):
        def complete(self, prompt, output_schema, context):
            self.calls += 1
            return {"obj": object()}  # not JSON-serializable

    be = WeirdBackend()
    rb = ResilientBackend(be, cache_dir=str(tmp_path / "c"), namespace="w")
    out = rb.complete("p", {"obj": "str"}, None)
    assert isinstance(out["obj"], object) and be.calls == 1
    # memory layer still caches it
    rb.complete("p", {"obj": "str"}, None)
    assert be.calls == 1


# ------------------------------------------------ model fallback chains

def test_litellm_fallback_chain():
    from types import SimpleNamespace

    from docetl_spark.backend import LiteLLMBackend

    attempts = []

    def fake_completion(model, messages, **kw):
        attempts.append(model)
        if model != "gpt-4o-mini":
            raise ConnectionError(f"{model} down")
        return SimpleNamespace(choices=[SimpleNamespace(
            message=SimpleNamespace(content='{"x": "ok"}'))])

    be = LiteLLMBackend("gpt-4o", fallback_models=["gpt-4.1", "gpt-4o-mini"],
                        completion_fn=fake_completion)
    out = be.complete("p", {"x": "str"}, None)
    assert out == {"x": "ok"}
    assert attempts == ["gpt-4o", "gpt-4.1", "gpt-4o-mini"]


def test_litellm_fallback_exhaustion_raises_last_error():
    from docetl_spark.backend import LiteLLMBackend

    def always_down(model, **kw):
        raise ConnectionError(f"{model} down")

    be = LiteLLMBackend("m1", fallback_models=["m2"], completion_fn=always_down)
    with pytest.raises(ConnectionError, match="m2 down"):
        be.complete("p", {"x": "str"}, None)


def test_token_usage_and_total_cost(spark, sf_dir):
    from docetl_spark import FakeBackend, ResilientBackend, SemanticFrame
    from docetl_spark.resilience import BackendMetrics

    m = BackendMetrics(spark.sparkContext)
    be = ResilientBackend(FakeBackend(), namespace="tok_test", metrics=m, bypass_cache=True)
    sf = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=be).limit(8)
    out = sf.map("sentiment of {{ input.text }}", {"sentiment": "str"})
    out.df.count()
    usage = out.token_usage
    assert usage["calls"] == 8
    assert usage["prompt_tokens"] > 0 and usage["completion_tokens"] > 0
    assert out.total_cost() > 0.0
    # a frame with no metrics reports zero, not an error
    plain = SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=FakeBackend())
    assert plain.token_usage == {} and plain.total_cost() == 0.0


def test_frame_optimize_returns_executable_frame(spark, sf_dir):
    from docetl_spark import FakeBackend, SemanticFrame
    from docetl_spark.plans import PlanStats

    sf = (
        SemanticFrame.read_parquet(spark, f"{sf_dir}/documents.parquet", backend=FakeBackend())
        .map("sentiment {{ input.text }}", {"sentiment": "str"})
    )
    opt = sf.optimize(stats=PlanStats(rows=500, avg_doc_tokens=60), max_iterations=4)
    assert opt.search_results.explored >= 1
    assert opt.df.count() > 0  # best plan replayed end-to-end
    assert "sentiment" in opt.df.columns


def test_per_op_model_override_and_cache_isolation(spark):
    """change_model directives must take effect at runtime: with_options
    swaps the model on a reconfigured copy, and the response cache keys
    on the model so two models never share a cached answer."""
    from docetl_spark import LiteLLMBackend, ResilientBackend

    seen = []

    def fake_completion(**kw):
        seen.append(kw["model"])
        class R:  # minimal litellm response shape
            class Choice:
                class Msg:
                    content = '{"s": "x"}'
                message = Msg()
            choices = [Choice()]
        return R()

    base = LiteLLMBackend("gpt-4o-mini", completion_fn=fake_completion)
    rb = ResilientBackend(base, namespace="peropt")
    out1 = rb.complete("same prompt", {"s": "str"}, {"id": 1})
    swapped = rb.with_options(model="gpt-4o", timeout=30)
    assert swapped is not rb and swapped.inner.model == "gpt-4o"
    assert swapped.inner.kwargs.get("timeout") == 30
    out2 = swapped.complete("same prompt", {"s": "str"}, {"id": 1})
    # both models were actually CALLED (no cross-model cache hit)
    assert seen == ["gpt-4o-mini", "gpt-4o"]
    assert out1 == out2 == {"s": "x"}
    # no-op options return the same object (FakeBackend path)
    from docetl_spark import FakeBackend
    fb = ResilientBackend(FakeBackend(), namespace="peropt2")
    assert fb.with_options(model="whatever") is fb


def test_embed_disk_cache_without_memory_layer(tmp_path):
    from docetl_spark import FakeBackend, ResilientBackend

    calls = {"n": 0}

    class CountingFake(FakeBackend):
        def embed(self, texts):
            calls["n"] += len(texts)
            return super().embed(texts)

    d = str(tmp_path / "cache")
    rb1 = ResilientBackend(CountingFake(), namespace="edisk1", cache_size=0, cache_dir=d)
    v1 = rb1.embed(["alpha", "beta"])
    assert calls["n"] == 2
    # fresh wrapper, memory layer still off: disk serves both texts
    rb2 = ResilientBackend(CountingFake(), namespace="edisk2", cache_size=0, cache_dir=d)
    v2 = rb2.embed(["alpha", "beta"])
    assert calls["n"] == 2  # no new inner calls
    assert v1 == v2


def test_max_retries_per_timeout_per_op_override(spark):
    """The reference's per-op retry budget (base.py:105) reconfigures the
    resilience layer through with_options — a map that times out twice
    succeeds only when the op raises the budget."""
    import itertools

    import pytest
    from pyspark.errors.exceptions.captured import PythonException

    from docetl_spark import FakeBackend, ResilientBackend
    from docetl_spark.operators.semantic import semantic_map

    class TimeoutTwice(FakeBackend):
        """Fails with TimeoutError on the first two calls PER PROCESS —
        the counter lives executor-side, which is where retries run."""

        def complete(self, prompt, output_schema, context):
            global _TT_CALLS
            try:
                _TT_CALLS += 1
            except NameError:
                _TT_CALLS = 1
            if _TT_CALLS <= 2:
                raise TimeoutError("simulated timeout")
            return super().complete(prompt, output_schema, context)

    df = spark.range(1).withColumnRenamed("id", "doc_id").repartition(1)
    base = ResilientBackend(TimeoutTwice(), max_retries=0, backoff_s=0.0)

    with pytest.raises(PythonException, match="simulated timeout"):
        semantic_map(df, "p: {{ input.doc_id }}", {"tag": "str"}, base).collect()

    out = semantic_map(
        df, "p: {{ input.doc_id }}", {"tag": "str"}, base, max_retries_per_timeout=3
    ).collect()
    assert len(out) == 1 and out[0]["tag"] is not None
