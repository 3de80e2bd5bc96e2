"""Property-based tests (hypothesis): cross-implementation equivalence
and operator invariants that the example-based suites cannot sweep.

The reference has no property testing (SURVEY §5); our DuckDB-oracle
gate makes divergence between the Python helpers and their Spark/SQL
twins a correctness bug, so these properties guard exactly those seams.
"""

from hypothesis import given, settings, strategies as st

from docetl_spark.functions.text import shingles_py
from docetl_spark.operators.sample import tokenize_fts_py
from docetl_spark.operators.shape import tokenize_approx

TEXT = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd", "Zs", "Po")),
    max_size=200,
)


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_fts_tokens_are_clean(s):
    toks = tokenize_fts_py(s)
    assert all(t and t == t.lower() for t in toks)
    assert all(all(c.isalnum() for c in t) for t in toks)
    # idempotent under re-tokenization of the joined result
    assert tokenize_fts_py(" ".join(toks)) == toks


@given(TEXT)
@settings(max_examples=200, deadline=None)
def test_bpe_tokenize_reconstructs(s):
    # the BPE-approx pre-tokenizer must partition the string: pieces
    # concatenate back to the original (split boundaries lose nothing)
    toks = tokenize_approx(s)
    assert "".join(toks) == s


@given(TEXT, st.integers(min_value=1, max_value=5))
@settings(max_examples=150, deadline=None)
def test_shingle_contract(s, n):
    sh = shingles_py(s, n)
    assert len(sh) == len(set(sh))  # distinct
    toks = [t for t in sh[0].split(" ")] if sh else []
    if sh and len(sh) > 1:
        # full n-gram mode: every shingle has exactly n tokens
        assert all(len(x.split(" ")) == n for x in sh)
    elif sh:
        assert 1 <= len(toks) <= max(n - 1, 1) or len(sh) == 1


def _group_chunks(tokens, group, delim):
    return [delim.join(tokens[i : i + group]).strip() for i in range(0, len(tokens), group)]


@given(
    st.text(alphabet=st.sampled_from("abc xyz"), max_size=120),
    st.integers(min_value=1, max_value=7),
)
@settings(max_examples=150, deadline=None)
def test_split_grouping_reconstructs(text, group):
    """delimiter split semantics (shape.split): non-empty parts grouped in
    runs of `group`, rejoined with the delimiter — concatenating all
    chunks with the delimiter reproduces the cleaned doc."""
    parts = [p for p in text.split(" ") if p.strip()]
    chunks = _group_chunks(parts, group, " ")
    assert " ".join(c for c in chunks if c) == " ".join(parts)
    if parts:
        assert len(chunks) == -(-len(parts) // group)


@given(st.sets(st.text(alphabet="abcdef", min_size=1, max_size=6), min_size=1, max_size=30))
@settings(max_examples=100, deadline=None)
def test_jaccard_bounds_and_identity(shingle_set):
    def jac(a, b):
        return len(a & b) / len(a | b) if a | b else 1.0

    assert jac(shingle_set, shingle_set) == 1.0
    other = {s + "x" for s in shingle_set}
    assert 0.0 <= jac(shingle_set, other) < 1.0


def test_quality_rules_edges(spark):
    from pyspark.sql import functions as F

    from docetl_spark.functions.text import quality_rules

    rows = [
        {"id": 1, "text": ""},                                  # empty: all fail
        {"id": 2, "text": "one two. three four! " + "word " * 60},  # passes all (min_words=50)
        {"id": 3, "text": "1 2 3 4 5 . " + "9 " * 60},          # numeric: alpha ratio fails
        {"id": 4, "text": "short doc."},                        # word count fails
    ]
    df = spark.createDataFrame(rows)
    out = {
        r["id"]: r
        for r in df.select(
            "id", quality_rules(F.col("text"), min_words=50, min_sentences=1).alias("q")
        ).select("id", "q.*").collect()
    }
    assert not out[1]["passes"] and not out[1]["word_count_ok"]
    assert out[2]["passes"]
    assert not out[3]["alpha_word_ratio_ok"] and not out[3]["passes"]
    assert not out[4]["word_count_ok"] and out[4]["sentence_count_ok"]


def test_pack_sequences_tiling_property(spark):
    """Property: for arbitrary token counts, every doc's pieces tile
    [0, n_tok) exactly and every sequence except the last per shard
    holds exactly `budget` tokens."""
    from hypothesis import given, settings, strategies as st

    from docetl_spark.functions import training
    from pyspark.sql import functions as F

    @settings(max_examples=8, deadline=None)
    @given(
        counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=30),
        budget=st.integers(min_value=1, max_value=16),
    )
    def check(counts, budget):
        rows = [{"doc_id": i, "n": c} for i, c in enumerate(counts)]
        df = spark.createDataFrame(rows, schema="doc_id long, n long")
        out = [
            r.asDict()
            for r in training.pack_sequences(
                df, budget=budget, token_col="n", id_cols=["doc_id"],
                order_cols=["doc_id"], shard_expr=F.col("doc_id") % 2,
            ).collect()
        ]
        for i, c in enumerate(counts):
            pieces = sorted(
                (r["doc_tok_start"], r["doc_tok_end"]) for r in out if r["doc_id"] == i
            )
            if c == 0:
                assert pieces == []
                continue
            assert pieces[0][0] == 0 and pieces[-1][1] == c
            assert all(b == c2 for (a, b), (c2, d) in zip(pieces, pieces[1:]))
        for shard in (0, 1):
            per_seq = {}
            for r in out:
                if r["shard"] == shard:
                    per_seq[r["seq_id"]] = per_seq.get(r["seq_id"], 0) + (
                        r["doc_tok_end"] - r["doc_tok_start"]
                    )
            if per_seq:
                last = max(per_seq)
                for sid, tok in per_seq.items():
                    assert tok == budget if sid != last else tok <= budget

    check()


# ------------------------------------------------ token chunker interface
def _tiktoken_available() -> bool:
    from docetl_spark.operators.shape import _tiktoken_encoding

    return _tiktoken_encoding() is not None


@given(TEXT, st.integers(min_value=1, max_value=8))
@settings(max_examples=100, deadline=None)
def test_token_chunker_regex_reconstructs(s, n):
    from docetl_spark.operators.shape import make_token_chunker

    chunks = make_token_chunker(n)(s)
    assert "".join(chunks) == s
    # the contract: chunks are n-token groups of the ORIGINAL token
    # stream (what the SQL oracle replays). Do NOT assert re-tokenization
    # of a chunk yields n tokens — the pre-tokenizer's \s+(?!\S)
    # lookahead merges a trailing whitespace run once the chunk boundary
    # removes the following non-space (e.g. '0:0 \xa0' + '0'), so
    # tokenization is not stable under concatenation splits.
    from docetl_spark.operators.shape import tokenize_approx

    toks = tokenize_approx(s)
    assert chunks == ["".join(toks[i : i + n]) for i in range(0, len(toks), n)]
    for c in chunks[:-1]:
        assert len(tokenize_approx(c)) <= n  # merges only, never splits


def test_token_chunker_auto_falls_back_or_upgrades():
    from docetl_spark.operators.shape import make_token_chunker

    text = "Hello world, it's a test 123!"
    chunks = make_token_chunker(4, "auto")(text)
    assert "".join(chunks) == text  # either backend partitions losslessly


def test_token_chunker_tiktoken_paths():
    import pytest

    from docetl_spark.operators.shape import make_token_chunker

    if not _tiktoken_available():
        with pytest.raises(ImportError, match="tiktoken"):
            make_token_chunker(4, "tiktoken")
        return
    # real-BPE boundaries: chunk i decodes exactly ids[i*n:(i+1)*n]
    import tiktoken

    enc = tiktoken.get_encoding("cl100k_base")
    text = "The indivisible antidisestablishmentarianism tokens 12345"
    n = 3
    ids = enc.encode(text)
    expect = [enc.decode(ids[i : i + n]) for i in range(0, len(ids), n)]
    assert make_token_chunker(n, "tiktoken")(text) == expect
    assert "".join(expect) == text


def test_split_token_count_tokenizer_knob(spark):
    """split(method=token_count) accepts the tokenizer knob; the default
    regex path is unchanged (split_tokens oracle depends on it)."""
    from docetl_spark.operators.shape import split

    df = spark.createDataFrame([{"doc_id": 1, "text": "alpha beta gamma delta epsilon"}])
    out = split(df, "text", "token_count", {"num_tokens": 4}, doc_id="doc_id")
    out2 = split(df, "text", "token_count", {"num_tokens": 4, "tokenizer": "auto"}, doc_id="doc_id")
    a = [r["text_chunk"] for r in out.orderBy("split_chunk_num").collect()]
    b = [r["text_chunk"] for r in out2.orderBy("split_chunk_num").collect()]
    assert "".join(a) == "alpha beta gamma delta epsilon"
    assert "".join(b) == "alpha beta gamma delta epsilon"


def test_sketch_profiling_tracks_exact_within_tolerance(spark, sf_dir):
    """At 100 TB, profile with sketches (HLL distinct, approx quantiles)
    instead of exact aggregation; verify the sketches track exact values
    on the driver corpus within their advertised error."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(F.explode(F.split(F.trim(F.lower("text")), r"\s+")).alias("t"))
    exact = toks.agg(F.countDistinct("t")).collect()[0][0]
    approx = toks.agg(F.approx_count_distinct("t", rsd=0.02)).collect()[0][0]
    assert abs(approx - exact) / exact < 0.1

    q_exact = docs.agg(F.expr("percentile(n_chars, 0.5)")).collect()[0][0]
    q_approx = docs.agg(F.percentile_approx("n_chars", 0.5, 1000)).collect()[0][0]
    assert abs(q_approx - q_exact) / q_exact < 0.05


def test_minhash_from_hashes_rejects_64bit_hashes(spark):
    """The permutation family's no-wrap guarantee only holds for 32-bit
    base hashes; 64-bit inputs must raise, not silently degrade recall."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from docetl_spark.functions import dedup

    df = spark.createDataFrame([([1 << 40, 5],)], ["h"])
    bad = df.select(dedup.minhash_from_hashes(F.col("h"), 8).alias("m"))
    with _pytest.raises(Exception, match="32-bit"):
        bad.collect()


@given(
    st.lists(st.integers(min_value=1, max_value=20), min_size=2, max_size=5),
    st.integers(min_value=0, max_value=60),
)
@settings(max_examples=25, deadline=None)
def test_split_exact_quota_property(weights, n):
    """Cumulative-floor property (pure python mirror of the operator's
    integer rule): counts always sum to n and each split's count is
    within 1 of its exact share — for ANY weights and group size."""
    W = sum(weights)
    cuts = []
    cum = 0
    for w in weights:
        cum += w
        cuts.append(cum)
    # rank r (1-based) goes to the first i with r*W <= n*cum_i; the last
    # cut always satisfies r*W <= n*W, so every rank lands. This mirrors
    # training.assign_splits_exact's integer rule — the OPERATOR itself
    # is pinned against concrete quotas in test_training (including the
    # Spark expression), this property covers the rule across arbitrary
    # weights/sizes.
    counts = [0] * len(weights)
    for r in range(1, n + 1):
        for i, c in enumerate(cuts):
            if r * W <= n * c:
                counts[i] += 1
                break
    assert sum(counts) == n
    for w, got in zip(weights, counts):
        assert abs(got - n * w / W) < 1, (weights, n, counts)


def _funnel_brute(rows, steps):
    """Independent per-user funnel: first completion of step i among
    events at-or-after step i-1's completion, in (ts, eid) order."""
    out = {}
    by_user = {}
    for eid, user, ts, et in rows:
        by_user.setdefault(user, []).append((ts, eid, et))
    for user, evs in by_user.items():
        evs.sort()
        ts_steps = [None] * len(steps)
        for ts, _eid, et in evs:
            for i, s in enumerate(steps):
                if et == s and ts_steps[i] is None and (i == 0 or ts_steps[i - 1] is not None):
                    break
            else:
                continue
            ts_steps[i] = ts
        out[user] = ts_steps
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),   # user
            st.integers(min_value=0, max_value=30),  # ts
            st.sampled_from(["a", "b", "c", "x"]),   # type
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_funnel_matches_brute_force(spark, events):
    # session-scoped fixture: allowed inside @given (hypothesis only
    # rejects function-scoped fixtures)
    from docetl_spark.functions.timeseries import funnel
    rows = [(i, f"u{u}", ts, et) for i, (u, ts, et) in enumerate(events)]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    got = {
        r["user_id"]: [r["step1_ts"], r["step2_ts"], r["step3_ts"]]
        for r in funnel(df, ["a", "b", "c"], tiebreak="event_id").collect()
    }
    want = _funnel_brute(rows, ["a", "b", "c"])
    assert got == want


# ------------------------------------------------- round-6 analytics ops

def _twa_brute(rows):
    """Per-key trapezoid: sum((v_i+v_{i+1})/2 * dt) / duration, mean when
    duration is zero. Pure-python twin of timeseries.time_weighted_avg."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, t, v in rows:
        by_key[k].append((t, v))
    out = {}
    for k, pts in by_key.items():
        pts.sort()
        dur = pts[-1][0] - pts[0][0]
        if dur == 0:
            out[k] = sum(v for _, v in pts) / len(pts)
            continue
        num = sum(
            (pts[i][1] + pts[i + 1][1]) * (pts[i + 1][0] - pts[i][0])
            for i in range(len(pts) - 1)
        )
        out[k] = num / (2.0 * dur)
    return out


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),      # key
            st.integers(min_value=-10**6, max_value=10**6),  # ts
            st.integers(min_value=-1000, max_value=1000),    # value
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda r: (r[0], r[1]),  # unique ts per key: brute sorts by ts only
    )
)
@settings(max_examples=15, deadline=None)
def test_time_weighted_avg_matches_brute_force(spark, rows):
    from docetl_spark.functions.timeseries import time_weighted_avg

    df = spark.createDataFrame(rows, ["k", "t", "v"])
    got = {r["k"]: r["twa"]
           for r in time_weighted_avg(df, "t", "v", keys=["k"]).collect()}
    want = _twa_brute(rows)
    assert got.keys() == want.keys()
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2),           # key
            st.integers(min_value=-100, max_value=100),      # ts
            st.integers(min_value=0, max_value=9),           # value
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=15, deadline=None)
def test_gap_fill_grid_is_dense_and_locf_total(spark, rows):
    """Invariants: per key the bucket grid is gapless min..max; observed
    buckets keep their exact sum; gap rows carry the previous observed
    sum; n/sum are never lost (total preserved)."""
    import pyspark.sql.functions as F

    from docetl_spark.functions.timeseries import gap_fill

    df = spark.createDataFrame(rows, ["k", "t", "v"])
    out = gap_fill(df, "t", keys=["k"], bucket_width=7,
                   aggs={"n": F.count(F.lit(1)), "s": F.sum("v")},
                   locf_cols=["s"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["k"], []).append(r)
    # brute buckets (floor division matches the exact-floor DIV pattern)
    from collections import defaultdict
    want = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for k, t, v in rows:
        b = t // 7
        want[k][b][0] += 1
        want[k][b][1] += v
    assert by_key.keys() == want.keys()
    for k, rs in by_key.items():
        rs.sort(key=lambda r: r["bucket_start"])
        starts = [r["bucket_start"] for r in rs]
        lo, hi = min(want[k]), max(want[k])
        assert starts == [b * 7 for b in range(lo, hi + 1)]  # dense grid
        last_seen = None
        for r in rs:
            b = r["bucket_start"] // 7
            if b in want[k]:
                assert (r["n"], r["s"]) == tuple(want[k][b])
                last_seen = r["s"]
                assert r["s_filled"] == r["s"]
            else:
                assert r["n"] is None and r["s"] is None
                assert r["s_filled"] == last_seen  # LOCF carries forward
        assert sum(r["n"] or 0 for r in rs) == sum(c for c, _ in want[k].values())


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),       # user
            st.integers(min_value=-50, max_value=50),    # ts
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=15, deadline=None)
def test_cohort_retention_matches_brute_force(spark, rows):
    from collections import defaultdict

    from docetl_spark.functions.timeseries import cohort_retention

    df = spark.createDataFrame(rows, ["u", "t"])
    got = {(r["cohort_period"], r["period_offset"]): (r["n_active"], r["cohort_size"])
           for r in cohort_retention(df, "t", "u", period=10).collect()}
    first = {}
    active = defaultdict(set)
    for u, t in rows:
        p = t // 10
        first[u] = min(first.get(u, p), p)
        active[u].add(p)
    sizes = defaultdict(int)
    for u, c in first.items():
        sizes[c] += 1
    want = defaultdict(int)
    for u, ps in active.items():
        for p in ps:
            want[(first[u] * 10, p - first[u])] += 1
    assert got == {k: (n, sizes[k[0] // 10]) for k, n in want.items()}
