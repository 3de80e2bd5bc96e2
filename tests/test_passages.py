"""Passage-level dedup: C4-style duplicate-passage removal and
MOSS-style sampled k-gram fingerprint matching (functions/passages.py)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from docetl_spark.functions import passages


W4 = "alpha beta gamma delta"  # one 4-token chunk
BOILER = "terms of service apply"  # boilerplate repeated across docs


@pytest.fixture()
def pdocs(spark):
    rows = [
        # doc 0: unique chunk + boilerplate
        {"doc_id": 0, "text": f"{W4} {BOILER}"},
        # doc 1: boilerplate first (but doc 0 pos-0... keeper is global
        # min (doc_id,pos): doc 0 wins both its chunks)
        {"doc_id": 1, "text": f"{BOILER} unique one two three"},
        # doc 2: entirely boilerplate -> fully deduped away
        {"doc_id": 2, "text": BOILER},
        # doc 3: short tail chunk (6 tokens -> chunk of 4 + chunk of 2)
        {"doc_id": 3, "text": "six little tokens in this doc"[:0] or "one two three four five six"},
        # doc 4: empty text -> zero chunks
        {"doc_id": 4, "text": "   "},
    ]
    return spark.createDataFrame(rows)


def test_passage_chunks_contract(spark, pdocs):
    out = passages.passage_chunks(pdocs, "text", id_col="doc_id", chunk_tokens=4)
    rows = {(r["doc_id"], r["pos"]): r["chunk"] for r in out.collect()}
    assert rows[(0, 0)] == W4 and rows[(0, 1)] == BOILER
    assert rows[(3, 0)] == "one two three four" and rows[(3, 1)] == "five six"
    assert not any(d == 4 for d, _ in rows)  # empty text -> no chunks


def test_passage_dedup_keep_first_and_rebuild(spark, pdocs):
    out = passages.passage_dedup(pdocs, "text", id_col="doc_id", chunk_tokens=4)
    got = {r["doc_id"]: r for r in out.collect()}
    assert set(got) == {0, 1, 2, 3, 4}  # every doc survives as a row
    # doc 0 keeps both chunks (globally first for each)
    assert got[0]["clean_text"] == f"{W4} {BOILER}"
    assert got[0]["n_chunks_kept"] == 2 and got[0]["n_chunks_total"] == 2
    # doc 1 loses the boilerplate chunk but keeps its unique tail
    assert got[1]["clean_text"] == "unique one two three"
    assert got[1]["n_chunks_kept"] == 1 and got[1]["n_chunks_total"] == 2
    # doc 2 was pure boilerplate -> empty but present
    assert got[2]["clean_text"] == "" and got[2]["n_chunks_kept"] == 0
    # doc 4 empty input -> 0/0
    assert got[4]["n_chunks_total"] == 0 and got[4]["clean_text"] == ""


def test_passage_dedup_plan_is_partial_agg_not_window(spark, pdocs):
    """Keeper election must be an aggregate (map-side combinable), not a
    row_number window — the skew-safety property the module promises."""
    out = passages.passage_dedup(pdocs, "text", id_col="doc_id", chunk_tokens=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan or "SortAggregate" in plan or "ObjectHashAggregate" in plan


def test_sampled_gram_fps_matches_python_mirror(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame([{"doc_id": 7, "text": text}])
    prefixes = tuple("0123456789abcdef")  # sample everything
    out = passages.sampled_gram_fps(
        df, "text", id_col="doc_id", k=3, sample_prefixes=prefixes
    )
    got = sorted(r["fp"] for r in out.collect())
    toks = text.split()
    want = sorted(
        {
            hashlib.md5(" ".join(toks[i : i + 3]).encode()).hexdigest()
            for i in range(len(toks) - 2)
        }
    )
    assert got == want


def test_gram_fingerprint_pairs_finds_verbatim_overlap(spark):
    shared = "zero one two three four five six seven eight nine"
    rows = [
        {"doc_id": 0, "text": f"{shared} unique tail zero"},
        {"doc_id": 1, "text": f"other head words {shared}"},
        {"doc_id": 2, "text": "completely different content with no overlap at all here"},
    ]
    df = spark.createDataFrame(rows)
    out = passages.gram_fingerprint_pairs(
        df,
        "text",
        id_col="doc_id",
        k=4,
        sample_prefixes=tuple("0123456789abcdef"),
        min_common=2,
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert pairs == {(0, 1)}


def test_gram_fingerprint_common_gram_suppression(spark):
    # one gram present in ALL docs: with max_doc_freq=2 it cannot pair
    common = "lorem ipsum dolor sit"
    rows = [{"doc_id": i, "text": f"{common} filler{i} a b c"} for i in range(4)]
    df = spark.createDataFrame(rows)
    allhex = tuple("0123456789abcdef")
    unsupressed = passages.gram_fingerprint_pairs(
        df, "text", id_col="doc_id", k=4, sample_prefixes=allhex, min_common=1
    )
    assert unsupressed.count() == 6  # all pairs via the common gram
    suppressed = passages.gram_fingerprint_pairs(
        df, "text", id_col="doc_id", k=4, sample_prefixes=allhex, min_common=1,
        max_doc_freq=2,
    )
    assert suppressed.count() == 0


def test_incremental_dedup_anti_join_and_batch_first(spark):
    store = spark.createDataFrame(
        [{"doc_id": 100, "text": "Already In The Corpus"}]
    )
    new = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "already in the corpus"},  # dup of store (normalized)
            {"doc_id": 2, "text": "fresh content"},
            {"doc_id": 3, "text": "Fresh   Content"},  # dup of 2 within batch
            {"doc_id": 4, "text": "another new doc"},
        ]
    )
    kept = passages.incremental_dedup(new, store, "text", id_col="doc_id")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 4]
    # fingerprint-store shape gives identical answers
    from docetl_spark.functions.text import fingerprint

    fps = store.select(fingerprint(F.col("text")).alias("fingerprint"))
    kept2 = passages.incremental_dedup(
        new, fps, "text", id_col="doc_id", store_is_fingerprints=True
    )
    assert sorted(r["doc_id"] for r in kept2.collect()) == [2, 4]


def test_frame_verbs_passages_and_set_ops(spark):
    from docetl_spark import SemanticFrame

    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta terms of service apply"},
        {"doc_id": 1, "text": "terms of service apply unique one two three"},
    ]
    sf = SemanticFrame.from_df(spark.createDataFrame(rows))
    out = sf.dedup_passages("text", id_col="doc_id", chunk_tokens=4)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got[1] == "unique one two three"
    assert out.plan()[-1] == "dedup_passages"

    pairs = sf.near_dup_grams(
        "doc_id", "text", k=4, sample_prefixes=tuple("0123456789abcdef"), min_common=1
    )
    assert {(r["id_a"], r["id_b"]) for r in pairs.collect()} == {(0, 1)}

    store = spark.createDataFrame([{"doc_id": 9, "text": "alpha beta gamma delta terms of service apply"}])
    kept = SemanticFrame.from_df(spark.createDataFrame(rows)).dedup_incremental(
        store, "text", id_col="doc_id"
    )
    assert [r["doc_id"] for r in kept.collect()] == [1]

    a = SemanticFrame.from_df(spark.createDataFrame([(1,), (2,), (3,)], "k long"))
    b = spark.createDataFrame([(2,), (3,), (4,)], "k long")
    assert sorted(r["k"] for r in a.intersect(b).collect()) == [2, 3]
    assert sorted(r["k"] for r in a.except_rows(b).collect()) == [1]


def test_yaml_pipeline_with_passage_ops(spark, tmp_path):
    import json

    from docetl_spark import run_pipeline

    data = tmp_path / "docs.json"
    rows = [
        {"doc_id": 0, "text": "alpha beta gamma delta terms of service apply"},
        {"doc_id": 1, "text": "terms of service apply unique one two three"},
    ]
    data.write_text(json.dumps(rows))
    store = tmp_path / "store.json"
    store.write_text(json.dumps([{"doc_id": 9, "text": "terms of service apply"}]))
    cfg = {
        "datasets": {
            "docs": {"type": "file", "path": str(data)},
            "store": {"type": "file", "path": str(store)},
        },
        "operations": [
            {"name": "pd", "type": "dedup_passages", "text_col": "text",
             "id_col": "doc_id", "chunk_tokens": 4},
        ],
        "pipeline": {"steps": [{"name": "clean", "input": "docs", "operations": ["pd"]}]},
    }
    out = run_pipeline(spark, cfg, backend=None)
    got = {r["doc_id"]: r["clean_text"] for r in out.collect()}
    assert got[1] == "unique one two three"

    cfg2 = {
        "datasets": cfg["datasets"],
        "operations": [
            {"name": "inc", "type": "dedup_incremental", "store": "store",
             "text_col": "text", "id_col": "doc_id"},
        ],
        "pipeline": {"steps": [{"name": "kept", "input": "docs", "operations": ["inc"]}]},
    }
    # store doc "terms of service apply" doesn't exactly match either doc -> both kept
    assert run_pipeline(spark, cfg2, backend=None).count() == 2


# ------------------------------------------------- exact-substring dedup
def _substring_ref(rows, k):
    """Pure-python mirror of substring_dedup's contract."""
    import re

    ws = re.compile(r"\s+")
    toks = {i: [t for t in ws.split((t or "").strip()) if t] for i, t in rows}
    occ = {}
    for i in sorted(toks):
        tk = toks[i]
        for p in range(len(tk) - k + 1):
            occ.setdefault(" ".join(tk[p : p + k]), []).append((i, p))
    cov = {i: set() for i in toks}
    for lst in occ.values():
        for (i, p) in sorted(lst)[1:]:
            cov[i].update(range(p, p + k))
    return {
        i: (len(tk), len(cov[i]), " ".join(t for j, t in enumerate(tk) if j not in cov[i]))
        for i, tk in toks.items()
    }


def test_substring_dedup_cuts_spans_at_arbitrary_offsets(spark):
    span = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    rows = [
        (1, f"alpha beta {span} gamma delta"),
        (2, f"one two three {span} four five"),  # same span, different offset
        (3, "entirely unique words that never repeat anywhere else at all"),
    ]
    out = passages.substring_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", id_col="doc_id", min_tokens=8
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # doc 1 is globally first -> untouched
    assert got[1]["dup_tokens"] == 0 and span in got[1]["clean_text"]
    # doc 2 loses exactly the 10-token span despite the offset mismatch
    assert got[2]["dup_tokens"] == 10
    assert got[2]["clean_text"] == "one two three four five"
    assert got[3]["dup_tokens"] == 0


def test_substring_dedup_edge_cases(spark):
    rows = [
        (1, "rep " * 16),          # within-doc self-repetition
        (2, "too short"),          # < k tokens: untouched
        (3, None),                 # null text
        (4, "   "),                # whitespace-only
    ]
    out = passages.substring_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", id_col="doc_id", min_tokens=8
    )
    got = {r["doc_id"]: r for r in out.collect()}
    # 16x "rep": the 9 identical windows sit at pos 0..8; pos 0 is the
    # keeper, pos 1..8 are dups whose [p, p+8) coverage unions to
    # positions 1..15 — only the very first token survives
    assert got[1]["n_tokens"] == 16 and got[1]["dup_tokens"] == 15
    assert got[1]["clean_text"] == "rep"
    assert got[2]["dup_tokens"] == 0 and got[2]["clean_text"] == "too short"
    for d in (3, 4):
        assert got[d]["n_tokens"] == 0 and got[d]["clean_text"] == ""
        assert got[d]["dup_frac"] == 0.0


def test_substring_dedup_matches_python_mirror_random(spark):
    """Randomized corpus with heavy cross-doc and within-doc repetition."""
    import random

    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(30)]
    shared = [" ".join(rng.choice(vocab) for _ in range(12)) for _ in range(4)]
    rows = []
    for i in range(40):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        if rng.random() < 0.7:
            parts.append(rng.choice(shared))
        parts += [rng.choice(vocab) for _ in range(rng.randint(0, 10))]
        rows.append((i, " ".join(parts)))
    out = passages.substring_dedup(
        spark.createDataFrame(rows, ["doc_id", "text"]), "text", id_col="doc_id", min_tokens=5
    )
    got = {r["doc_id"]: (r["n_tokens"], r["dup_tokens"], r["clean_text"]) for r in out.collect()}
    assert got == _substring_ref(rows, 5)


def test_substring_dedup_plan_shape(spark):
    """Keeper election must be a partial aggregate (not a window), and
    window hashing must stay JVM-side (no python UDF evaluation)."""
    df = spark.createDataFrame([(1, "a b c d e f g h i j")], ["doc_id", "text"])
    out = passages.substring_dedup(df, "text", id_col="doc_id", min_tokens=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_substring_dedup_rejects_bad_k(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        passages.substring_dedup(df, "text", id_col="doc_id", min_tokens=0)


def test_yaml_pipeline_dedup_substrings(spark, tmp_path):
    import json

    from docetl_spark import run_pipeline

    span = "the quick brown fox jumps over the lazy dog"  # 9 tokens
    data = tmp_path / "docs.json"
    data.write_text(json.dumps([
        {"doc_id": 0, "text": f"intro {span} outro"},
        {"doc_id": 1, "text": f"other {span} words"},
    ]))
    cfg = {
        "datasets": {"docs": {"type": "file", "path": str(data)}},
        "operations": [
            {"name": "sd", "type": "dedup_substrings", "text_col": "text",
             "id_col": "doc_id", "min_tokens": 8},
        ],
        "pipeline": {"steps": [{"name": "clean", "input": "docs", "operations": ["sd"]}]},
    }
    got = {r["doc_id"]: r for r in run_pipeline(spark, cfg, backend=None).collect()}
    assert got[0]["dup_tokens"] == 0
    assert got[1]["dup_tokens"] == 9 and got[1]["clean_text"] == "other words"


# ------------------------------------------------------------- winnowing
def _winnow_ref(rows, k, w):
    import re

    ws = re.compile(r"\s+")
    out = {}
    for i, t in rows:
        toks = [x for x in ws.split((t or "").strip()) if x]
        hs = [
            hashlib.md5(" ".join(toks[p : p + k]).encode()).hexdigest()
            for p in range(len(toks) - k + 1)
        ]
        n, fps = len(hs), set()
        if n:
            if n < w:
                fps.add(min((hs[p], -p) for p in range(n))[0])
            else:
                for s in range(n - w + 1):
                    fps.add(min((hs[p], -p) for p in range(s, s + w))[0])
        out[i] = fps
    return out


def test_winnowed_fps_match_published_rule(spark):
    import random

    rng = random.Random(11)
    vocab = [f"t{j}" for j in range(15)]
    rows = [(i, " ".join(rng.choice(vocab) for _ in range(rng.randint(0, 25)))) for i in range(40)]
    rows += [(90, None), (91, "a b c"), (92, "x " * 30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for k, w in ((5, 4), (3, 2)):
        got = {}
        for r in passages.winnowed_gram_fps(df, "text", id_col="doc_id", k=k, window=w).collect():
            got.setdefault(r["doc_id"], set()).add(r["fp"])
        want = {i: s for i, s in _winnow_ref(rows, k, w).items() if s}
        assert got == want, (k, w)


def test_winnowed_pairs_detection_guarantee(spark):
    """Any verbatim overlap of >= window+k-1 tokens MUST share a
    fingerprint — the property hex-prefix sampling can't promise."""
    shared = "s1 s2 s3 s4 s5 s6 s7 s8"  # 8 tokens = window+k-1 for (5,4)
    rows = [
        (1, f"a b c {shared} d e"),
        (2, f"p q {shared} r s t"),
        (3, "totally unrelated content with nothing shared at all here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = passages.winnowed_pairs(
        df, "text", id_col="doc_id", k=5, window=4, min_common=1
    )
    pairs = {(r["id_a"], r["id_b"]) for r in out.collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_winnowed_fps_rejects_bad_args(spark):
    df = spark.createDataFrame([(1, "a b")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        passages.winnowed_gram_fps(df, "text", id_col="doc_id", k=0)
    with pytest.raises(ValueError):
        passages.winnowed_gram_fps(df, "text", id_col="doc_id", window=0)
