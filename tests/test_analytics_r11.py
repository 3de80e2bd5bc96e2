"""Round-11 analytics wave: Cohen's kappa, PSI, n-gram novelty —
exact-integer (or bm25-disciplined double) formulations with
brute-force parity, plus frame-verb/YAML drivability."""

import math
import random

import pytest
from pyspark.sql import functions as F

from docetl_spark import FakeBackend, SemanticFrame
from docetl_spark.functions.mlstats import cohen_kappa_by, psi_by
from docetl_spark.functions.text import ngram_novelty

SEEDS = [3, 17]


# ------------------------------------------------------------ kappa

def test_cohen_kappa_hand_checked(spark):
    # classic 2x2: A=[yes x25, no x25] vs B with 20 yes-yes, 5 yes-no,
    # 10 no-yes, 15 no-no -> po=0.7, pe=0.5, kappa=0.4
    rows = ([("y", "y")] * 20 + [("y", "n")] * 5
            + [("n", "y")] * 10 + [("n", "n")] * 15)
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohen_kappa_by(df, "a", "b").collect()[0]
    assert (r["n"], r["n_agree"]) == (50, 35)
    assert (r["po_bp"], r["pe_bp"], r["kappa_bp"]) == (7000, 5000, 4000)


def test_cohen_kappa_degenerate_and_nulls(spark):
    # both raters constant -> pe = 1 -> kappa undefined (NULL)
    one = spark.createDataFrame([("x", "x")] * 5, "a string, b string")
    r = cohen_kappa_by(one, "a", "b").collect()[0]
    assert r["po_bp"] == 10000 and r["kappa_bp"] is None
    # NULLs on either side drop
    df = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "x"), ("y", "x")],
        "a string, b string")
    r2 = cohen_kappa_by(df, "a", "b").collect()[0]
    assert r2["n"] == 2


@pytest.mark.parametrize("seed", SEEDS)
def test_cohen_kappa_matches_bruteforce(spark, seed):
    rng = random.Random(seed)
    rows = [(f"g{i%2}", rng.choice("abc"), rng.choice("abc")) for i in range(120)]
    df = spark.createDataFrame(rows, "g string, a string, b string")
    got = {r["g"]: r for r in cohen_kappa_by(df, "a", "b", by=["g"]).collect()}
    for g in ("g0", "g1"):
        sub = [(a, b) for gg, a, b in rows if gg == g]
        n = len(sub)
        agree = sum(1 for a, b in sub if a == b)
        s = sum(
            sum(1 for a, _ in sub if a == k) * sum(1 for _, b in sub if b == k)
            for k in "abc")
        want_kappa = (agree * n - s) * 10000
        den = n * n - s
        want_kappa = int(want_kappa / den) if want_kappa / den >= 0 else -(-want_kappa // den)
        # truncation toward zero
        q = abs(agree * n - s) * 10000 // abs(den)
        want_kappa = q if ((agree * n - s) >= 0) == (den > 0) else -q
        r = got[g]
        assert (r["n"], r["n_agree"]) == (n, agree)
        assert r["po_bp"] == agree * 10000 // n
        assert r["pe_bp"] == s * 10000 // (n * n)
        assert r["kappa_bp"] == want_kappa


# -------------------------------------------------------------- psi

def test_psi_hand_checked_and_zero_smoothing(spark):
    rows = ([("a", "w1")] * 5 + [("b", "w1")] * 5
            + [("a", "w2")] * 8 + [("b", "w2")] * 1 + [("c", "w2")] * 1)
    df = spark.createDataFrame(rows, "cat string, period string")
    r = psi_by(df, "cat", "period", base="w1", current="w2").collect()[0]
    assert (r["n_base"], r["n_current"], r["n_categories"]) == (10, 10, 3)
    # shares: a 5000/8000, b 5000/1000, c 0->1bp smoothed /1000
    want = round(
        (5000 - 8000) / 1e4 * math.log(5000 / 8000)
        + (5000 - 1000) / 1e4 * math.log(5000 / 1000)
        + (1 - 1000) / 1e4 * math.log(1 / 1000), 6)
    assert r["psi"] == pytest.approx(want, abs=2e-6)
    # identical mixes -> psi 0
    same = spark.createDataFrame(
        [("a", "w1"), ("a", "w2"), ("b", "w1"), ("b", "w2")],
        "cat string, period string")
    assert psi_by(same, "cat", "period", base="w1", current="w2"
                  ).collect()[0]["psi"] == 0.0
    # empty side -> NULL
    empty = psi_by(df.filter(F.col("period") == "w1"),
                   "cat", "period", base="w1", current="w2").collect()[0]
    assert empty["psi"] is None


# ---------------------------------------------------------- novelty

def test_ngram_novelty_first_doc_wins(spark):
    docs = spark.createDataFrame([
        (1, "alpha beta gamma delta"),          # 2 trigrams, all first
        (2, "alpha beta gamma epsilon"),        # 1 of 2 seen in doc 1
        (3, "zz"),                              # < n tokens
        (4, "alpha beta gamma delta"),          # all seen
    ], "doc_id long, text string")
    r = {x["doc_id"]: x for x in ngram_novelty(
        docs, "text", id_col="doc_id", n=3).collect()}
    assert (r[1]["n_ngrams"], r[1]["n_novel"], r[1]["novelty_bp"]) == (2, 2, 10000)
    assert (r[2]["n_ngrams"], r[2]["n_novel"], r[2]["novelty_bp"]) == (2, 1, 5000)
    assert (r[3]["n_ngrams"], r[3]["n_novel"], r[3]["novelty_bp"]) == (0, 0, None)
    assert (r[4]["n_ngrams"], r[4]["n_novel"], r[4]["novelty_bp"]) == (2, 0, 0)
    # repeated grams inside one doc count once (distinct grams)
    dup = spark.createDataFrame(
        [(1, "x y z x y z x y z")], "doc_id long, text string")
    rd = ngram_novelty(dup, "text", id_col="doc_id", n=3).collect()[0]
    # grams: xyz, yzx, zxy (cyclic, distinct) -> 3
    assert rd["n_ngrams"] == 3 and rd["novelty_bp"] == 10000


# ------------------------------------------------------ drivability

def test_wave4_ops_drive_through_yaml(spark):
    from docetl_spark.plans.compiler import run_pipeline

    cfg = {
        "datasets": {"d": {"type": "memory", "data": [
            {"cat": "a", "period": "w1", "ra": "x", "rb": "x",
             "doc_id": 1, "text": "alpha beta gamma delta"},
            {"cat": "a", "period": "w2", "ra": "x", "rb": "y",
             "doc_id": 2, "text": "alpha beta gamma epsilon"},
            {"cat": "b", "period": "w1", "ra": "y", "rb": "y",
             "doc_id": 3, "text": "one two three four"},
            {"cat": "b", "period": "w2", "ra": "y", "rb": "x",
             "doc_id": 4, "text": "five six seven eight"},
        ]}},
        "operations": [
            {"name": "k", "type": "cohen_kappa", "rater_a": "ra", "rater_b": "rb"},
            {"name": "p", "type": "psi", "category_col": "cat",
             "period_col": "period", "base": "w1", "current": "w2"},
            {"name": "nv", "type": "ngram_novelty", "text_col": "text",
             "id_col": "doc_id", "n": 3},
        ],
        "pipeline": {"steps": [
            {"name": "s1", "input": "d", "operations": ["k"]},
            {"name": "s2", "input": "d", "operations": ["p"]},
            {"name": "s3", "input": "d", "operations": ["nv"]},
        ]},
    }
    out = run_pipeline(spark, cfg, backend=FakeBackend())
    assert out.df.count() == 4  # novelty: one row per doc
    k = spark.sql("SELECT * FROM s1").collect()[0]
    assert k["n"] == 4 and 0 <= k["po_bp"] <= 10000
    p = spark.sql("SELECT * FROM s2").collect()[0]
    assert p["n_base"] == 2 and p["psi"] is not None
