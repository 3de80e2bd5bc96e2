"""Model-based quality classifier (functions/quality_model.py)."""

import random

from docetl_spark.functions import quality_model as qm


def _corpus(spark, n=200, seed=7):
    rng = random.Random(seed)
    good_vocab = ["clear", "concise", "well", "written", "informative", "accurate"]
    bad_vocab = ["zxq", "wvu", "qqq", "asdf", "jkl", "zzz"]
    rows = []
    for i in range(n):
        label = i % 2
        vocab = good_vocab if label else bad_vocab
        text = " ".join(rng.choice(vocab) for _ in range(rng.randint(8, 20)))
        rows.append((i, text, label))
    return spark.createDataFrame(rows, ["doc_id", "text", "label"])


def test_fit_and_score_separates_classes(spark):
    df = _corpus(spark)
    w, b = qm.fit_quality_classifier(
        df, label_col="label", text_col="text", id_col="doc_id",
        buckets=1 << 12, iters=15, lr=1.0,
    )
    assert w and isinstance(b, float)
    scored = qm.score_quality(
        df, w, text_col="text", id_col="doc_id", bias=b, buckets=1 << 12
    ).join(df.select("doc_id", "label"), "doc_id")
    auc = qm.quality_auc(scored, label_col="label", score_col="quality_prob")
    assert auc > 0.95, auc


def test_score_quality_injected_weights_deterministic(spark):
    import hashlib

    df = spark.createDataFrame(
        [(1, "spark join spark"), (2, "nothing relevant"), (3, "")],
        ["doc_id", "text"],
    )
    bkt = lambda word: int(hashlib.md5(f"qm#{word}".encode()).hexdigest()[:8], 16) % (1 << 15)
    weights = {bkt("spark"): 2.0, bkt("join"): 1.0}
    out = {r["doc_id"]: r["quality_prob"] for r in qm.score_quality(
        df, weights, text_col="text", id_col="doc_id", bias=-1.0
    ).collect()}
    import math
    ln = math.log
    m1 = ln(1 + 2) * 2.0 + ln(1 + 1) * 1.0 - 1.0
    assert abs(out[1] - 1 / (1 + math.exp(-m1))) < 1e-9
    assert abs(out[2] - 1 / (1 + math.exp(1.0))) < 1e-9  # no hits -> sigmoid(bias)
    assert out[3] == out[2]
