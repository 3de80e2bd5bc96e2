"""Sample operator family: first / uniform / custom / stratified /
outliers / top_embedding / top_fts (BM25).

Reference semantics: /root/reference/docetl/operations/sample.py:13-713.
Deviations (documented):

- The reference operates on an ordered in-memory list; Spark DataFrames
  are unordered, so positional methods (``first``) take an explicit
  ``order_by`` and tie-breaks are (score desc, tiebreak asc) instead of
  numpy argsort artifacts (sample.py:650-660). Deterministic either way.
- ``uniform`` with an integer count uses md5-hash-ordered selection when
  given ``hash_key`` (deterministic, oracle-checkable, scales as a
  top-k); plain ``df.sample`` fraction sampling otherwise.

Scale notes: top-k paths compile to TakeOrderedAndProject (no global
sort); BM25 is fully distributed (explode -> partial-agg counts ->
broadcast joins of tiny term stats); outliers' center/variance reduce to
a single aggregated row collected to the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W, functions as F

# rank_bm25.BM25Okapi constants (public package; reference sample.py:570)
BM25_K1 = 1.5
BM25_B = 0.75
BM25_EPSILON = 0.25

FTS_TOKEN_RE = r"[^a-z0-9\s]"


def tokenize_fts(col) -> F.Column:
    """lower -> split on non-alphanumeric runs -> drop empty edge tokens
    (equivalent to the reference's strip-punctuation + collapse-ws +
    split, preprocess_text sample.py:625-633, in ONE regex pass — the
    two-regexp_replace formulation rewrote the full text twice)."""
    parts = F.split(F.lower(col), r"[^a-z0-9]+")
    return F.filter(parts, lambda x: x != F.lit(""))


def tokenize_fts_py(text: str) -> list[str]:
    import re

    t = re.sub(r"\s+", " ", re.sub(FTS_TOKEN_RE, " ", (text or "").lower())).strip()
    return t.split() if t else []


def sample_first(df: DataFrame, samples: int | float, order_by: list) -> DataFrame:
    n = samples if isinstance(samples, int) else int(samples * df.count())
    return df.orderBy(*order_by).limit(n)


def sample_uniform(
    df: DataFrame,
    samples: int | float,
    *,
    seed: int | None = None,
    hash_key: list[str] | None = None,
) -> DataFrame:
    if hash_key:
        h = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in hash_key]))
        if isinstance(samples, float):
            # deterministic Bernoulli via hash prefix
            cut = format(int(samples * 0xFFFF), "04x")
            return df.filter(F.substring(h, 1, 4) < F.lit(cut))
        return df.orderBy(h).limit(int(samples))
    if isinstance(samples, float):
        return df.sample(fraction=samples, seed=seed or 42)
    frac_df = df.sample(fraction=1.0, seed=seed or 42)
    return frac_df.limit(int(samples))


def sample_custom(df: DataFrame, samples: list[dict]) -> DataFrame:
    """Keep rows matching the provided key dicts (sample.py:465-484)."""
    if not samples:
        return df.limit(0)
    keys = list(samples[0].keys())
    spark = df.sparkSession
    lookup = spark.createDataFrame([tuple(s.get(k) for k in keys) for s in samples], schema=keys)
    cast_lookup = lookup.select(*[F.col(k).cast(df.schema[k].dataType).alias(k) for k in keys])
    return df.join(F.broadcast(cast_lookup.dropDuplicates()), on=keys, how="left_semi")


def sample_stratified_first(
    df: DataFrame, samples_per_group: int, stratify_key: str | list[str], order_by: list
) -> DataFrame:
    keys = [stratify_key] if isinstance(stratify_key, str) else list(stratify_key)
    w = W.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= samples_per_group)
        .drop("_rn")
    )


# ---------------------------------------------------------------- outliers
def _euclidean(col, center: list[float]) -> F.Column:
    center_col = F.lit(center).cast("array<double>") if not isinstance(center, F.Column) else center
    sq = F.zip_with(col.cast("array<double>"), center_col, lambda x, c: (x - c) * (x - c))
    return F.sqrt(F.aggregate(sq, F.lit(0.0), lambda acc, v: acc + v))


def sample_outliers(
    df: DataFrame,
    embedding_col: str,
    *,
    std: float | None = None,
    samples: int | float | None = None,
    keep: bool = False,
    center: list[float] | None = None,
) -> DataFrame:
    """Distance-from-center cutoff (sample.py:421-463). Center/variance
    come from one aggregated row (per-dimension sums via posexplode +
    pivot-free groupBy) — no O(n) driver collect."""
    emb = F.col(embedding_col).cast("array<double>")
    total: int | None = None
    if center is None or std is not None:
        # posexplode_OUTER: rows with a NULL/empty embedding yield one
        # (_pos NULL) row, so the row count ridden on this agg equals
        # df.count() exactly (a plain posexplode would silently shrink
        # fraction-based sample sizes — and an all-null column would
        # report 0 rows); the count-cutoff path below then never scans
        # the input a second time
        stats = (
            df.select(F.posexplode_outer(emb).alias("_pos", "_v"))
            .groupBy("_pos")
            .agg(
                F.avg("_v").alias("mean"),
                F.avg(F.col("_v") * F.col("_v")).alias("meansq"),
                F.count(F.lit(1)).alias("cnt"),
            )
            .orderBy("_pos")
            .collect()
        )
        # _pos NULL sorts first; real dims follow in order
        null_cnt = sum(r["cnt"] for r in stats if r["_pos"] is None)
        dim_rows = [r for r in stats if r["_pos"] is not None]
        means = [r["mean"] for r in dim_rows]
        variances = [r["meansq"] - r["mean"] * r["mean"] for r in dim_rows]
        total = (dim_rows[0]["cnt"] if dim_rows else 0) + null_cnt
    if center is None:
        center = means
    dist = _euclidean(emb, center)
    scored = df.withColumn("_dist", dist)

    if std is not None:
        cutoff = math.sqrt(sum(max(v, 0.0) for v in variances)) * std
    else:
        if total is None:  # explicit center + count cutoff: one count job
            total = df.count()
        n = samples if isinstance(samples, int) else int(samples * total)
        kth = scored.select("_dist").orderBy("_dist").limit(min(n, total - 1) + 1).collect()
        cutoff = kth[-1]["_dist"]

    cond = (F.col("_dist") > cutoff) if keep else (F.col("_dist") <= cutoff)
    return scored.filter(cond).drop("_dist")


# ---------------------------------------------------------- top_embedding
def cosine_sim(a, b) -> F.Column:
    a = a.cast("array<double>") if not isinstance(a, F.Column) else a
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def sample_top_embedding(
    df: DataFrame,
    query_vector: list[float],
    samples: int,
    *,
    embedding_col: str = "embedding",
    name: str = "sample",
    tiebreak: list | None = None,
    stratify_key: str | list[str] | None = None,
    round_score: int | None = None,
) -> DataFrame:
    """Cosine-similarity top-k with ``_<name>_rank`` / ``_<name>_score``
    (sample.py:486-545). Global path = sort-free TakeOrdered; stratified
    path = per-group row_number window."""
    q = F.lit([float(x) for x in query_vector]).cast("array<double>")
    emb = F.col(embedding_col).cast("array<double>")
    score = cosine_sim(emb, q)
    if round_score is not None:
        score = F.round(score, round_score)
    scored = df.withColumn(f"_{name}_score", score)
    order = [F.col(f"_{name}_score").desc()] + [c if not isinstance(c, str) else F.col(c).asc() for c in (tiebreak or [])]
    if stratify_key:
        keys = [stratify_key] if isinstance(stratify_key, str) else list(stratify_key)
        w = W.partitionBy(*keys).orderBy(*order)
        return (
            scored.withColumn(f"_{name}_rank", F.row_number().over(w))
            .filter(F.col(f"_{name}_rank") <= samples)
        )
    top = scored.orderBy(*order).limit(samples)
    from ..functions.stats import bounded_global_window
    w = bounded_global_window(f"_{name}_score", *order)  # k rows only
    return top.withColumn(f"_{name}_rank", F.row_number().over(w).cast("long"))


# ----------------------------------------------------------------- top_fts
def bm25_scores(
    df: DataFrame,
    query: str,
    keys: list[str],
    id_cols: list[str],
    *,
    score_col: str = "_score",
) -> DataFrame:
    """Okapi BM25 scores of every row against ``query`` (rank_bm25
    formulas: idf = ln(N-df+0.5) - ln(df+0.5), negative idfs floored at
    epsilon * corpus-average idf; reference sample.py:547-671).

    Distributed shape: tokenize -> explode -> (id, term) tf counts ->
    per-term doc frequencies (tiny, broadcast) -> rejoin. The corpus
    average idf needs full-vocab doc frequencies — one extra
    aggregation, reused for all query terms.
    """
    import math

    text = F.concat_ws(" ", *[F.col(k).cast("string") for k in keys])
    docs = df.withColumn("_tokens", tokenize_fts(text)).withColumn("_dl", F.size("_tokens"))
    docs.cache()

    q_tokens = tokenize_fts_py(query)
    q_mult: dict[str, int] = {}
    for t in q_tokens:
        q_mult[t] = q_mult.get(t, 0) + 1
    uniq = list(q_mult)

    # job 1: corpus size, average doc length AND per-query-term document
    # frequencies in ONE scalar aggregation — array_contains per term, no
    # explode (long docs × small vocab would explode to dl×n rows).
    aggs = [F.count(F.lit(1)).alias("n"), F.avg("_dl").alias("avgdl")] + [
        F.sum(F.array_contains("_tokens", t).cast("long")).alias(f"_df_{i}")
        for i, t in enumerate(uniq)
    ]
    stats = docs.agg(*aggs).collect()[0]
    n_docs, avgdl = stats["n"], float(stats["avgdl"] or 0.0)
    if not q_tokens or n_docs == 0:
        docs.unpersist()
        return df.withColumn(score_col, F.lit(0.0))

    # job 2: full-vocab doc frequencies -> corpus average idf (rank_bm25
    # epsilon floor). array_distinct first: the explode is vocab-sized per
    # doc, not token-count-sized.
    idf_expr = F.log(F.lit(float(n_docs)) - F.col("_df") + 0.5) - F.log(F.col("_df") + 0.5)
    idf_stats = (
        docs.select(F.explode(F.array_distinct("_tokens")).alias("_term"))
        .groupBy("_term").agg(F.count(F.lit(1)).alias("_df"))
        .select(idf_expr.alias("_idf"))
        .agg(F.sum("_idf").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()[0]
    )
    avg_idf = float(idf_stats["s"]) / float(idf_stats["c"]) if idf_stats["c"] else 0.0
    eps_floor = BM25_EPSILON * avg_idf

    idf_map: dict[str, float] = {}
    for i, t in enumerate(uniq):
        dfc = int(stats[f"_df_{i}"] or 0)
        if dfc == 0:
            continue
        v = math.log(n_docs - dfc + 0.5) - math.log(dfc + 0.5)
        idf_map[t] = v if v >= 0 else eps_floor
    if not idf_map:
        docs.unpersist()
        return df.withColumn(score_col, F.lit(0.0))

    # job 3 (lazy): per-row contributions as pure expressions — tf is a
    # counting filter over the token array, so scoring needs NO shuffle.
    def _match(term):
        # single-arg lambda: a 2-arg lambda would receive the element
        # INDEX as its second argument (PySpark HOF calling convention)
        return lambda x: x == F.lit(term)

    contribs = []
    for t in uniq:
        if t not in idf_map:
            continue
        widf = idf_map[t] * q_mult[t]
        tf = F.size(F.filter("_tokens", _match(t))).cast("double")
        contribs.append(
            F.lit(widf)
            * (tf * (BM25_K1 + 1))
            / (tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("_dl") / F.lit(avgdl)))
        )
    total = contribs[0]
    for c in contribs[1:]:
        total = total + c
    return docs.withColumn(score_col, total).drop("_tokens", "_dl")


def sample_top_fts(
    df: DataFrame,
    query: str,
    samples: int,
    *,
    keys: list[str],
    id_cols: list[str],
    name: str = "sample",
    tiebreak: list | None = None,
    stratify_key: str | list[str] | None = None,
    round_score: int | None = None,
) -> DataFrame:
    score_col = f"_{name}_score"
    scored = bm25_scores(df, query, keys, id_cols, score_col=score_col)
    if round_score is not None:
        scored = scored.withColumn(score_col, F.round(score_col, round_score))
    order = [F.col(score_col).desc()] + [F.col(c).asc() if isinstance(c, str) else c for c in (tiebreak or id_cols)]
    if stratify_key:
        strat = [stratify_key] if isinstance(stratify_key, str) else list(stratify_key)
        w = W.partitionBy(*strat).orderBy(*order)
        return scored.withColumn(f"_{name}_rank", F.row_number().over(w).cast("long")).filter(
            F.col(f"_{name}_rank") <= samples
        )
    top = scored.orderBy(*order).limit(samples)
    from ..functions.stats import bounded_global_window
    w = bounded_global_window(score_col, *order)  # k rows only
    return top.withColumn(f"_{name}_rank", F.row_number().over(w).cast("long"))


def smart_sample(df: DataFrame, sample_size_needed: int, *, max_unique_values: int = 5) -> DataFrame:
    """Optimizer sampling heuristic (reference utils.py:352-387): detect
    up to 3 low-cardinality "categorical" fields (<= ``max_unique_values``
    distinct values), take the LONGEST documents per category combination
    (ceil(k / n_groups) each), then the global longest ``k``. Long docs
    stress prompts hardest, and the stratification keeps rare categories
    represented — that's what makes optimizer samples informative.

    Spark-first: cardinalities come from ONE approx_count_distinct
    aggregation pass (not a per-field set over collected rows); the
    per-group pick is a length-ordered window; doc length is
    ``length(to_json(struct(*)))``, mirroring the reference's
    ``len(json.dumps(doc))`` score. Ties break by length desc then the
    serialized doc for determinism."""
    # serialize each row ONCE: the json string is both the length score
    # and the deterministic tiebreak (re-building to_json inside every
    # sort expression would pay the serialization 2-3x per row)
    base = df.withColumn("_ss_json", F.to_json(F.struct(*[F.col(c) for c in df.columns])))
    cards = base.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.approx_count_distinct(F.col(c).cast("string")).alias(f"_d_{c}") for c in df.columns],
    ).first()
    if cards["_n"] <= sample_size_needed:
        return df
    cats = sorted(
        ((cards[f"_d_{c}"], c) for c in df.columns if cards[f"_d_{c}"] <= max_unique_values),
    )[:3]
    order = [F.length("_ss_json").desc(), F.col("_ss_json").asc()]
    if not cats:
        return base.orderBy(*order).limit(sample_size_needed).drop("_ss_json")
    group_cols = [c for _, c in cats]
    # exact group count at categorical cardinality (product of <=5-unique
    # fields — a tiny agg; approx per-field counts can't give the joint)
    n_groups = base.groupBy(*[F.col(c).cast("string") for c in group_cols]).count().count()
    per_group = math.ceil(sample_size_needed / max(n_groups, 1))
    w = W.partitionBy(*[F.col(c).cast("string") for c in group_cols]).orderBy(*order)
    picked = base.withColumn("_ss_rn", F.row_number().over(w)).filter(F.col("_ss_rn") <= per_group)
    return picked.orderBy(*order).limit(sample_size_needed).drop("_ss_json", "_ss_rn")
