"""Shape operators: split / unnest / unnest_columns / add_uuid.

Reference semantics:
- split          /root/reference/docetl/operations/split.py:11-162
- unnest         /root/reference/docetl/operations/unnest.py:8-253
- unnest_columns /root/reference/docetl/operations/unnest_columns.py:8-109
- add_uuid       /root/reference/docetl/operations/add_uuid.py:7-63

All are pure DataFrame compositions (explode / posexplode / select) —
no Python UDFs except the token_count chunker, which runs as an
Arrow-batched pandas UDF.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F, types as T

# GPT-ish BPE pre-tokenizer regex (public pattern family used by tiktoken's
# cl100k_base). tiktoken itself is unavailable in this container, so token
# counts default to pre-tokenizer pieces — deterministic, and a faithful
# stand-in for chunk boundary behavior (documented deviation). When
# tiktoken IS importable, ``tokenizer="tiktoken"`` (or "auto") selects
# real cl100k BPE boundaries behind the same interface (reference
# split.py:118-136 counts real tokens).
_BPE_SPLIT = re.compile(
    r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+(?!\S)|\s+"
)


def tokenize_approx(text: str) -> list[str]:
    return _BPE_SPLIT.findall(text or "")


_ENC_CACHE: dict = {}


def _tiktoken_encoding(name: str = "cl100k_base"):
    """tiktoken encoding, or None when the package (or its cached BPE
    data) is unavailable — resolved lazily PER WORKER and memoized, so
    the rust Encoding object never has to pickle across the boundary."""
    if name in _ENC_CACHE:
        return _ENC_CACHE[name]
    try:
        import tiktoken  # noqa: PLC0415

        enc = tiktoken.get_encoding(name)
    except Exception:
        enc = None
    _ENC_CACHE[name] = enc
    return enc


def make_token_chunker(num_tokens: int, tokenizer: str = "regex", encoding_name: str = "cl100k_base"):
    """``fn(text) -> list[chunk_str]`` splitting every ``num_tokens``
    tokens. ``tokenizer``: "regex" (default — the deterministic BPE
    pre-tokenizer approximation every SQL oracle can replay),
    "tiktoken" (real cl100k boundaries; raises if unavailable), or
    "auto" (tiktoken when importable, regex fallback). Call INSIDE the
    executor UDF so tiktoken resolves per worker."""
    enc = _tiktoken_encoding(encoding_name) if tokenizer in ("tiktoken", "auto") else None
    if tokenizer == "tiktoken" and enc is None:
        raise ImportError(
            "tokenizer='tiktoken' requested but tiktoken (or its BPE data) is "
            "unavailable; use tokenizer='auto' for a regex fallback"
        )

    if enc is not None:
        def one(text: str) -> list[str]:
            ids = enc.encode(text or "", disallowed_special=())
            return [enc.decode(ids[i : i + num_tokens]) for i in range(0, len(ids), num_tokens)]
        return one

    def one(text: str) -> list[str]:
        toks = tokenize_approx(text)
        return ["".join(toks[i : i + num_tokens]) for i in range(0, len(toks), num_tokens)]
    return one


def split(
    df: DataFrame,
    split_key: str,
    method: str,
    method_kwargs: dict,
    *,
    name: str = "split",
    doc_id: str | Column | None = None,
) -> DataFrame:
    """1 doc -> N chunk rows. Adds ``{split_key}_chunk``, ``{name}_id``
    (per-document id; uuid by default, or a caller-supplied deterministic
    column for oracle-checkable runs) and 1-based ``{name}_chunk_num``.

    delimiter method (split.py:138-160): split on the literal delimiter,
    drop chunks that are empty after strip, group ``num_splits_to_group``
    consecutive splits re-joined with the delimiter, strip each chunk.
    token_count method (split.py:118-136): fixed-size windows of
    approximate BPE tokens.
    """
    chunk_col = f"{split_key}_chunk"
    id_col = f"{name}_id"
    num_col = f"{name}_chunk_num"
    if doc_id is None:
        doc_id = F.expr("uuid()")
    elif isinstance(doc_id, str):
        doc_id = F.col(doc_id).cast("string")

    if method == "delimiter":
        delim = method_kwargs["delimiter"]
        group = int(method_kwargs.get("num_splits_to_group", 1))
        parts = F.filter(
            F.split(F.col(split_key), re.escape(delim), -1),
            lambda x: F.trim(x) != F.lit(""),
        )
        if group > 1:
            n_chunks = F.ceil(F.size(parts) / F.lit(group)).cast("int")
            chunks = F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.trim(F.array_join(F.slice(parts, i * group + 1, group), delim)),
            )
            chunks = F.when(F.size(parts) > 0, chunks).otherwise(F.array().cast("array<string>"))
        else:
            chunks = F.transform(parts, lambda x: F.trim(x))
    elif method == "token_count":
        num_tokens = int(method_kwargs["num_tokens"])
        tokenizer = method_kwargs.get("tokenizer", "regex")
        encoding_name = method_kwargs.get("encoding_name", "cl100k_base")
        if tokenizer == "tiktoken":
            make_token_chunker(num_tokens, tokenizer, encoding_name)  # fail fast on the driver

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def chunk_tokens(s):
            one = make_token_chunker(num_tokens, tokenizer, encoding_name)
            return s.map(one)

        chunks = chunk_tokens(F.col(split_key).cast("string"))
    else:
        raise ValueError(f"unknown split method: {method!r}")

    return (
        df.withColumn(id_col, doc_id)
        .select("*", F.posexplode(chunks).alias("_pos", chunk_col))
        .withColumn(num_col, (F.col("_pos") + 1).cast("long"))
        .drop("_pos")
    )


def unnest(
    df: DataFrame,
    unnest_key: str,
    *,
    keep_empty: bool = False,
    expand_fields: list[str] | None = None,
    recursive: bool = False,
    depth: int | None = None,
) -> DataFrame:
    """Explode a list column in place (element replaces key), or expand a
    struct column's ``expand_fields`` to top level keeping the original
    (unnest.py:96-103). ``keep_empty`` emits a null-element row for
    empty/null arrays (explode_outer; unnest.py:234-244)."""
    dt = df.schema[unnest_key].dataType
    if isinstance(dt, T.StructType):
        fields = expand_fields or [f.name for f in dt.fields]
        for f in fields:
            df = df.withColumn(f, F.col(f"{unnest_key}.{f}"))
        return df

    rounds = max(1, int(depth or 1)) if recursive else 1
    exploder = F.explode_outer if keep_empty else F.explode
    out = df
    for _ in range(rounds):
        if not isinstance(out.schema[unnest_key].dataType, T.ArrayType):
            break
        out = out.withColumn(unnest_key, exploder(F.col(unnest_key)))
    return out


def unnest_columns(df: DataFrame, column: str) -> DataFrame:
    """Flatten a struct column to top-level columns, dropping the source
    (unnest_columns.py:100-107)."""
    dt = df.schema[column].dataType
    if not isinstance(dt, T.StructType):
        raise ValueError(f"unnest_columns requires a struct column, got {dt}")
    others = [c for c in df.columns if c != column]
    return df.select(*others, f"{column}.*")


def add_uuid(df: DataFrame, id_key: str = "uuid_id", *, deterministic_from: str | None = None) -> DataFrame:
    """Row id column. uuid4 analogue via ``uuid()`` (add_uuid.py:7-63);
    pass ``deterministic_from=<col>`` for an oracle-checkable md5-based id."""
    if deterministic_from:
        return df.withColumn(id_key, F.md5(F.col(deterministic_from).cast("string")))
    return df.withColumn(id_key, F.expr("uuid()"))


def melt(
    df: DataFrame,
    id_cols: list[str],
    value_cols: list[str],
    *,
    var_name: str = "variable",
    value_name: str = "value",
) -> DataFrame:
    """Wide-to-long unpivot (pandas ``melt`` / SQL UNPIVOT): one output
    row per (input row, value column), the inverse of the pivot shape.
    Thin wrapper over Spark's native ``unpivot`` (whole-stage-codegen
    Expand node — each input row fans out in place, NO shuffle, NO
    union-of-selects re-scanning the input len(value_cols) times).
    Value columns must share a least common type (Spark casts; mixing
    string and numeric raises)."""
    if not value_cols:
        raise ValueError("melt requires at least one value column")
    missing = [c for c in id_cols + value_cols if c not in df.columns]
    if missing:
        raise ValueError(f"melt: unknown columns {missing}")
    return df.unpivot(
        [F.col(c) for c in id_cols],
        [F.col(c) for c in value_cols],
        var_name,
        value_name,
    )


def json_extract_columns(
    df: DataFrame,
    json_col: str,
    fields: dict[str, str],
    *,
    drop_source: bool = False,
) -> DataFrame:
    """Extract typed columns from a JSON-string column: ``fields`` maps
    output column name -> "path[:cast_type]" (path is a JSONPath-lite
    dotted path WITHOUT the leading $., e.g. ``"k:long"``,
    ``"user.name"``). Malformed JSON / missing paths yield NULL, never
    an error — semi-structured columns at corpus scale always contain
    garbage rows.

    Plan: pure ``get_json_object`` expression chains (JVM, codegen,
    column-pruned) — no from_json schema materialisation, so only the
    requested paths are parsed. For HOT paths extracted repeatedly,
    prefer one ``from_json`` with an explicit schema upstream; this
    operator is the ad-hoc projection form."""
    out = df
    for name, spec in fields.items():
        path, _, cast_t = spec.partition(":")
        col = F.get_json_object(F.col(json_col), f"$.{path}")
        if cast_t:
            # try_cast: a non-numeric value in a numeric path yields
            # NULL under ANSI mode instead of failing the whole job —
            # garbage rows are a given in semi-structured corpora
            col = col.try_cast(cast_t)
        out = out.withColumn(name, col)
    if drop_source:
        out = out.drop(json_col)
    return out


def group_concat(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    *,
    sep: str = ",",
    limit: int | None = None,
    distinct: bool = True,
) -> DataFrame:
    """Per-group sorted string concatenation (SQL ``string_agg`` /
    ``group_concat``) — the denormalized-report shape ("one row per
    nation with its supplier names"). Values sort ascending (binary
    UTF-8 order, engine-independent) so the output string is
    deterministic regardless of shuffle order; ``limit`` keeps only the
    first N sorted values, bounding the output row size.

    Output: ``group_cols`` + ``n_values`` (distinct or total values in
    the group, pre-limit) + ``joined`` (the concatenation; empty string
    for all-NULL groups — NULL values never contribute).

    Plan: one map-side-combinable groupBy (collect_set partials merge
    at the combiner); sort + slice + join run on the collected array.
    The per-group array is the documented state bound — a group's
    (distinct) value set must fit one agg buffer; with ``limit``, cap
    cardinality upstream (e.g. topk first) if groups are unbounded.
    """
    if not group_cols:
        raise ValueError("group_concat requires at least one group column")
    reserved = {"n_values", "joined", "_gc_arr"}
    clash = sorted(reserved & set(group_cols))
    if clash:
        raise ValueError(f"group_concat reserves column names {clash}")
    v = F.col(value_col).cast("string")
    coll = F.collect_set(v) if distinct else F.collect_list(v)
    out = df.groupBy(*group_cols).agg(
        F.array_sort(coll).alias("_gc_arr")
    ).withColumn("n_values", F.size("_gc_arr").cast("long"))
    arr = F.col("_gc_arr")
    if limit is not None:
        if limit < 1:
            raise ValueError("limit must be >= 1")
        arr = F.slice(arr, 1, int(limit))
    return out.select(
        *group_cols, "n_values", F.array_join(arr, sep).alias("joined")
    )
