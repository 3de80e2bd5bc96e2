"""Time-series operators the reference lacks entirely (SURVEY.md §1.4:
"None. The reference is batch-only") and Spark lacks as built-ins:
as-of join, binned range join, hierarchical time rollup.

Scale posture:
- ``asof_join`` is the union-and-window formulation: tag both sides,
  union, one window over (keys, ts) carrying the last right-side values
  forward. ONE shuffle on the join keys, no join operator at all —
  the classic scalable as-of that never materializes candidate pairs
  (a naive range join is O(n*m) per key).
- ``range_join`` bins time so interval containment becomes an equi-join
  on (keys, bin): intervals explode to the bins they cover, points map
  to exactly one bin — no duplicate pairs, no theta-join. Bin width
  trades explode factor against join selectivity.
- ``time_rollup`` is one pass with ROLLUP grouping sets: Spark computes
  minute/hour/day aggregates sharing partial aggregation, instead of
  three scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

_LAST_ROWS = W.unboundedPreceding, W.currentRow


def _stream_order(*cols) -> list:
    """ANSI/DuckDB-parity stream ordering: every ASC sort key NULLS
    LAST, in ONE place. Spark's bare ``.asc()`` is NULLS FIRST while
    every SQL oracle the driver replays (and the ANSI default) orders
    NULLS LAST — a NULL ts/tiebreak row would take a different stream
    position per engine and silently shift every window it touches.
    Accepts column names or Columns and SKIPS None (so call sites pass
    an optional tiebreak straight through); descending keys stay
    per-site (``.desc()`` already defaults NULLS LAST on both
    engines)."""
    return [
        (F.col(c) if isinstance(c, str) else c).asc_nulls_last()
        for c in cols if c is not None
    ]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance: int | None = None,
    suffix: str = "_r",
    right_tiebreak: str | None = None,
    hot_key_bucket: int | None = None,
) -> DataFrame:
    """For every left row, attach the nearest right row at-or-before
    (``backward``) / at-or-after (``forward``) its timestamp within the
    same ``on`` keys. Right columns arrive suffixed; the matched right
    timestamp arrives as ``{right_ts}{suffix}``. ``tolerance`` (same
    unit as the ts columns) nulls matches further away than that.
    ``right_tiebreak``: column ordering right rows that share a
    timestamp (last one wins) — pass one for deterministic output.

    Implementation: union both sides with a side tag, then ONE window
    partitioned by the keys, ordered by (ts, side) so a right row at
    the exact left timestamp is visible to it; last(ignorenulls) carries
    right values forward. No join operator, one exchange.

    Skew posture: the default plan puts each key's full timeline in ONE
    task — a key owning 10% of a 100 TB events table is a straggler (or
    an OOM). ``hot_key_bucket`` — a bucket width in the SAME UNITS as the
    ts columns after their cast to long (nanoseconds for epoch-ns
    columns: one hour = 3600 * 10**9) — opts into the bucketed plan:
    windows partition by (key, ts-bucket) so the max task is one key's
    rows within one bucket, with per-bucket carry-in rows (the value a
    bucket inherits from earlier buckets, computed on the
    right-side-only bucket summary — #buckets rows per key, not #rows)
    unioned in so results are IDENTICAL to the default plan. Costs two
    extra small exchanges; pick a width ~ the span that keeps one
    (key, bucket) in memory.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    # int() FIRST: a fractional width in (0, 1) passes a bare > 0 check
    # and then truncates to a divide-by-zero bucket expression
    if hot_key_bucket is not None and int(hot_key_bucket) <= 0:
        raise ValueError(
            "hot_key_bucket must be a positive bucket width in the ts "
            "columns' long units (ns for epoch-nanos timestamps)"
        )
    rts_out = f"{right_ts}{suffix}"
    lt = left.withColumn("_ats", F.col(left_ts).cast("long")).withColumn("_side", F.lit(1))
    rsel = [F.col(c).alias(f"{c}{suffix}") for c in right_cols]
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0)
    )
    rt = (
        right.select(
            *[F.col(k) for k in on],
            F.col(right_ts).cast("long").alias("_ats"),
            F.col(right_ts).cast("long").alias(rts_out),
            tb.alias("_rtb"),
            *rsel,
        )
        .withColumn("_side", F.lit(0))
    )
    u = lt.unionByName(rt, allowMissingColumns=True)
    if direction == "backward":
        order = [F.col("_ats").asc(), F.col("_side").asc(), F.col("_rtb").asc_nulls_first()]
    else:
        order = [F.col("_ats").desc(), F.col("_side").asc(), F.col("_rtb").desc_nulls_first()]
    carried = [f"{c}{suffix}" for c in right_cols] + [rts_out]

    if hot_key_bucket is None:
        w = W.partitionBy(*on).orderBy(*order).rowsBetween(*_LAST_ROWS)
        out = u
        for c in carried:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
        out = out.filter(F.col("_side") == 1).drop("_ats", "_side", "_rtb")
    else:
        backward = direction == "backward"
        width = int(hot_key_bucket)
        # floor division in LONG arithmetic: `/` would go through double,
        # whose 53-bit mantissa misbuckets ns-epoch values near bucket
        # boundaries (e.g. 472399*3600e9 - 1 floors UP) — breaking the
        # results-identical contract. (x - pmod(x, w)) DIV w is exact
        # floor division for any sign.
        bkt = F.expr(f"(_ats - pmod(_ats, {width})) DIV {width}")
        u = u.withColumn("_bkt", bkt)
        rt_b = rt.withColumn("_bkt", bkt)

        # (a) per-(key, bucket) carry-OUT: the carried values after the
        # bucket's final right row (in window order) — right rows only,
        # so this summary is #right-rows in, #buckets out
        w_full = (
            W.partitionBy(*on, "_bkt").orderBy(*order)
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        )
        co = rt_b
        for c in carried:
            co = co.withColumn(c, F.last(c, ignorenulls=True).over(w_full))
        co = co.select(*on, "_bkt", *carried).dropDuplicates([*on, "_bkt"])

        # (b) carry-IN per bucket = last carry-out over EARLIER buckets
        # (later, for forward) — a per-key window over the tiny bucket
        # summary (#buckets rows per key, never #rows)
        bkts = u.select(*on, "_bkt").dropDuplicates()
        co_full = bkts.join(co, [*on, "_bkt"], "left")
        w_carry = (
            W.partitionBy(*on)
            .orderBy(F.col("_bkt").asc() if backward else F.col("_bkt").desc())
            .rowsBetween(W.unboundedPreceding, -1)
        )
        carry = co_full
        for c in carried:
            carry = carry.withColumn(c, F.last(c, ignorenulls=True).over(w_carry))
        # carry rows sort before every real row of their bucket:
        # _ats = bucket boundary, _side = -1 (< right's 0 at equal ts)
        boundary = (
            F.col("_bkt") * width if backward else (F.col("_bkt") + 1) * width - 1
        )
        carry = (
            carry.filter(F.col(rts_out).isNotNull())
            .withColumn("_ats", boundary.cast("long"))
            .withColumn("_side", F.lit(-1))
        )

        # (c) the same window as the default plan, but per (key, bucket):
        # max task = one key's rows in one bucket
        u2 = u.unionByName(carry, allowMissingColumns=True)
        w2 = W.partitionBy(*on, "_bkt").orderBy(*order).rowsBetween(*_LAST_ROWS)
        out = u2
        for c in carried:
            out = out.withColumn(c, F.last(c, ignorenulls=True).over(w2))
        out = out.filter(F.col("_side") == 1).drop("_ats", "_side", "_rtb", "_bkt")
    if tolerance is not None:
        gap = (
            (F.col(left_ts).cast("long") - F.col(rts_out))
            if direction == "backward"
            else (F.col(rts_out) - F.col(left_ts).cast("long"))
        )
        keep = F.col(rts_out).isNotNull() & (gap <= tolerance)
        for c in carried:
            out = out.withColumn(c, F.when(keep, F.col(c)))
    return out


def _bin_floor(col_name: str, width: int) -> Column:
    """Exact LONG floor-division bin id: ``(x - pmod(x, w)) DIV w``.
    The single home for the idiom in this module — `/`+cast routes
    through double, whose 53-bit mantissa misbins epoch-ns values near
    bin boundaries (the defect fixed once in asof_join's hot-key
    bucketing; range_join and interval_join share this helper so the
    two interval operators can never drift)."""
    w = int(width)
    return F.expr(f"({col_name} - pmod({col_name}, {w})) DIV {w}")


def _bins_covered(start_col: str, end_col: str, width: int) -> Column:
    """Explode to every bin a HALF-OPEN ``[start, end)`` interval
    covers: bin(start) .. bin(end - 1). Callers must pre-filter
    ``end > start`` (an inverted range would make sequence() count
    DOWN into bins the interval does not cover)."""
    w = int(width)
    return F.explode(
        F.sequence(
            _bin_floor(start_col, w),
            F.expr(f"(({end_col} - 1) - pmod(({end_col} - 1), {w})) DIV {w}"),
        )
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str] | None = None,
    bin_width: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to the interval rows containing it
    (``start <= ts < end``, same ``on`` keys). Containment becomes an
    equi-join on (keys, time bin): intervals explode to every bin they
    overlap, points map to exactly one bin — so no pair is produced
    twice and no theta-join/cartesian appears in the plan. Choose
    ``bin_width`` near the typical interval length (explode factor
    ~ interval_len / bin_width + 1).
    """
    on = on or []
    w = int(bin_width)
    # LONG floor division throughout: `/`+cast goes through double, whose
    # 53-bit mantissa misbins epoch-ns values near bin boundaries (the
    # same defect fixed in asof_join's hot-key bucketing)
    p = points.withColumn("_pts", F.col(point_ts).cast("long")).withColumn(
        "_bin", _bin_floor("_pts", w)
    ).drop("_pts")
    # empty/inverted intervals match nothing — and would make sequence()
    # step backwards, exploding bins the interval does not cover
    intervals = intervals.filter(F.col(end_ts).cast("long") > F.col(start_ts).cast("long"))
    iv = (
        intervals.withColumn("_ivs", F.col(start_ts).cast("long"))
        .withColumn("_ive", F.col(end_ts).cast("long"))
        .withColumn("_bin", _bins_covered("_ivs", "_ive", w))
        .drop("_ivs", "_ive")
    )
    cond = [p["_bin"] == iv["_bin"]] + [p[k] == iv[k] for k in on]
    j = p.join(iv, cond, how).filter(
        (p[point_ts].cast("long") >= iv[start_ts].cast("long"))
        & (p[point_ts].cast("long") < iv[end_ts].cast("long"))
    )
    return j.drop(iv["_bin"]).drop(p["_bin"]).drop(*[iv[k] for k in on])


def time_rollup(
    df: DataFrame,
    ts_col: str,
    aggs: dict[str, Column],
    *,
    group_cols: list[str] | None = None,
    unit_divisors: tuple[int, int, int] = (86400, 3600, 60),
) -> DataFrame:
    """Multi-resolution (hypertable-style) rollup in ONE pass: ROLLUP
    grouping sets over derived day/hour/minute buckets (epoch-second
    integers), so minute partials feed hour feed day without rescans.
    Adds ``grain`` ('minute'/'hour'/'day'/'all') from the grouping id.
    ``ts_col`` must be epoch seconds (cast upstream)."""
    day_d, hour_d, minute_d = unit_divisors
    e = F.col(ts_col).cast("long")
    base = df.withColumn("day", (e - (e % day_d)) ) \
             .withColumn("hour", (e - (e % hour_d))) \
             .withColumn("minute", (e - (e % minute_d)))
    extra = group_cols or []
    rolled = (
        base.rollup(*extra, "day", "hour", "minute")
        .agg(*[c.alias(n) for n, c in aggs.items()], F.grouping_id().alias("_gid"))
    )
    n_extra = len(extra)
    # grouping_id bits: 1 = column rolled away; day/hour/minute are the
    # last three grouping columns
    gid = F.col("_gid") % 8
    grain = (
        F.when(gid == 0, F.lit("minute"))
        .when(gid == 1, F.lit("hour"))
        .when(gid == 3, F.lit("day"))
        .otherwise(F.lit("all"))
    )
    # drop partial-extra rollup rows (extras rolled away but time kept)
    if n_extra:
        rolled = rolled.filter((F.col("_gid") < 8) | (F.col("_gid") % 8 == 7))
    return rolled.withColumn("grain", grain).drop("_gid")


def _join_bucket_summary(
    local: DataFrame, summ: DataFrame, keys: list[str], payload: list[str]
) -> DataFrame:
    """NULL-SAFE (key, _bkt) summary join-back shared by the bucketed
    sessionize and rolling_features plans: windows partition NULL
    keys/timestamps into groups like any other value, but a bare
    equi-join would drop rows with a NULL key or NULL ts (NULL _bkt) —
    violating the results-identical contract. eqNullSafe keeps the join
    hash-partitionable (NULLs hash to one bucket). ``payload`` columns
    ride along from the summary onto every joined row."""
    sj = summ.select(
        *[F.col(k).alias(f"_sj_{k}") for k in keys],
        F.col("_bkt").alias("_sj_bkt"), *payload,
    )
    cond = F.col("_bkt").eqNullSafe(F.col("_sj_bkt"))
    for k in keys:
        cond = cond & F.col(k).eqNullSafe(F.col(f"_sj_{k}"))
    return local.join(sj, cond).drop("_sj_bkt", *[f"_sj_{k}" for k in keys])


def sessionize(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    gap: int,
    tiebreak: str | None = None,
    hot_key_bucket: int | None = None,
    out_col: str = "session_id",
) -> DataFrame:
    """Assign gap-based session ids per key: ``out_col`` counts session
    starts (1-based) along each key's timeline; a row starts a new
    session when it is the key's first row or arrives more than ``gap``
    after its predecessor. ``ts_col`` is cast to long; ``gap`` is in the
    same units. ``tiebreak`` orders equal timestamps deterministically.

    Skew posture (reference sessionization is single-node and has no
    equivalent): the default plan puts each key's full timeline in ONE
    task — a key owning 10% of a 100 TB events table is a straggler or
    an OOM. ``hot_key_bucket`` (a bucket width in ts units) opts into a
    bucketed two-pass plan, results-IDENTICAL to the default:

    1. windows partition by (key, ts-bucket): max task = one key's rows
       in one bucket; a provisional session-start flag treats each
       bucket's first row as a start;
    2. a per-(key, bucket) summary (first_ts, last_ts, #starts — one row
       per non-empty bucket, never per event) decides with a per-key
       window whether each bucket's first row actually CONTINUES the
       previous non-empty bucket's last session (first_ts - prev last_ts
       <= gap), and prefix-sums the adjusted start counts into an
       exclusive per-bucket offset;
    3. joining the summary back on (key, bucket) turns the local cumsum
       into the global id: offset + local - continues.

    Sparse buckets need no special case: the summary's lag() skips empty
    buckets, and the continuation test uses real timestamps.
    """
    order = _stream_order("_sts", tiebreak)
    base = df.withColumn("_sts", F.col(ts_col).cast("long"))

    if hot_key_bucket is None:
        w = W.partitionBy(*keys).orderBy(*order)
        prev = F.lag("_sts").over(w)
        new = F.when(prev.isNull() | ((F.col("_sts") - prev) > gap), 1).otherwise(0)
        return (
            base.withColumn("_new", new)
            .withColumn(out_col, F.sum("_new").over(w).cast("long"))
            .drop("_sts", "_new")
        )

    width = int(hot_key_bucket)
    if width <= 0:  # int() FIRST: 0 < hot_key_bucket < 1 truncates to a /0 width
        raise ValueError("hot_key_bucket must be a positive width in ts units")
    # exact LONG floor division (same defect class as asof/range bins:
    # `/`+cast rounds through double and misbuckets near boundaries)
    b = base.withColumn("_bkt", F.expr(f"(_sts - pmod(_sts, {width})) DIV {width}"))

    wb = W.partitionBy(*keys, "_bkt").orderBy(*order)
    prev = F.lag("_sts").over(wb)
    local = (
        b.withColumn(
            "_new", F.when(prev.isNull() | ((F.col("_sts") - prev) > gap), 1).otherwise(0)
        )
        .withColumn("_loc", F.sum("_new").over(wb))
    )

    # bucket summary: one row per NON-EMPTY (key, bucket)
    summ = local.groupBy(*keys, "_bkt").agg(
        F.min("_sts").alias("_first"),
        F.max("_sts").alias("_last"),
        F.sum("_new").alias("_starts"),
    )
    # NULLS LAST on the bucket axis too: a NULL ts row has a NULL
    # bucket, and the cross-bucket chain must place it where the
    # default plan's _stream_order does (after every real bucket)
    wk = W.partitionBy(*keys).orderBy(F.col("_bkt").asc_nulls_last())
    prev_last = F.lag("_last").over(wk)
    # continuation must mirror the default plan's NULL semantics
    # exactly: plain "new" is prev.isNull() OR (diff > gap), so a
    # NULL-ts row after a real row CONTINUES (NULL > gap is not true).
    # The NULL bucket sorts last, its _first is NULL, and a
    # `diff <= gap` test would read NULL as "don't continue" — the
    # negated-coalesce form keeps the two plans identical there.
    summ = summ.withColumn(
        "_cont",
        F.when(
            prev_last.isNotNull()
            & ~F.coalesce((F.col("_first") - prev_last) > gap, F.lit(False)),
            1,
        ).otherwise(0),
    )
    adj = F.col("_starts") - F.col("_cont")
    summ = summ.withColumn(
        "_off",
        F.coalesce(
            F.sum(adj).over(wk.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
        ),
    ).select(*keys, "_bkt", "_cont", "_off")

    out = (
        _join_bucket_summary(local, summ, keys, ["_cont", "_off"])
        .withColumn(out_col, (F.col("_off") + F.col("_loc") - F.col("_cont")).cast("long"))
        .drop("_sts", "_bkt", "_new", "_loc", "_cont", "_off")
    )
    return out


def rolling_features(
    df: DataFrame,
    ts_col: str,
    *,
    keys: list[str],
    value_aggs: dict[str, Column] | None = None,
    lookback_rows: int = 10,
    tiebreak: list[str] | None = None,
    hot_key_bucket: int | None = None,
) -> DataFrame:
    """Per-entity rolling-window feature engineering (the behavioral-ML
    staple the reference has no operator for): for every event, its
    1-based index in the entity's timeline, the gap to the previous
    event, and each ``value_aggs`` aggregate over the trailing
    ``lookback_rows`` events (current row inclusive).

    ``value_aggs`` maps output name -> aggregate Column (e.g.
    ``{"v_sum": F.sum("cents")}``); default adds a rolling count only.
    ``tiebreak`` columns break ts ties deterministically (required for
    reproducible features; defaults to the first key-distinct column
    order Spark picks, so PASS one when ts collides).

    Scale: the default plan is ONE window spec shared by every feature —
    a single shuffle on ``keys``, each frame bounded at
    ``lookback_rows``. A hot entity serializes its whole timeline into
    one sort task (spill-capable; probed 4x wall when one key owns 50%
    of 3M rows). ``hot_key_bucket`` (ts-bucket width, same units as
    ``ts_col``) opts into a results-IDENTICAL two-pass plan in the
    asof/sessionize bucketing family:

    1. global per-key event index via (key, ts-bucket) local row_number
       + a per-key prefix-sum over the one-row-per-bucket summary
       (max task = one key's rows in ONE ts bucket);
    2. rows regroup by (key, index DIV k): every trailing-k frame spans
       at most two adjacent index-buckets, and the previous bucket is
       full (k rows) by construction — so unioning each bucket with a
       carry copy of its predecessor makes every window partition
       self-contained at <= 2k rows, no matter how hot the key.

    Measured economics (local[32]): the bucketed plan pays 3 shuffles
    and a 2x carry fan-out, so a single-task sort still WINS on wall
    below ~10M rows per hot key (6M one-key rows: 4.6 s default vs
    6.6 s bucketed); the crossover is ~20M one-key rows (13.8 s vs
    10.3 s) and widens with size — and at cluster scale the default's
    one-task timeline is an OOM while the bucketed plan's max task is
    one ts-bucket (pass 1) / 2k rows (pass 2). Reach for it when a
    key's timeline no longer fits one executor, not for mild skew.
    """
    if lookback_rows < 1:
        raise ValueError(f"rolling_features: lookback_rows must be >= 1, got {lookback_rows}")
    reserved = {"event_idx", "prev_ts", "rolling_n", *(value_aggs or {})}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"rolling_features: output column(s) {sorted(clash)} already exist on the "
            "input and would be silently overwritten — rename them upstream or pick "
            "different value_aggs names"
        )
    k = int(lookback_rows)

    if hot_key_bucket is None:
        order = _stream_order(ts_col, *(tiebreak or []))
        w = W.partitionBy(*keys).orderBy(*order)
        frame = w.rowsBetween(-(k - 1), 0)
        out = (
            df.withColumn("event_idx", F.row_number().over(w).cast("long"))
            .withColumn("prev_ts", F.lag(ts_col).over(w))
            .withColumn(
                "rolling_n", F.count(F.lit(1)).over(frame).cast("long")
            )
        )
        for name, agg in (value_aggs or {}).items():
            out = out.withColumn(name, agg.over(frame))
        return out

    width = int(hot_key_bucket)
    if width <= 0:
        raise ValueError("hot_key_bucket must be a positive width in ts units")
    internals = {"_rts", "_bkt", "_rn", "_gidx", "_ibkt", "_carry"} | {
        f"_sj_{c}" for c in keys
    }
    internal_clash = internals & set(df.columns)
    if internal_clash:
        raise ValueError(
            f"rolling_features(hot_key_bucket=...): input column(s) "
            f"{sorted(internal_clash)} collide with the bucketed plan's internal "
            "names — rename them upstream"
        )

    # ---- pass 1: global per-key index, bucket-bounded (sessionize form).
    # _rts (long) ONLY assigns buckets; ordering uses the RAW ts column so
    # sub-second timestamp types order identically to the default plan
    # (truncation is monotonic, so bucket assignment stays consistent
    # with the raw order and the global index is exact either way).
    b = df.withColumn("_rts", F.col(ts_col).cast("long")).withColumn(
        "_bkt", F.expr(f"(_rts - pmod(_rts, {width})) DIV {width}")
    )
    order_local = _stream_order(ts_col, *(tiebreak or []))
    wb = W.partitionBy(*keys, "_bkt").orderBy(*order_local)
    local = b.withColumn("_rn", F.row_number().over(wb))
    # NULLS LAST on the bucket axis too: a NULL ts row has a NULL
    # bucket, and the cross-bucket chain must place it where the
    # default plan's _stream_order does (after every real bucket)
    wk = W.partitionBy(*keys).orderBy(F.col("_bkt").asc_nulls_last())
    summ = (
        local.groupBy(*keys, "_bkt")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_roff",
            F.coalesce(
                F.sum("_cnt").over(wk.rowsBetween(W.unboundedPreceding, -1)), F.lit(0)
            ),
        )
    )
    g = (
        _join_bucket_summary(local, summ, keys, ["_roff"])
        .withColumn("_gidx", (F.col("_roff") + F.col("_rn")).cast("long"))
        .drop("_roff", "_rn")
    )

    # ---- pass 2: trailing-k windows inside (key, index-bucket) with a
    # full-previous-bucket carry — every partition <= 2k rows
    base2 = g.withColumn("_ibkt", F.expr(f"(_gidx - 1) DIV {k}")).withColumn(
        "_carry", F.lit(0)
    )
    carry = base2.withColumn("_ibkt", F.col("_ibkt") + 1).withColumn("_carry", F.lit(1))
    u = base2.unionByName(carry)
    w2 = W.partitionBy(*keys, "_ibkt").orderBy(F.col("_gidx").asc())
    frame2 = w2.rowsBetween(-(k - 1), 0)
    out = (
        u.withColumn("event_idx", F.col("_gidx"))
        .withColumn("prev_ts", F.lag(ts_col).over(w2))
        .withColumn("rolling_n", F.count(F.lit(1)).over(frame2).cast("long"))
    )
    for name, agg in (value_aggs or {}).items():
        out = out.withColumn(name, agg.over(frame2))
    return out.filter(F.col("_carry") == 0).drop(
        "_rts", "_bkt", "_gidx", "_ibkt", "_carry"
    )


def funnel(
    df: DataFrame,
    steps: list[str],
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak: str | None = None,
    within_ns: int | None = None,
) -> DataFrame:
    """Ordered-sequence funnel: per entity, the first time each step of
    ``steps`` completed GIVEN every earlier step already had (the
    classic view -> click -> purchase product-analytics question, a
    MATCH_RECOGNIZE-lite Spark SQL lacks natively).

    ``within_ns`` adds the conversion-window constraint: steps 2..k only
    count within ``within_ns`` of the entity's FIRST step-1 event (the
    "convert within 7 days of entry" formulation) — the running min of
    step 1 is already on every row, so the window costs one extra
    predicate, not a join.

    One shuffle total: all k steps chain through running-min window
    columns over a single (user, ts) sort — step i's candidate rows
    qualify when their own row-local step-(i-1) running min is non-null,
    so no self-joins and no per-step passes over the events. ROWS
    frames with a ``tiebreak`` column keep tie handling identical to
    the ANSI oracle (RANGE vs ROWS differ exactly on ts ties).

    Returns one row per entity: ``step{i}_ts`` epoch values (null =
    never reached) and ``reached`` (0..k).
    """
    if not steps:
        raise ValueError("steps must name at least one event type")
    order = _stream_order(ts_col, tiebreak)
    w = (
        W.partitionBy(user_col)
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # dedupe the projection: tiebreak == ts_col (e.g. tiebreak="ts") or
    # == type_col would select the column twice and fail the window
    # resolution with an opaque AMBIGUOUS_REFERENCE instead of working
    cols = list(dict.fromkeys([user_col, ts_col, type_col] + ([tiebreak] if tiebreak else [])))
    cur = df.select(*cols)
    prev = None
    for i, s in enumerate(steps):
        cond = F.col(type_col) == s
        if prev is not None:
            # in ts order, a non-null running min of the previous step
            # means "some step-(i-1) completion at or before this row"
            cond = cond & F.col(prev).isNotNull()
            if within_ns is not None:
                # anchor = the entity's earliest step-1 (the running min
                # _t1 at this row IS the global earliest once non-null)
                cond = cond & (
                    F.col(ts_col).cast("long")
                    <= F.col("_t1") + F.lit(int(within_ns))
                )
        cur = cur.withColumn(
            f"_t{i + 1}", F.min(F.when(cond, F.col(ts_col))).over(w)
        )
        prev = f"_t{i + 1}"
    agg = cur.groupBy(user_col).agg(
        *[F.min(f"_t{i + 1}").alias(f"step{i + 1}_ts") for i in range(len(steps))]
    )
    # step i+1 requires step i, so nullity is monotone down the chain:
    # reached = how many step timestamps are non-null
    reached = sum(
        (F.col(f"step{i + 1}_ts").isNotNull().cast("int") for i in range(len(steps))),
        F.lit(0),
    )
    return agg.withColumn("reached", reached.cast("int"))


def snapshot_latest(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """CDC changelog compaction: the latest row per key by (ts,
    tiebreak) — the point-in-time snapshot a change stream folds into
    (the `is_current` slice of changelog_to_scd2 without building the
    history). One row_number window over one shuffle on the keys; pass
    a ``tiebreak`` for a total order when timestamps can tie."""
    if not keys:
        raise ValueError("snapshot_latest requires at least one key column")
    if "_rn" in df.columns:
        raise ValueError("snapshot_latest reserves the column name '_rn'")
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak).desc()] if tiebreak else []
    )
    w = W.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bin_width: int,
    suffix: str = "_r",
) -> DataFrame:
    """INTERVAL-overlap equi-join: pair every left interval
    [left_start, left_end) with every right interval of the same
    ``on`` keys it overlaps (half-open: ``ls < re AND rs < le``).
    range_join's interval x POINT sibling — Spark's built-ins cover
    neither without a theta join.

    Plan: both sides explode to the ``bin_width`` time bins they cover
    and meet in ONE equi-join on (keys, bin). An overlapping pair
    shares every bin its overlap covers, so pairs are attributed to
    exactly ONE canonical bin — the bin containing the overlap START
    ``greatest(ls, rs)``, which both intervals provably cover — via a
    post-join filter: no dropDuplicates, no pair-identity columns
    needed, each pair emitted exactly once. Explode factor =
    interval span / bin_width (pick the width near the typical span);
    empty/invalid intervals (end <= start) drop.

    Right columns arrive suffixed. Timestamps must be non-negative
    epoch longs (the pmod floor convention)."""
    w = int(bin_width)
    if w <= 0:
        raise ValueError("bin_width must be positive")
    if not on:
        raise ValueError("interval_join requires at least one key column")
    clash = [c for c in ("_bin", "_ls", "_le", "_rs", "_re") if c in left.columns or c in right.columns]
    if clash:
        raise ValueError(f"interval_join reserves column names {clash}")
    # suffixed right columns must not silently shadow left columns —
    # fail HERE with a named error, not downstream with an
    # AMBIGUOUS_REFERENCE far from the join
    collide = sorted(
        f"{c}{suffix}" for c in right.columns
        if c not in on and f"{c}{suffix}" in left.columns
    )
    if collide:
        raise ValueError(
            f"interval_join: suffixed right columns collide with left columns {collide}"
            " — pick another suffix or rename"
        )
    lt = (
        left.withColumn("_ls", F.col(left_start).cast("long"))
        .withColumn("_le", F.col(left_end).cast("long"))
        .filter(F.col("_le") > F.col("_ls"))
        .withColumn("_bin", _bins_covered("_ls", "_le", w))
    )
    rsel = [F.col(k) for k in on] + [
        F.col(c).alias(f"{c}{suffix}") for c in right.columns if c not in on
    ]
    rt = (
        right.select(*rsel,
                     F.col(right_start).cast("long").alias("_rs"),
                     F.col(right_end).cast("long").alias("_re"))
        .filter(F.col("_re") > F.col("_rs"))
        .withColumn("_bin", _bins_covered("_rs", "_re", w))
    )
    canon_bin = _bin_floor("greatest(_ls, _rs)", w)
    joined = lt.join(rt, [*on, "_bin"]).filter(
        (F.col("_ls") < F.col("_re"))
        & (F.col("_rs") < F.col("_le"))
        & (F.col("_bin") == canon_bin)
    )
    return joined.drop("_bin", "_ls", "_le", "_rs", "_re")


def transitions(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """First-order state-transition counts (the Markov matrix of a
    product-analytics event stream): per key ordered by (ts, tiebreak),
    every consecutive (state_{i-1} -> state_i) pair, counted.

    Output: ``by`` (optional extra grouping, e.g. a cohort column) +
    ``from_state`` / ``to_state`` + ``n`` — each key's first event has
    no predecessor and contributes nothing.

    Plan: one lag() window over the (keys, ts) sort, one map-side-
    combinable count on state-pair cardinality — the raw stream is
    touched once. Same per-key sort bound as sessionize."""
    if not keys:
        raise ValueError("transitions requires at least one key column")
    clash = sorted({"from_state", "to_state", "n"} & set(by or []))
    if clash:
        raise ValueError(f"transitions reserves column names {clash} — rename the `by` columns")
    # NULLS LAST: Spark's bare .asc() is NULLS FIRST, ANSI/DuckDB
    # default NULLS LAST — a NULL ts row would transition in a
    # different stream position per engine (latent until NULL ts data)
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    pairs = df.select(
        *(by or []),
        F.lag(F.col(state_col)).over(w).alias("from_state"),
        F.col(state_col).alias("to_state"),
    ).filter(F.col("from_state").isNotNull())
    return pairs.groupBy(*(by or []), "from_state", "to_state").agg(
        F.count(F.lit(1)).alias("n")
    )


def changelog_to_scd2(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    attrs: list[str],
    tiebreak: str | None = None,
    compress: bool = True,
) -> DataFrame:
    """Build slowly-changing-dimension type-2 validity intervals from a
    change log: per key ordered by (ts, tiebreak), each (surviving) row
    becomes a version with ``valid_from`` = its ts and ``valid_to`` =
    the next version's ts (NULL on the current version, flagged
    ``is_current``). The standard warehouse changelog→dimension fold,
    which Spark has no built-in for.

    ``compress=True`` (default) first drops rows whose ``attrs`` all
    equal the previous row's — consecutive no-op updates collapse into
    one version, so interval boundaries are true CHANGE points.
    Equality is null-safe (NULL -> NULL is not a change). A NULL
    ``ts_col`` RAISES loudly (the apply_cdc posture): a changelog row
    without a timestamp has no place on the validity axis, and under
    NULLS LAST ordering it would otherwise silently produce TWO
    is_current=true rows per key (itself and the true latest version,
    whose lead(valid_from) becomes the NULL row's NULL).

    Plan: one shuffle on the keys; compression is a lag() comparison
    and the interval close is a lead() over the survivors — two window
    passes over the same (keys, ts) sort, no self-join. Per-key history
    sorts in one task (the usual exact-order bound; parallelism across
    keys)."""
    if not keys or not attrs:
        raise ValueError("changelog_to_scd2 requires keys and attrs")
    overlap = set(keys) & set(attrs)
    if overlap:
        raise ValueError(f"attrs overlap keys: {sorted(overlap)}")
    reserved = {"valid_from", "valid_to", "is_current", "_chg"}
    clash = sorted(reserved & (set(df.columns)))
    if clash:
        raise ValueError(f"changelog_to_scd2 reserves {clash} — rename the inputs")
    tb = [tiebreak] if tiebreak and tiebreak not in keys and tiebreak not in attrs else []
    vfrom = F.when(
        F.col(ts_col).isNull(),
        F.raise_error(F.lit(
            "changelog_to_scd2: NULL ts_col — a changelog row without a"
            " timestamp has no validity interval; fix or filter the data")),
    ).otherwise(F.col(ts_col).cast("long"))
    base = df.select(*keys, vfrom.alias("valid_from"), *attrs, *tb)
    order = _stream_order("valid_from", tiebreak)
    wv = W.partitionBy(*keys).orderBy(*order)
    if compress:
        changed = F.lit(False)
        for a in attrs:
            # null-safe change test: NOT (prev <=> cur)
            changed = changed | ~F.col(a).eqNullSafe(F.lag(a).over(wv))
        first = F.row_number().over(wv) == 1
        base = base.withColumn("_chg", first | changed).filter(F.col("_chg")).drop("_chg")
    out = base.withColumn("valid_to", F.lead("valid_from").over(wv))
    return out.withColumn("is_current", F.col("valid_to").isNull()).drop(*tb)


def ewma(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: list[str],
    alpha: float,
    tiebreak: str | None = None,
) -> DataFrame:
    """Final exponentially-weighted moving average per key:
    y_0 = x_0, y_i = (1-alpha)*y_{i-1} + alpha*x_i over the key's
    events in (ts, tiebreak) order — the smoothed-latest-value report
    (pandas ``ewm(alpha=..., adjust=False)``'s last row per group).

    The recurrence is inherently sequential, so it runs as ONE
    ``aggregate()`` fold over the key's time-ordered value array
    (collect_list + array_sort, pure JVM) — a deliberate, documented
    state bound: one key's full history must fit one aggregation
    buffer. That is the honest cost of an exact sequential recurrence;
    at 100 TB, either the per-key history is naturally bounded
    (devices, users) or the caller pre-buckets time and chains bucket
    EWMAs. No Python, no driver state; one shuffle on the keys.

    Determinism: both engines fold identical IEEE doubles in an
    identical order, so the result is bit-exact across Spark and a SQL
    ``list_reduce`` oracle — PROVIDED the (1-alpha) literal is the same
    double on both sides (embed ``repr(1 - alpha)`` in the SQL).

    Output: keys + ``n`` + ``ewma`` (double; NULL inputs are dropped
    from the fold like pandas ewm ignore_na)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not keys:
        raise ValueError("ewma requires at least one key column")
    one_minus = 1.0 - float(alpha)
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    arr = F.array_sort(
        F.collect_list(
            F.when(
                F.col(value_col).isNotNull(),
                F.struct(
                    F.col(ts_col).cast("long").alias("t"),
                    tb.alias("tb"),
                    F.col(value_col).cast("double").alias("v"),
                ),
            )
        )
    )
    out = (
        df.groupBy(*keys)
        .agg(F.count(F.col(value_col)).alias("n"), arr.alias("_arr"))
        .withColumn("_vals", F.transform(F.col("_arr"), lambda s: s["v"]))
        .withColumn(
            "ewma",
            # F.get (0-based) is NULL-safe on the all-NULL-values empty
            # array, where element_at would throw under ANSI mode
            F.when(
                F.size("_vals") > 1,
                F.aggregate(
                    F.expr("slice(_vals, 2, size(_vals) - 1)"),
                    F.get(F.col("_vals"), 0),
                    lambda acc, x: acc * F.lit(one_minus) + x * F.lit(float(alpha)),
                ),
            ).otherwise(F.get(F.col("_vals"), 0)),
        )
    )
    return out.select(*keys, "n", "ewma")


def ewma_bucketed(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: list[str],
    alpha: float,
    bucket_width: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """:func:`ewma` with the per-key history bound broken in two — the
    escape hatch the ewma docstring names for keys whose full history
    cannot fit one aggregation buffer.

    The recurrence y_i = (1-a)*y_{i-1} + a*x_i is affine in the running
    state, so a whole time bucket composes to ONE affine map
    y_out = A*y_in + B with A = (1-a)^m (computed by the same repeated
    multiply, not pow()) and B the bucket's zero-seeded fold. Stage 1
    folds each (key, bucket) independently — buffer bound: one BUCKET's
    rows, caller-chosen via ``bucket_width``; stage 2 chains the bucket
    maps per key in bucket order — buffer bound: the key's BUCKET
    COUNT (time span / width), independent of row volume. Both stages
    are pure JVM array folds; two shuffles total ((keys, bucket), then
    keys).

    Exactness: algebraically identical to :func:`ewma`, but the
    floating-point regrouping (A*y + B versus the interleaved fold)
    differs from the sequential result in the last few ulps — this is a
    SCALE escape hatch, not a bit-exact twin; tests pin agreement to
    1e-9 relative. Same output shape: keys + ``n`` + ``ewma``; NULL
    values are dropped from the fold; an all-NULL key surfaces with
    n = 0 and NULL ewma, exactly like ewma()."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if not keys:
        raise ValueError("ewma_bucketed requires at least one key column")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    c = F.lit(1.0 - float(alpha))
    a = F.lit(float(alpha))
    tb = F.col(tiebreak) if tiebreak else F.lit(0)
    t = F.col(ts_col).cast("long")
    arr = F.array_sort(
        F.collect_list(
            F.when(
                F.col(value_col).isNotNull(),
                F.struct(t.alias("t"), tb.alias("tb"),
                         F.col(value_col).cast("double").alias("v")),
            )
        )
    )
    per_bucket = (
        df.groupBy(*keys, F.expr(
            f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), {w})) DIV {w}"
        ).alias("_bkt"))
        .agg(F.count(F.col(value_col)).alias("_m"), arr.alias("_arr"))
        .withColumn("_vals", F.transform(F.col("_arr"), lambda s: s["v"]))
        .withColumn("_A", F.aggregate("_vals", F.lit(1.0), lambda acc, x: acc * c))
        .withColumn("_B", F.aggregate("_vals", F.lit(0.0), lambda acc, x: acc * c + x * a))
        # seed fold for whichever bucket turns out to be the key's first:
        # y = fold(tail, init = first value) — the ewma() base case
        .withColumn(
            "_S",
            F.when(
                F.size("_vals") > 0,
                F.aggregate(
                    F.expr("slice(_vals, 2, size(_vals) - 1)"),
                    F.get(F.col("_vals"), 0),
                    lambda acc, x: acc * c + x * a,
                ),
            ),
        )
    )
    maps = F.array_sort(
        F.collect_list(F.struct(
            F.col("_bkt").alias("bk"), F.col("_m").alias("m"),
            F.col("_A").alias("am"), F.col("_B").alias("bm"), F.col("_S").alias("sm"),
        ))
    )
    chained = (
        per_bucket.groupBy(*keys)
        .agg(F.sum("_m").alias("n"), maps.alias("_maps"))
        # empty buckets (all-NULL values) are affine identities but would
        # poison the seed — chain only the non-empty ones, keep the key
        .withColumn("_live", F.filter(F.col("_maps"), lambda b: b["m"] > 0))
        .withColumn(
            "ewma",
            F.when(
                F.size("_live") > 0,
                F.aggregate(
                    F.expr("slice(_live, 2, size(_live) - 1)"),
                    F.get(F.col("_live"), 0)["sm"],
                    lambda acc, b: b["am"] * acc + b["bm"],
                ),
            ),
        )
    )
    return chained.select(*keys, F.coalesce(F.col("n"), F.lit(0)).alias("n"), "ewma")


def streaks(
    df: DataFrame,
    ts_col: str,
    *,
    keys: list[str],
    bucket_width: int,
    min_buckets: int = 1,
) -> DataFrame:
    """Gaps-and-islands: runs of CONSECUTIVE active buckets per key
    (the SQL classic; product-analytics "activity streaks", sensor
    uptime segments). A bucket is active when the key has >= 1 row in
    it; an island is a maximal run of consecutive active buckets.

    Returns one row per island: keys + ``streak_start``/``streak_end``
    (bucket lower edges, epoch long) + ``n_buckets`` + ``n_events``
    (rows inside the island), islands shorter than ``min_buckets``
    dropped.

    Plan: raw rows are touched ONCE (the (keys, bucket) partial-agg
    shuffle); the island trick (bucket_idx - row_number is constant
    within a run) and the island agg both run on bucket-count-sized
    data. The per-key window sees #active-buckets rows — span/width
    bounded, never data-volume bound. Exact-floor bucketing via the
    repo-wide ``(ts - pmod(ts, w)) DIV w``.
    """
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    if not keys:
        raise ValueError("streaks requires at least one key column")
    reserved = {"_st_ts", "_bkt", "streak_start", "streak_end", "n_buckets", "n_events"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"streaks reserves column names {clash} — rename the inputs")
    bkt = F.expr(f"(_st_ts - pmod(_st_ts, {w})) DIV {w}")
    per_bucket = (
        df.withColumn("_st_ts", F.col(ts_col).cast("long"))
        .withColumn("_bkt", bkt)
        .groupBy(*keys, "_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    # NULLS LAST on the bucket axis too: a NULL ts row has a NULL
    # bucket, and the cross-bucket chain must place it where the
    # default plan's _stream_order does (after every real bucket)
    wk = W.partitionBy(*keys).orderBy(F.col("_bkt").asc_nulls_last())
    islands = per_bucket.withColumn(
        "_isl", F.col("_bkt") - F.row_number().over(wk)
    )
    out = (
        islands.groupBy(*keys, "_isl")
        .agg(
            (F.min("_bkt") * w).alias("streak_start"),
            (F.max("_bkt") * w).alias("streak_end"),
            F.count(F.lit(1)).alias("n_buckets"),
            F.sum("_n").alias("n_events"),
        )
        .drop("_isl")
    )
    if int(min_buckets) > 1:
        out = out.filter(F.col("n_buckets") >= int(min_buckets))
    return out


def attribute_conversions(
    df: DataFrame,
    *,
    conversion_type: str,
    touch_types: list[str],
    horizon: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    model: str = "last_touch",
    tiebreak: str | None = None,
    carry_cols: list[str] | None = None,
) -> DataFrame:
    """Marketing attribution: credit each ``conversion_type`` event to
    one preceding ``touch_types`` event within ``horizon`` (same units
    as ``ts_col``'s long cast — ns for epoch-nanos).

    ``model='last_touch'`` credits the latest touch at-or-before the
    conversion; ``'first_touch'`` the earliest touch inside the
    lookback window ``[conv_ts - horizon, conv_ts]``.

    Pure composition over :func:`asof_join` (the union+window as-of —
    ONE shuffle, no join operator): last-touch is a backward as-of with
    ``tolerance=horizon``; first-touch is a FORWARD as-of launched from
    the shifted timestamp ``conv_ts - horizon`` with the same
    tolerance — the nearest touch at-or-after the window's left edge IS
    the first touch inside it. Same skew posture as asof_join.

    Output: every conversion row's ``user/ts`` plus ``carry_cols``,
    with ``touch_ts`` / ``touch_type`` (NULL = unattributed) and
    ``lag_ns`` (conversion minus touch, NULL when unattributed).
    """
    if model not in ("last_touch", "first_touch"):
        raise ValueError("model must be 'last_touch' or 'first_touch'")
    h = int(horizon)
    if h < 0:
        raise ValueError("horizon must be >= 0")
    carry = list(carry_cols or [])
    conv = df.filter(F.col(type_col) == conversion_type).select(
        user_col, F.col(ts_col).cast("long").alias("_cts"), *carry
    )
    touches = df.filter(F.col(type_col).isin(list(touch_types))).select(
        user_col,
        F.col(ts_col).cast("long").alias("_tts"),
        F.col(type_col).alias("_tty"),
        *( [tiebreak] if tiebreak and tiebreak not in (user_col,) else [] ),
    )
    if model == "last_touch":
        left = conv.withColumn("_asof_ts", F.col("_cts"))
        direction = "backward"
    else:
        left = conv.withColumn("_asof_ts", F.col("_cts") - F.lit(h))
        direction = "forward"
    joined = asof_join(
        left,
        touches,
        on=[user_col],
        left_ts="_asof_ts",
        right_ts="_tts",
        right_cols=["_tty"],
        direction=direction,
        tolerance=h,
        right_tiebreak=tiebreak,
    )
    return joined.select(
        F.col(user_col),
        F.col("_cts").alias("conversion_ts"),
        *carry,
        F.col("_tts_r").alias("touch_ts"),
        F.col("_tty_r").alias("touch_type"),
        (F.col("_cts") - F.col("_tts_r")).alias("lag_ns"),
    )


def hopping_rollup(
    df: DataFrame,
    aggs: dict[str, Column],
    *,
    ts_col: str = "ts",
    every_ns: int,
    size_ns: int,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Hopping (sliding) window aggregation in batch: windows of
    ``size_ns`` starting every ``every_ns`` (size must be a multiple of
    every), so each row lands in exactly size/every overlapping windows
    — the batch analogue of Structured Streaming's
    ``window(ts, size, slide)``, kept in exact integer nanosecond math
    (the timestamp variant rounds through microseconds; epoch-ns longs
    DIV/pmod exactly, the repo-wide bucketing convention).

    Plan: each row explodes into its size/every window starts (pure JVM
    ``explode(sequence(...))`` — every generated start is valid by
    construction, no post-filter), then ONE groupBy on
    (window_start, *group_cols). Shuffle volume = rows x (size/every):
    bounded and known up front; at 100 TB pick the overlap factor
    consciously (4 for 1h/15m).

    Requires non-negative epoch timestamps (pmod vs % diverge below
    zero — same contract as the other ns bucketing here).
    Output: ``window_start`` (epoch-ns long) + group cols + aggs.
    """
    every, size = int(every_ns), int(size_ns)
    if every <= 0 or size <= 0 or size % every != 0:
        raise ValueError("size_ns must be a positive multiple of every_ns")
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    if "window_start" in df.columns:
        raise ValueError(
            "input already has a window_start column — rename it before "
            "hopping_rollup (a silent replace would group on the wrong data)"
        )
    n = size // every
    # F.col, not an f-string into F.expr: interpolated names break on
    # columns needing backticks and mis-resolve dotted names
    ts = F.col(ts_col).cast("long")
    floor0 = ts - F.pmod(ts, F.lit(every).cast("long"))
    starts = F.sequence(
        floor0 - F.lit((n - 1) * every), floor0, F.lit(every).cast("long")
    )
    g = [F.col(c) for c in (group_cols or [])]
    return (
        df.withColumn("window_start", F.explode(starts))
        .groupBy(F.col("window_start"), *g)
        .agg(*[a.alias(name) for name, a in aggs.items()])
    )


def gap_fill(
    df: DataFrame,
    ts_col: str,
    *,
    keys: list[str],
    bucket_width: int,
    aggs: dict[str, Column],
    locf_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
    max_buckets_per_key: int = 2_000_000,
) -> DataFrame:
    """Dense per-key time grid with LOCF interpolation (TimescaleDB
    ``time_bucket_gapfill`` + ``locf``; the reference is batch-only with
    no time-series surface at all — SURVEY.md §1.4).

    Buckets ``ts_col`` (epoch long, any unit) into ``bucket_width``-wide
    bins, aggregates per (keys, bucket), then EXPANDS each key's bucket
    range to a gapless grid and carries the last observed value forward
    into the gap rows for every column in ``locf_cols`` (names must be
    keys of ``aggs``).

    ``interp_cols`` (TimescaleDB ``interpolate``) instead draws the
    straight line between the surrounding observed buckets; one-sided
    edges (no observation before/after) fall back to the side that
    exists. LOCF and interpolation can be requested for the same column.

    ``max_buckets_per_key`` guards the grid explode: ONE corrupt
    timestamp outlier (an epoch-0 row from a parse bug, a year-9999
    sentinel) makes that key's span/width blow past Spark's max array
    length and fail deep inside ``sequence()`` with an opaque internal
    error. The per-key span is asserted BEFORE the explode, so the
    failure is a named gap_fill error carrying the span — raise the cap
    explicitly if a multi-million-bucket grid is really intended.

    Output: keys + ``bucket_start`` (epoch long, bucket lower edge) +
    one column per agg (NULL on gap rows) + ``<c>_filled`` per locf col
    + ``<c>_interp`` (double) per interp col.

    Scale posture: the raw table is touched ONCE (the partial-agg
    shuffle); everything after runs on the rolled-up grid, whose size is
    sum over keys of (key time-span / bucket_width) — caller-controlled
    via ``bucket_width``, never data-volume-bound. Three narrow shuffles
    total on grid-sized data: the rollup agg, the grid left join on
    (keys, bucket), and the per-key LOCF window. Exact-floor bucketing
    ``(ts - pmod(ts, w)) DIV w`` keeps pre-epoch timestamps on the
    correct side of bucket edges (the repo-wide ns-bucketing pattern).
    """
    if not aggs:
        raise ValueError("aggs must name at least one aggregate")
    bad = [c for c in (locf_cols or []) if c not in aggs]
    if bad:
        raise ValueError(f"locf_cols not in aggs: {bad}")
    bad = [c for c in (interp_cols or []) if c not in aggs]
    if bad:
        raise ValueError(f"interp_cols not in aggs: {bad}")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be positive")
    reserved = (
        {"_gf_ts", "_bkt", "bucket_start"}
        | {f"{c}_filled" for c in (locf_cols or [])}
        | {f"{c}_interp" for c in (interp_cols or [])}
    )
    clash = sorted(reserved & (set(df.columns) | set(aggs)))
    if clash:
        raise ValueError(
            f"gap_fill reserves column names {clash} — rename the input/"
            "agg columns (a silent replace would fill the wrong data)"
        )
    # fixed temp name, then expr: interpolating ts_col into SQL breaks on
    # names needing backticks, and Column-API `/` routes longs through
    # double (loses ns precision past 2^53) — DIV needs expr
    bkt = F.expr(f"(_gf_ts - pmod(_gf_ts, {w})) DIV {w}")
    rolled = (
        df.withColumn("_gf_ts", F.col(ts_col).cast("long"))
        .withColumn("_bkt", bkt)
        .groupBy(*keys, "_bkt")
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    span = rolled.groupBy(*keys).agg(
        F.min("_bkt").alias("_lo"), F.max("_bkt").alias("_hi")
    )
    # assert_true rides inside the sequence's lower bound so Catalyst
    # cannot prune it: span checks run exactly once per key, before any
    # explode work. A NULL span (all-NULL ts for a key) must PASS the
    # assert — sequence(NULL, ...) skips that key, the pre-guard
    # behavior — and the message operands coalesce so a violation never
    # raises with a NULL message.
    n_buckets = F.col("_hi") - F.col("_lo") + 1
    span_ok = F.assert_true(
        n_buckets.isNull() | (n_buckets <= F.lit(int(max_buckets_per_key))),
        F.concat(
            F.lit("gap_fill: key bucket span "),
            F.coalesce(n_buckets.cast("string"), F.lit("?")),
            F.lit(f" exceeds max_buckets_per_key={int(max_buckets_per_key)}"
                  " — likely a corrupt timestamp outlier (epoch-0 / "
                  "far-future row); fix the data or raise the cap"),
        ),
    )
    grid = span.select(
        *keys,
        F.explode(
            F.sequence(F.when(span_ok.isNull(), F.col("_lo")), F.col("_hi"))
        ).alias("_bkt"),
    )
    filled = grid.join(rolled, [*keys, "_bkt"], "left")
    if locf_cols:
        lw = (
            W.partitionBy(*keys)
            .orderBy("_bkt")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        for c in locf_cols:
            filled = filled.withColumn(
                f"{c}_filled", F.last(F.col(c), ignorenulls=True).over(lw)
            )
    if interp_cols:
        lw = (
            W.partitionBy(*keys)
            .orderBy("_bkt")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        fw = (
            W.partitionBy(*keys)
            .orderBy("_bkt")
            .rowsBetween(W.currentRow, W.unboundedFollowing)
        )
        for c in interp_cols:
            v = F.col(c).cast("double")
            prev_v = F.last(v, ignorenulls=True).over(lw)
            prev_b = F.last(
                F.when(F.col(c).isNotNull(), F.col("_bkt")), ignorenulls=True
            ).over(lw)
            nxt_v = F.first(v, ignorenulls=True).over(fw)
            nxt_b = F.first(
                F.when(F.col(c).isNotNull(), F.col("_bkt")), ignorenulls=True
            ).over(fw)
            frac = (F.col("_bkt") - prev_b).cast("double") / (
                (nxt_b - prev_b).cast("double")
            )
            filled = filled.withColumn(
                f"{c}_interp",
                F.when(F.col(c).isNotNull(), v)
                .when(
                    prev_v.isNotNull() & nxt_v.isNotNull(),
                    prev_v + (nxt_v - prev_v) * frac,
                )
                .otherwise(F.coalesce(prev_v, nxt_v)),
            )
    return filled.withColumn(
        "bucket_start", F.col("_bkt") * F.lit(w).cast("long")
    ).drop("_bkt")


def time_weighted_avg(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    keys: list[str],
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Trapezoidal time-weighted average per key (TimescaleDB
    ``time_weight('Linear')`` hyperfunction; no reference or Spark
    built-in equivalent): consecutive samples contribute
    ``(v_i + v_{i+1})/2 * (t_{i+1} - t_i)``, normalised by the key's
    observed duration. A key with a single sample (or zero duration)
    falls back to the plain mean.

    ``value_col`` must be an INTEGRAL column (scale floats to
    cents/micros upstream): segment terms accumulate in decimal(38,0),
    so the sum is exact and engine-order-independent — a double sum
    here would make results depend on partitioning. ``order_cols``
    breaks timestamp ties deterministically; tied samples contribute a
    zero-width segment either way, so ties never change the value.

    Output: keys + ``twa`` (double, value units) + ``n_samples`` +
    ``duration`` (ts units). ONE shuffle on keys: the lead window and
    the final agg share the same partitioning.
    """
    from pyspark.sql import types as T

    vtype = df.schema[value_col].dataType
    if not isinstance(vtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        raise TypeError(
            f"time_weighted_avg: value_col {value_col!r} is {vtype.simpleString()}; "
            "an integral column is required for exact segment sums — scale "
            "floats upstream (e.g. F.floor(value * 100 + 0.5).cast('long'))"
        )
    reserved = {"_seg", "twa", "n_samples", "duration"}
    clash = sorted(reserved & (set(keys) | ({"_seg"} & set(df.columns))))
    if clash:
        raise ValueError(
            f"time_weighted_avg reserves column names {clash} — rename "
            "the key/input columns (the output carries twa/n_samples/"
            "duration next to the keys)"
        )
    ow = W.partitionBy(*keys).orderBy(*_stream_order(ts_col, *(order_cols or [])))
    ts = F.col(ts_col).cast("long")
    v = F.col(value_col).cast("long")
    nxt_ts = F.lead(ts).over(ow)
    nxt_v = F.lead(v).over(ow)
    # cast each operand BEFORE adding: a long + long of two near-2^63
    # samples would overflow (ANSI error at best) before the decimal
    # cast could make the promised exact sum
    seg = (v.cast("decimal(38,0)") + nxt_v.cast("decimal(38,0)")) * (nxt_ts - ts)
    agg = (
        df.withColumn("_seg", seg)
        .groupBy(*keys)
        .agg(
            F.sum("_seg").alias("_num"),
            F.min(ts).alias("_lo"),
            F.max(ts).alias("_hi"),
            F.avg(v).alias("_mean"),
            F.count(F.lit(1)).alias("n_samples"),
        )
    )
    dur = F.col("_hi") - F.col("_lo")
    twa = F.when(
        dur > 0, F.col("_num").cast("double") / (dur.cast("double") * 2.0)
    ).otherwise(F.col("_mean"))
    return agg.select(
        *keys,
        twa.alias("twa"),
        F.col("n_samples"),
        dur.alias("duration"),
    )


def cohort_retention(
    df: DataFrame,
    ts_col: str,
    user_col: str,
    *,
    period: int,
) -> DataFrame:
    """Cohort retention matrix: users are cohorted by the period of
    their FIRST event; each cell counts how many of a cohort's users
    were active ``offset`` periods later, with the retention percentage
    against the cohort size. The product-analytics staple (Amplitude/
    Mixpanel retention) the reference has no surface for.

    ``ts_col``: epoch long (any unit); ``period``: cohort width in the
    same unit. Exact-floor period indexing (pre-epoch-safe, as
    everywhere in this module).

    Scale posture: the raw table collapses FIRST — one partial-agg
    shuffle to per-user first-ts and one distinct to per-(user, period)
    activity rows (both map-side combinable); the cohort join and the
    cell aggregation then run on user-count-sized data. Cohort sizes
    broadcast back onto the (tiny) matrix. Count is ``count(*)``, not
    countDistinct: activity rows are already distinct per (user,
    period), so each user hits a cell at most once.

    Output: ``cohort_period`` (epoch long, period start),
    ``period_offset``, ``n_active``, ``cohort_size``, ``retention_pct``
    (double, rounded 4dp).
    """
    p = int(period)
    if p <= 0:
        raise ValueError("period must be positive")
    # exact integer period index: Column-API `/` would go through double
    # and misindex ns-scale epochs near period edges (the repo-wide
    # bucketing class bug) — fixed temp name + DIV, as in gap_fill
    pidx = F.expr(f"(_cr_ts - pmod(_cr_ts, {p})) DIV {p}")
    base = df.select(
        F.col(user_col).alias("_u"), F.col(ts_col).cast("long").alias("_cr_ts")
    ).withColumn("_p", pidx)
    first = base.groupBy("_u").agg(F.min("_p").alias("_cohort"))
    activity = base.select("_u", "_p").distinct()
    cells = (
        activity.join(first, "_u")
        .groupBy("_cohort", (F.col("_p") - F.col("_cohort")).alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("_cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "_cohort")
        .select(
            (F.col("_cohort") * p).alias("cohort_period"),
            "period_offset",
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active").cast("double")
                / F.col("cohort_size").cast("double")
                * 100.0,
                4,
            ).alias("retention_pct"),
        )
    )


def time_profile(
    df: DataFrame,
    ts_col: str,
    *,
    by: list[str] | None = None,
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Day-of-week × hour-of-day activity profile from epoch-nanos —
    the seasonality heat-grid behind capacity planning and anomaly
    baselines ("Tuesdays 14:00 UTC run 3× the weekend floor").

    ``dow`` is 0=Monday..6=Sunday, ``hod`` 0..23, both derived with the
    repo's exact floor-division idiom on the epoch-nanos long
    (1970-01-01 was a Thursday, so dow = pmod(days + 3, 7)) — pure
    integer math, correct for pre-epoch timestamps too, identical in
    any engine; no session-timezone dependence because epoch math IS
    UTC. ``aggs`` adds measures beside the default ``n_rows`` count.

    Plan: ONE map-side-combinable groupBy on (by, dow, hod) — at most
    168 cells per group leave each partition.
    """
    day = 86_400 * 10**9
    hour = 3_600 * 10**9
    reserved = {"dow", "hod", "n_rows", "_tp_t"}
    # check the whole input schema, not just `by` — an existing _tp_t/
    # dow/hod column would be silently overwritten or shadowed, which
    # can corrupt caller-supplied aggs that reference those columns
    # (the same rule state_durations/throttle/running_totals apply)
    clash = sorted(reserved & (set(by or []) | set(df.columns)))
    if clash:
        raise ValueError(f"time_profile reserves column names {clash} — rename the inputs")
    # integer DIV throughout — long/long `/` routes through double and
    # misbuckets epoch-nanos near boundaries (the repo's proven ns-
    # precision hazard class)
    days = F.expr(f"(_tp_t - pmod(_tp_t, {day})) DIV {day}")
    dow = F.pmod(days + F.lit(3), F.lit(7)).alias("dow")
    hod = F.expr(f"pmod(_tp_t, {day}) DIV {hour}").alias("hod")
    df = df.withColumn("_tp_t", F.col(ts_col).cast("long"))
    measures = [F.count(F.lit(1)).alias("n_rows")]
    for name, col in (aggs or {}).items():
        measures.append(col.alias(name))
    return df.groupBy(*(by or []), dow, hod).agg(*measures)


def active_users(
    df: DataFrame,
    ts_col: str,
    *,
    user_col: str,
    day_ns: int = 86_400 * 10**9,
    windows: tuple[int, ...] = (1, 7, 30),
) -> DataFrame:
    """Exact rolling active-user counts (the DAU/WAU/MAU product
    staple): for every OBSERVED activity day, the distinct users seen
    in the trailing 1/7/30-day windows ending that day.

    Exact sliding-window distinct counts are the textbook hard case —
    a naive per-day window over raw events re-scans 30 days of data
    per day. The scalable exact plan used here:

    1. collapse raw events to DISTINCT (user, day) — one combinable
       shuffle; everything after runs on user-days, which is bounded by
       users × days regardless of event volume;
    2. explode each user-day to the max(windows) report days it can
       contribute to (a ×max(window) fan-out of the already-collapsed
       table — the explicit, bounded cost of exactness);
    3. ONE groupBy(report_day) with a conditional count-distinct per
       window (offset < w) — Spark's Expand strategy handles the
       multi-distinct in a single aggregation;
    4. semi-join back to observed days so quiet trailing days (which
       step 2 manufactures) don't appear.

    Beyond ~90-day windows the fan-out dominates and the sketch path
    (per-day HLL sketches merged over the window) is the escape hatch;
    at the standard 1/7/30 this exact plan is the right trade.

    Output: ``day`` (epoch-day long) + one ``au_{w}d`` long per window.
    """
    ws = sorted(set(int(w) for w in windows))
    if not ws or ws[0] < 1:
        raise ValueError("windows must be positive day counts")
    wmax = ws[-1]
    d = int(day_ns)
    t = F.col(ts_col).cast("long")
    day = F.expr(f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), {d})) DIV {d}")
    user_days = (
        df.filter(t.isNotNull())
        .select(F.col(user_col).alias("_au_u"), day.alias("_au_d"))
        .distinct()
    )
    exploded = user_days.select(
        "_au_u", "_au_d",
        F.explode(F.sequence(F.lit(0), F.lit(wmax - 1)).cast("array<long>")).alias("_au_off"),
    ).select(
        "_au_u", "_au_off", (F.col("_au_d") + F.col("_au_off")).alias("day")
    )
    aggs = [
        F.countDistinct(
            F.when(F.col("_au_off") < F.lit(w), F.col("_au_u"))
        ).alias(f"au_{w}d")
        for w in ws
    ]
    counts = exploded.groupBy("day").agg(*aggs)
    observed = user_days.select(F.col("_au_d").alias("day")).distinct()
    return counts.join(observed, "day", "left_semi")


_MERGEABLE = ("sum", "count", "min", "max")


def rollup_state(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    scale: int = 100,
) -> DataFrame:
    """Build the mergeable per-key aggregate state ``merge_rollup``
    consumes: ``aggs`` maps output column -> (kind, value_col) with
    kind in {sum, count, min, max} — exactly the commutative/
    associative kinds whose states merge losslessly, so incremental
    maintenance is EXACT, not approximate. sum runs on fixed-point
    longs (``scale``, cents by default — the shared stats.to_cents
    idiom) to stay accumulation-order-exact. One combinable groupBy."""
    if not keys:
        raise ValueError("rollup_state requires at least one key column")
    cols = []
    for out, (kind, vc) in aggs.items():
        if kind not in _MERGEABLE:
            raise ValueError(
                f"agg kind {kind!r} for {out!r} is not mergeable; supported: {_MERGEABLE}"
            )
        if kind == "count":
            cols.append(F.count(F.col(vc)).alias(out))
        elif kind == "sum":
            from .stats import to_cents

            cols.append(F.sum(to_cents(vc, scale)).alias(out))
        elif kind == "min":
            cols.append(F.min(F.col(vc)).alias(out))
        else:
            cols.append(F.max(F.col(vc)).alias(out))
    return df.groupBy(*keys).agg(*cols)


def merge_rollup(
    base: DataFrame,
    delta: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    *,
    scale: int = 100,
) -> DataFrame:
    """Incremental aggregate maintenance: fold a DELTA of raw rows into
    an existing per-key aggregate table WITHOUT rescanning the base
    data — at 100 TB, the difference between a nightly full recompute
    and a minutes-long refresh. ``base`` is a prior
    :func:`rollup_state` output; ``delta`` is raw rows; the result is
    EXACTLY ``rollup_state(base_rows UNION delta)`` because every
    supported kind is commutative/associative (the oracle-checked
    contract).

    Merge rules per kind: sum/count add with absent-side-as-identity
    (but NULL + NULL stays NULL — an all-NULL-values key keeps its
    NULL sum); min/max take the non-NULL side or the pairwise
    least/greatest.

    Plan: one combinable groupBy over the DELTA only + one full-outer
    equi-join against the base on the keys. Co-partition/bucket the
    base table on ``keys`` at write time and the join shuffles only
    the delta.
    """
    d = rollup_state(delta, keys, aggs, scale=scale)
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(o).alias(f"_b_{o}") for o in aggs],
    )
    dd = d.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys],
        *[F.col(o).alias(f"_d_{o}") for o in aggs],
    )
    # null-safe key join: a NULL group key is ONE state on each side
    # and must merge to ONE row — a bare equi-join would emit two
    # partial rows and silently split its counts (the same class as
    # the mad_outliers group join, fixed to the house standard)
    cond = None
    for k in keys:
        e = F.col(f"_bk_{k}").eqNullSafe(F.col(f"_dk_{k}"))
        cond = e if cond is None else cond & e
    j = b.join(dd, cond, "full_outer")
    out_cols = [
        F.coalesce(F.col(f"_bk_{k}"), F.col(f"_dk_{k}")).alias(k) for k in keys
    ]
    for out, (kind, _vc) in aggs.items():
        a, c = F.col(f"_b_{out}"), F.col(f"_d_{out}")
        if kind in ("sum", "count"):
            # the when-chain is load-bearing here: NULL must act as
            # identity for an ABSENT side but a present NULL sum (an
            # all-NULL-values key) must not be zero-coerced
            merged = (
                F.when(a.isNull(), c)
                .when(c.isNull(), a)
                .otherwise(a + c)
            )
        elif kind == "min":
            merged = F.least(a, c)  # least/greatest skip NULLs natively
        else:
            merged = F.greatest(a, c)
        out_cols.append(merged.alias(out))
    return j.select(*out_cols)


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    op_col: str = "op",
    tiebreak: str | None = None,
) -> DataFrame:
    """MERGE-INTO semantics as a plan: fold a CDC changelog into a
    snapshot. ``changes`` carries the key columns, an event time, an
    op code ('I'/'U' upsert, 'D' delete) and the full payload; the
    result is the new snapshot — base rows without changes pass
    through, each changed key takes its LATEST change's payload, and a
    key whose latest change is a delete disappears (whether or not it
    ever existed in the base). Insert vs update need no distinction
    beyond non-delete, exactly like SQL MERGE's WHEN [NOT] MATCHED
    pair with identical bodies.

    Payload columns are base's non-key columns; ``changes`` must carry
    the same names. Key joins are NULL-SAFE (a NULL key is a real key
    — house rule).

    Plan: one window compacts the changelog to its latest row per key
    (changelog-sized, not base-sized), then ONE full-outer equi-join
    against the base. Co-partition/bucket the base on ``keys`` at
    write time and only the compacted changelog shuffles — the
    incremental-refresh pattern merge_rollup uses for aggregates,
    applied to row state.
    """
    if not keys:
        raise ValueError("apply_cdc requires at least one key column")
    payload = [c for c in base.columns if c not in keys]
    missing = [c for c in keys + payload + [ts_col, op_col] if c not in changes.columns]
    if missing:
        raise ValueError(f"apply_cdc: changes is missing columns {missing}")
    # Validate op codes LOUDLY, plan-side: a NULL or unknown op is a
    # corrupt changelog, not a no-op (a NULL op must never be read as
    # "no change for this key"). coalesce in the message — raise_error
    # with a NULL message is its own crash class (the gap_fill lesson).
    changes = changes.withColumn(
        op_col,
        F.when(F.col(op_col).isin("I", "U", "D"), F.col(op_col)).otherwise(
            F.raise_error(F.concat(
                F.lit(f"apply_cdc: invalid {op_col!r} code "),
                F.coalesce(F.col(op_col).cast("string"), F.lit("NULL")),
                F.lit(" (expected 'I'/'U'/'D')"),
            ))
        ),
    )
    latest = snapshot_latest(
        changes.select(
            *keys, ts_col, op_col, *payload,
            *([tiebreak] if tiebreak and tiebreak not in payload else []),
        ),
        keys=keys, ts_col=ts_col, tiebreak=tiebreak,
    )
    b = base.select(
        *[F.col(k).alias(f"_bk_{k}") for k in keys],
        *[F.col(c).alias(f"_b_{c}") for c in payload],
    )
    # Explicit presence marker on the changelog side: "a change row
    # exists for this key" must not be inferred from any payload/op
    # column's nullness (op is validated non-NULL above, but the marker
    # keeps change-detection correct even if that contract loosens).
    ch = latest.select(
        *[F.col(k).alias(f"_ck_{k}") for k in keys],
        F.col(op_col).alias("_c_op"),
        F.lit(1).alias("_cdc_present"),
        *[F.col(c).alias(f"_c_{c}") for c in payload],
    )
    cond = None
    for k in keys:
        e = F.col(f"_bk_{k}").eqNullSafe(F.col(f"_ck_{k}"))
        cond = e if cond is None else cond & e
    j = b.join(ch, cond, "full_outer")
    present = F.col("_cdc_present").isNotNull()
    alive = ~present | (F.col("_c_op") != F.lit("D"))
    picked = [
        F.coalesce(F.col(f"_bk_{k}"), F.col(f"_ck_{k}")).alias(k) for k in keys
    ] + [
        F.when(present, F.col(f"_c_{c}")).otherwise(F.col(f"_b_{c}")).alias(c)
        for c in payload
    ]
    return j.filter(alive).select(*picked)


def state_durations(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Total time spent in each state per key — the time-in-state
    report behind device-uptime, order-lifecycle, and user-journey
    dashboards. Each event opens its state at its timestamp; the state
    closes at the key's NEXT event (LEAD); the key's final event has no
    close and contributes nothing (standard open-interval convention —
    pass a synthetic end-of-observation event to close it).

    Output: keys + ``state`` + ``n_visits`` (rows that opened the
    state) + ``total_ns`` (closed time only, exact long arithmetic;
    NULL when every visit is the dangling last event).

    Plan: ONE shuffle on the keys — the LEAD window and the (keys,
    state) re-aggregation both ride it; durations are pure integer
    subtraction on the epoch-long, no doubles near any boundary.
    """
    if not keys:
        raise ValueError("state_durations requires at least one key column")
    reserved = {"state", "n_visits", "total_ns", "_sd_next"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"state_durations reserves column names {clash}")
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    t = F.col(ts_col).cast("long")
    opened = df.withColumn("_sd_next", F.lead(t).over(w) - t)
    return (
        opened.groupBy(*keys, F.col(state_col).cast("string").alias("state"))
        .agg(
            F.count(F.lit(1)).alias("n_visits"),
            F.sum("_sd_next").alias("total_ns"),
        )
    )


def active_users_approx(
    df: DataFrame,
    ts_col: str,
    *,
    user_col: str,
    day_ns: int = 86_400 * 10**9,
    windows: tuple[int, ...] = (1, 7, 30),
    lgk: int = 12,
) -> DataFrame:
    """Sketch-mode rolling active users — the escape hatch
    :func:`active_users` names for long windows: exact sliding
    distincts fan the user-day table out ×max(window), while this
    builds ONE HyperLogLog sketch per day (Spark's mergeable
    ``hll_sketch_agg``, ~(2^lgk) bytes of state regardless of users)
    and unions day sketches over each window. After the per-day pass,
    every cost is DAY-count sized — event- and user-volume independent
    — so 90/365-day windows are as cheap as 7-day ones.

    Accuracy: standard HLL relative error ~1.04/sqrt(2^lgk) (~1.6% at
    the default lgk=12); estimates are engine-specific by nature, so
    there is no SQL oracle — the error bound vs :func:`active_users`
    is pinned in tests. Same output shape: ``day`` + ``au_{w}d`` longs
    over OBSERVED days only.

    Plan: one (day) groupBy over raw events -> day-sketch table; ×max
    (window) explode of THAT table; one union-agg per report day with
    a conditional union per window (NULL sketches are skipped).
    """
    ws = sorted(set(int(w) for w in windows))
    if not ws or ws[0] < 1:
        raise ValueError("windows must be positive day counts")
    wmax = ws[-1]
    d = int(day_ns)
    t = F.col(ts_col).cast("long")
    day = F.expr(f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), {d})) DIV {d}")
    day_sketch = (
        df.filter(t.isNotNull())
        .groupBy(day.alias("_au_d"))
        .agg(F.hll_sketch_agg(F.col(user_col), F.lit(int(lgk))).alias("_au_sk"))
    )
    exploded = day_sketch.select(
        "_au_d", "_au_sk",
        F.explode(F.sequence(F.lit(0), F.lit(wmax - 1)).cast("array<long>")).alias("_au_off"),
    ).select("_au_sk", "_au_off", (F.col("_au_d") + F.col("_au_off")).alias("day"))
    aggs = [
        F.hll_sketch_estimate(
            F.hll_union_agg(F.when(F.col("_au_off") < F.lit(w), F.col("_au_sk")))
        ).alias(f"au_{w}d")
        for w in ws
    ]
    counts = exploded.groupBy("day").agg(*aggs)
    observed = day_sketch.select(F.col("_au_d").alias("day"))
    return counts.join(observed, "day", "left_semi")


def debounce(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    min_gap_ns: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Gap-based per-key deduplication (the log-pipeline "debounce"):
    keep an event iff the key's PREVIOUS event is at least
    ``min_gap_ns`` older — repeated alerts, retry storms, and
    double-clicks collapse to their leading edge. Gap semantics are
    versus the previous RAW event (one LAG — a pure plan), not versus
    the previously KEPT event (chained semantics are inherently
    sequential; use sessionize + first-per-session for that contract).

    Output: the surviving input rows. One shuffle on the keys; integer
    epoch subtraction only.
    """
    if not keys:
        raise ValueError("debounce requires at least one key column")
    if int(min_gap_ns) <= 0:
        raise ValueError("min_gap_ns must be positive")
    if "_db_prev" in df.columns:
        raise ValueError("debounce reserves the column name '_db_prev'")
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    t = F.col(ts_col).cast("long")
    return (
        df.withColumn("_db_prev", F.lag(t).over(w))
        .filter(
            F.col("_db_prev").isNull()
            | (t - F.col("_db_prev") >= F.lit(int(min_gap_ns)))
        )
        .drop("_db_prev")
    )


def throttle(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    window_ns: int,
    max_per_window: int,
    tiebreak: str | None = None,
) -> DataFrame:
    """Deterministic rate-limit sampling: at most ``max_per_window``
    events per key per fixed time window (exact-floor bucketing via the
    repo's ``(t - pmod(t, w)) DIV w`` idiom), keeping the EARLIEST
    events of each window — the bounded-volume log/telemetry sampler
    whose output is replayable (unlike random sampling, reruns keep
    the same rows).

    One shuffle on the keys; the row_number window frames per
    (key, bucket) so task state is O(1).
    """
    if not keys:
        raise ValueError("throttle requires at least one key column")
    if int(window_ns) <= 0 or int(max_per_window) < 1:
        raise ValueError("window_ns must be positive and max_per_window >= 1")
    reserved = {"_th_bkt", "_th_rn"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"throttle reserves column names {clash}")
    wns = int(window_ns)
    order = _stream_order(ts_col, tiebreak)
    bkt = F.expr(
        f"(CAST({ts_col} AS BIGINT) - pmod(CAST({ts_col} AS BIGINT), {wns})) DIV {wns}"
    )
    w = W.partitionBy(*keys, F.col("_th_bkt")).orderBy(*order)
    return (
        df.withColumn("_th_bkt", bkt)
        .withColumn("_th_rn", F.row_number().over(w))
        .filter(F.col("_th_rn") <= int(max_per_window))
        .drop("_th_bkt", "_th_rn")
    )


def interval_union(
    df: DataFrame,
    *,
    keys: list[str],
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Merged-interval coverage per key — union overlapping/touching
    [start, end] intervals and report how much of the line each key
    actually covers (device uptime, incident duration, booked time).

    Output: keys + ``n_intervals`` (input rows) + ``n_merged`` (islands
    after union) + ``covered_ns`` (total length of the union, exact long
    arithmetic) + ``span_ns`` (max end - min start; covered/span is the
    utilization ratio, left to the caller as an exact pair).

    Gaps-and-islands as ONE window cascade on ONE shuffle: order by
    (start, end), island boundary where start > running max(end) over
    preceding rows, island id = running count of boundaries, then two
    re-aggregations (per island, per key) that ride the same partition.
    Touching intervals (start == prev end) merge; zero-length intervals
    count toward n but add nothing. NULL start/end rows are rejected
    loudly (a silent drop would under-report coverage); end < start is
    rejected as corrupt.
    """
    if not keys:
        raise ValueError("interval_union requires at least one key column")
    reserved = {"n_intervals", "n_merged", "covered_ns", "span_ns",
                "_iu_s", "_iu_e", "_iu_maxe", "_iu_new", "_iu_isl"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"interval_union reserves column names {clash}")
    s = F.col(start_col).cast("long")
    e = F.col(end_col).cast("long")
    checked = df.select(
        *keys,
        F.when(s.isNull() | e.isNull(), F.raise_error(F.lit(
            "interval_union: NULL start/end (drop or repair before the union)"
        ))).when(e < s, F.raise_error(F.concat(
            F.lit("interval_union: end < start for key "),
            F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
        ))).otherwise(s).alias("_iu_s"),
        e.alias("_iu_e"),
    )
    word = W.partitionBy(*keys).orderBy(F.col("_iu_s").asc(), F.col("_iu_e").asc())
    wprev = word.rowsBetween(W.unboundedPreceding, -1)
    wrun = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    flagged = checked.withColumn(
        "_iu_maxe", F.max("_iu_e").over(wprev)
    ).withColumn(
        "_iu_new",
        F.when(F.col("_iu_maxe").isNull() | (F.col("_iu_s") > F.col("_iu_maxe")), 1)
        .otherwise(0),
    ).withColumn("_iu_isl", F.sum("_iu_new").over(wrun))
    islands = flagged.groupBy(*keys, "_iu_isl").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min("_iu_s").alias("_s"),
        F.max("_iu_e").alias("_e"),
    )
    return islands.groupBy(*keys).agg(
        F.sum("_n").alias("n_intervals"),
        F.count(F.lit(1)).alias("n_merged"),
        F.sum(F.col("_e") - F.col("_s")).alias("covered_ns"),
        (F.max("_e") - F.min("_s")).alias("span_ns"),
    )


def session_paths(
    df: DataFrame,
    *,
    session_keys: list[str],
    state_col: str,
    ts_col: str,
    tiebreak: str | None = None,
    max_len: int = 5,
    top: int = 20,
) -> DataFrame:
    """Top-k session path prefixes: each session's first ``max_len``
    states in time order joined with '>' — the "what do users do first"
    report behind onboarding and navigation analysis.

    Output: ``path`` + ``n_sessions`` + ``rank`` (ties broken by path
    asc, deterministic).

    Plan: ONE shuffle on the session keys (rank window + the per-session
    fold both ride it); the in-order path string is built JVM-side by
    sorting the collected (rn, state) structs — collect_list alone has
    no order guarantee — then ONE TakeOrderedAndProject for the global
    top-k (per-partition heaps, k rows to the driver merge; no bare
    global window). NULL states render as the literal 'null' so a path
    through a missing state stays visible.
    """
    if not session_keys:
        raise ValueError("session_paths requires at least one session key")
    if max_len < 1 or top < 1:
        raise ValueError("max_len and top must be >= 1")
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*session_keys).orderBy(*order)
    prefix = (
        df.withColumn("_sp_rn", F.row_number().over(w))
        .filter(F.col("_sp_rn") <= int(max_len))
        .groupBy(*session_keys)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct(
                        F.col("_sp_rn").alias("rn"),
                        F.coalesce(F.col(state_col).cast("string"), F.lit("null")).alias("st"),
                    ))),
                    lambda x: x["st"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = prefix.groupBy("path").agg(F.count(F.lit(1)).alias("n_sessions"))
    topk = counts.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(int(top))
    from .stats import bounded_global_window
    wr = bounded_global_window("path", F.col("n_sessions").desc(), F.col("path").asc())
    return topk.withColumn("rank", F.row_number().over(wr)).select(
        "path", "n_sessions", F.col("rank").cast("long").alias("rank")
    )


def autocorr_lag(
    df: DataFrame,
    value_col: str,
    *,
    keys: list[str],
    ts_col: str,
    lag: int = 1,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Per-key lag-``lag`` AR coefficient in EXACT integer math: the OLS
    slope of v_t against v_{t-lag} (the AR(1) estimate when lag=1),
    emitted as ``ar_micro`` = 1e6 * (n*Sxy - Sx*Sy) DIV (n*Sxx - Sx*Sx)
    over the lagged pairs — same cross-multiplied formulation as
    trend_fit, so it replays bit-for-bit in any engine (a double
    corr() differs across summation orders). Output: keys + ``n_pairs``
    + ``ar_micro`` (NULL when < 2 pairs or zero lag-variance).

    Plan: ONE shuffle on the keys — the LAG window and the five-sum
    aggregation both ride it; values fixed-point at ``scale``.
    """
    if lag < 1:
        raise ValueError("lag must be >= 1")
    reserved = {"n_pairs", "ar_micro", "_ac_x", "_ac_y"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"autocorr_lag reserves column names {clash}")
    from .stats import to_cents

    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    y = to_cents(value_col, scale).cast("decimal(38,0)")
    paired = df.withColumn("_ac_y", y).withColumn("_ac_x", F.lag("_ac_y", lag).over(w))
    pairs = paired.filter(F.col("_ac_x").isNotNull() & F.col("_ac_y").isNotNull())
    sums = pairs.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_ac_x").alias("_sx"),
        F.sum("_ac_y").alias("_sy"),
        F.sum(F.col("_ac_x") * F.col("_ac_y")).alias("_sxy"),
        F.sum(F.col("_ac_x") * F.col("_ac_x")).alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return sums.select(
        *keys,
        F.col("_n").cast("long").alias("n_pairs"),
        F.when(
            (F.col("_n") >= 2) & (den != 0),
            F.expr(
                "CAST((_n * _sxy - _sx * _sy) * 1000000 DIV "
                "(_n * _sxx - _sx * _sx) AS BIGINT)"
            ),
        ).alias("ar_micro"),
    )


def null_runs(
    df: DataFrame,
    value_col: str,
    *,
    keys: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Consecutive-NULL-run report per key — the sensor-outage /
    instrumentation-gap screen: how many NULL stretches, how long the
    worst one ran (in rows), and the total NULL count.

    Output: keys + ``n_nulls`` + ``n_runs`` + ``max_run`` (0s when the
    key has no NULLs — keys always surface, a silent drop would read as
    "no data problems").

    Plan: gaps-and-islands on ONE shuffle — run id = row_number minus
    the NULL-only row_number (the classic rn-difference trick), one
    re-aggregation per run and one per key, all riding the key
    partition.
    """
    if not keys:
        raise ValueError("null_runs requires at least one key column")
    reserved = {"n_nulls", "n_runs", "max_run", "_nr_rn", "_nr_nrn", "_nr_grp"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"null_runs reserves column names {clash}")
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    isnull = F.col(value_col).isNull()
    wn = W.partitionBy(*keys, isnull).orderBy(*order)
    marked = df.select(
        *keys,
        isnull.alias("_isnull"),
        (F.row_number().over(w) - F.row_number().over(wn)).alias("_nr_grp"),
    )
    runs = (
        marked.filter(F.col("_isnull"))
        .groupBy(*keys, "_nr_grp")
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    per_key = runs.groupBy(*keys).agg(
        F.sum("_len").alias("n_nulls"),
        F.count(F.lit(1)).alias("n_runs"),
        F.max("_len").alias("max_run"),
    )
    all_keys = df.select(*keys).distinct()
    # null-safe group join — a NULL key is a real group (house rule);
    # a bare equi-join would zero out the NULL group's real counts
    pk = per_key.select(
        *[F.col(k).alias(f"_nrg_{k}") for k in keys], "n_nulls", "n_runs", "max_run"
    )
    cond = None
    for k in keys:
        e = F.col(k).eqNullSafe(F.col(f"_nrg_{k}"))
        cond = e if cond is None else cond & e
    return (
        all_keys.join(pk, cond, "left")
        .select(
            *keys,
            F.coalesce("n_nulls", F.lit(0)).alias("n_nulls"),
            F.coalesce("n_runs", F.lit(0)).alias("n_runs"),
            F.coalesce("max_run", F.lit(0)).alias("max_run"),
        )
    )


def changepoint_cusum(
    df: DataFrame,
    value_col: str,
    *,
    keys: list[str],
    ts_col: str,
    threshold: float,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """One-sided (upward) CUSUM level-shift detector per key, in EXACT
    integer math. The textbook recursion s_t = max(0, s_{t-1} + (x_t -
    mean)) is not window-expressible, but its closed form is: s_t =
    C_t - min(C_j, j <= t) with C = cumsum(x - mean). The per-key mean
    is the exact rational Sx/n, cleared by working n-scaled:
    d_i = x_i*n - Sx, so every quantity stays a decimal integer and the
    alarm comparison is s_t > threshold * n * scale, cross-multiplied —
    no doubles anywhere near the alarm.

    Output: one row per input event — keys + ts + ``cusum_milli`` (the
    classical statistic in milli-value-units: s*1000 DIV (n*scale) —
    integer truncation, bounded by value magnitude so it stays
    BIGINT-safe at any key size; the alarm itself never goes through
    this projection) + ``alarm`` (boolean, the exact cross-multiplied
    comparison). NULL values contribute a zero deviation (the statistic
    holds), matching the batch EWMA family's NULL posture.

    Plan: ONE shuffle on the keys; the per-key total rides a window on
    the same partition, then cumsum + running-min windows — no second
    exchange, no sort beyond the key partition's (ts, tiebreak).
    """
    if not keys:
        raise ValueError("changepoint_cusum requires at least one key column")
    reserved = {"cusum_num", "alarm", "_cp_c", "_cp_cum", "_cp_min", "_cp_n", "_cp_sx"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"changepoint_cusum reserves column names {clash}")
    from .stats import to_cents

    order = _stream_order(ts_col, tiebreak)
    wall = W.partitionBy(*keys)
    word = W.partitionBy(*keys).orderBy(*order)
    wrun = word.rowsBetween(W.unboundedPreceding, W.currentRow)
    cents = to_cents(value_col, scale).cast("decimal(38,0)")
    # mean over NON-NULL values only; a NULL row's deviation is exactly
    # zero (the statistic holds), not "value 0" (that would be a real
    # deviation of -mean per NULL row)
    staged = df.withColumn("_cp_c", cents).withColumn(
        "_cp_n", F.count("_cp_c").over(wall).cast("decimal(38,0)")
    ).withColumn("_cp_sx", F.sum("_cp_c").over(wall))
    dev = F.when(
        F.col("_cp_c").isNull(), F.lit(0).cast("decimal(38,0)")
    ).otherwise(F.col("_cp_c") * F.col("_cp_n") - F.col("_cp_sx"))
    cum = staged.withColumn("_cp_cum", F.sum(dev).over(wrun)).withColumn(
        "_cp_min", F.min(F.least(F.col("_cp_cum"), F.lit(0).cast("decimal(38,0)"))).over(wrun)
    )
    s = F.col("_cp_cum") - F.col("_cp_min")
    thr_cents = int(round(float(threshold) * scale))
    # structural zero guard: an all-NULL key has _cp_n = 0
    milli = F.when(
        F.col("_cp_n") > 0,
        F.expr(f"CAST((_cp_cum - _cp_min) * 1000 DIV (_cp_n * {int(scale)}) AS BIGINT)"),
    ).otherwise(F.lit(0).cast("long"))
    return cum.select(
        *keys,
        F.col(ts_col),
        milli.alias("cusum_milli"),
        (s > F.col("_cp_n") * F.lit(thr_cents)).alias("alarm"),
    )


def period_over_period(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    *,
    width_ns: int,
    by: list[str] | None = None,
    scale: int = 100,
) -> DataFrame:
    """Period-over-period comparison: per (group, time bucket), the
    fixed-point sum vs the IMMEDIATELY PRECEDING period — delta and
    exact basis-point change. A missing previous period yields NULL
    change (not a comparison against the last period that happened to
    have data — the LAG guard checks bucket adjacency explicitly).

    Output: ``by`` + ``bucket_ns`` (inclusive lower edge) + ``cur_cents``
    + ``prev_cents`` (NULL when the previous period is empty/absent) +
    ``delta_cents`` + ``pct_change_bp`` ((cur-prev)*10000 DIV prev;
    NULL when prev is NULL or zero — structural CASE guard).

    Plan: ONE map-side-combinable groupBy on (by, bucket) — partial
    aggregation collapses rows before the shuffle — then a LAG window
    over the (already bucket-sized) rollup riding the same key. Bucket
    floor is the repo's exact (t - pmod(t, w)) idiom (correct for
    pre-epoch timestamps).
    """
    if width_ns <= 0:
        raise ValueError("width_ns must be positive")
    reserved = {"bucket_ns", "cur_cents", "prev_cents", "delta_cents",
                "pct_change_bp", "_pp_b", "_pp_prev", "_pp_prevb"}
    clash = sorted(reserved & set(by or []))
    if clash:
        raise ValueError(f"period_over_period reserves column names {clash}")
    from .stats import to_cents

    t = F.col(ts_col).cast("long")
    w = int(width_ns)
    bucket = (t - F.pmod(t, F.lit(w)))
    rolled = (
        df.filter(F.col(ts_col).isNotNull())
        .groupBy(*(by or []), bucket.alias("bucket_ns"))
        .agg(F.sum(to_cents(value_col, scale)).alias("cur_cents"))
    )
    word = W.partitionBy(*[F.col(c) for c in (by or [])]).orderBy(F.col("bucket_ns").asc())
    out = rolled.withColumn("_pp_prev", F.lag("cur_cents").over(word)).withColumn(
        "_pp_prevb", F.lag("bucket_ns").over(word)
    )
    prev = F.when(F.col("_pp_prevb") == F.col("bucket_ns") - w, F.col("_pp_prev"))
    return out.select(
        *(by or []),
        "bucket_ns",
        "cur_cents",
        prev.alias("prev_cents"),
        (F.col("cur_cents") - prev).alias("delta_cents"),
        F.when(
            prev.isNotNull() & (prev != 0),
            (F.col("cur_cents") - prev) * 10000
        ).alias("_num"),
    ).withColumn(
        "pct_change_bp",
        F.expr("CASE WHEN _num IS NULL THEN NULL ELSE _num DIV prev_cents END"),
    ).drop("_num")


def cohort_values(
    df: DataFrame,
    *,
    entity_col: str,
    ts_col: str,
    value_col: str,
    width_ns: int,
    scale: int = 100,
) -> DataFrame:
    """Cohort value curves (the LTV table): entities cohort by their
    FIRST-seen period; per (cohort, age-in-periods), the period's
    fixed-point value sum and the cohort's cumulative value — exact
    integer throughout.

    Output: ``cohort_ns`` (the cohort's first-period lower edge) +
    ``age`` (periods since first seen, 0-based) + ``n_entities``
    (distinct entities active at this age) + ``period_cents`` +
    ``cum_cents`` (running total over ages within the cohort).

    Plan: one min-bucket window per entity rides the entity shuffle
    (first-seen is a per-entity aggregate over the SAME key the events
    already group by), one (cohort, age) groupBy, then a cumulative
    window over the (already period-sized) rollup. NULL values count 0
    toward sums but the entity still counts as active.
    """
    if width_ns <= 0:
        raise ValueError("width_ns must be positive")
    reserved = {"cohort_ns", "age", "n_entities", "period_cents", "cum_cents",
                "_cv_b", "_cv_first"}
    clash = sorted(reserved & set(df.columns))
    if clash:
        raise ValueError(f"cohort_values reserves column names {clash}")
    from .stats import to_cents

    w = int(width_ns)
    t = F.col(ts_col).cast("long")
    bucket = (t - F.pmod(t, F.lit(w)))
    staged = df.filter(F.col(ts_col).isNotNull()).withColumn("_cv_b", bucket)
    went = W.partitionBy(entity_col)
    staged = staged.withColumn("_cv_first", F.min("_cv_b").over(went))
    rolled = staged.groupBy(
        F.col("_cv_first").alias("cohort_ns"),
        F.expr(f"(_cv_b - _cv_first) DIV {w}").alias("age"),
    ).agg(
        F.count_distinct(F.col(entity_col)).alias("n_entities"),
        F.sum(F.coalesce(to_cents(value_col, scale), F.lit(0))).alias("period_cents"),
    )
    wcum = W.partitionBy("cohort_ns").orderBy(F.col("age").asc()).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return rolled.withColumn("cum_cents", F.sum("period_cents").over(wcum))


def bursts(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    window_ns: int,
) -> DataFrame:
    """Peak burst rate per key: the maximum number of events falling in
    ANY sliding window of width ``window_ns`` that starts at an event —
    the classic exact formulation (every maximal burst's window starts
    at some event), plus the earliest window start achieving the peak.
    The rate-anomaly screen behind abuse detection and hot-session
    triage: "this user fired 400 events in one minute" is a burst count,
    not an average.

    Events with NULL timestamps drop (no position on the axis). Output:
    ``keys`` + ``peak_n`` + ``peak_start_ns`` (epoch nanoseconds of the
    earliest peak window's first event). ``ts_col`` follows this
    module's convention: an epoch-nanos long (the readers normalize
    timestamps to that), so the long cast is exact — never a
    double-multiply, whose 53-bit mantissa misplaces ns edges.

    Plan: ONE shuffle on the key — a RANGE window (current ts to
    ts + window_ns − 1, in long nanoseconds) counts each candidate
    window on the sorted per-key stream, and the max/argmin re-agg
    rides the same partitioning. Per-key state is the window's event
    span, never the whole key history; the per-key sort is the same
    bound as sessionize.
    """
    if not keys:
        raise ValueError("bursts requires at least one key column")
    if int(window_ns) <= 0:
        raise ValueError("bursts needs window_ns > 0")
    reserved = {"peak_n", "peak_start_ns", "_bu_t", "_bu_n"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"bursts reserves column names {clash}")
    tns = F.col(ts_col).cast("long")
    w = (
        W.partitionBy(*[F.col(k) for k in keys])
        .orderBy(F.col("_bu_t").asc())
        .rangeBetween(0, int(window_ns) - 1)
    )
    counted = (
        df.filter(F.col(ts_col).isNotNull())
        .select(*keys, tns.alias("_bu_t"))
        .withColumn("_bu_n", F.count(F.lit(1)).over(w))
    )
    return (
        counted.groupBy(*keys)
        .agg(
            F.max("_bu_n").alias("peak_n"),
            F.min_by("_bu_t", F.struct(
                (-F.col("_bu_n")).alias("a"), F.col("_bu_t").alias("b"))
            ).alias("peak_start_ns"),
        )
    )


def transition_probs(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    state_col: str,
    tiebreak: str | None = None,
    by: list[str] | None = None,
) -> DataFrame:
    """First-order Markov transition matrix with probabilities: the
    ``transitions`` counts plus each row's EXACT integer-bp conditional
    probability P(to|from) = n · 10000 DIV Σ_from n — the
    product-analytics "where do users go from here" table with no
    doubles in the figure.

    Output: ``by`` + ``from_state`` + ``to_state`` + ``n`` +
    ``from_total`` + ``prob_bp``.

    Plan: the transitions lag-window + count (one raw-stream shuffle),
    then the per-from_state total as a window over the counted matrix —
    bounded by state-pair cardinality, never row count.
    """
    counts = transitions(
        df, keys=keys, ts_col=ts_col, state_col=state_col,
        tiebreak=tiebreak, by=by,
    )
    reserved = {"from_total", "prob_bp"}
    clash = sorted(reserved & set(by or []))
    if clash:
        raise ValueError(f"transition_probs reserves column names {clash}")
    wfrom = W.partitionBy(*[F.col(c) for c in (by or [])], F.col("from_state"))
    return (
        counts.withColumn("from_total", F.sum("n").over(wfrom))
        .withColumn("prob_bp", F.expr(
            "CAST(CAST(n AS DECIMAL(38,0)) * 10000"
            " DIV CAST(from_total AS DECIMAL(38,0)) AS BIGINT)"))
    )


def sequence_ngrams(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    state_col: str,
    n: int = 3,
    tiebreak: str | None = None,
    by: list[str] | None = None,
    top_n: int | None = None,
) -> DataFrame:
    """Sequential pattern mining, order-n: every run of ``n``
    CONSECUTIVE states per key stream (ordered by ts, tiebreak),
    counted — the generalization of ``transitions`` (n=2) that answers
    "what three-step behavior paths are most common". Unlike
    session_paths (whole-path rollup) this counts every SLIDING window
    of n steps, so long sessions contribute all their sub-patterns.

    Output: ``by`` + ``state_1`` .. ``state_n`` + ``support``. Streams
    shorter than n contribute nothing; grams are gated by an
    end-of-stream sentinel (not a NULL check on state_n), so a genuine
    NULL state anywhere in the window still counts — the true
    generalization of ``transitions``, which keeps (A -> NULL) pairs. ``top_n`` keeps the highest-
    support patterns (support desc, states asc — deterministic) via
    TakeOrderedAndProject, never a global sort.

    Plan: one lag/lead window pass over the (keys, ts) sort — n−1 LEAD
    projections riding ONE window spec — then a map-side-combinable
    count on state-tuple cardinality. Same per-key sort bound as
    sessionize/transitions.
    """
    if n < 2:
        raise ValueError("sequence_ngrams needs n >= 2 (n=1 is a value count)")
    if not keys:
        raise ValueError("sequence_ngrams requires at least one key column")
    state_cols = [f"state_{i + 1}" for i in range(n)]
    reserved = set(state_cols) | {"support"}
    clash = sorted(reserved & set(by or []))
    if clash:
        raise ValueError(f"sequence_ngrams reserves column names {clash}")
    # NULLS LAST in the stream order too (not just the top_n sort):
    # Spark's bare .asc() is NULLS FIRST while ANSI/DuckDB default is
    # NULLS LAST, so a NULL ts/tiebreak row would sequence differently
    # per engine and silently shuffle every gram it touches
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    # End-of-stream is detected by a SENTINEL lead over a literal — not
    # by `state_n IS NOT NULL`, which would conflate a genuine NULL
    # state in the last gram position with lead()'s end-of-stream
    # padding and silently drop (A -> NULL) grams that transitions()
    # keeps (r9 ADVICE). lead(lit(1), n-1) is NULL exactly when no row
    # exists n-1 ahead, regardless of state values.
    grams = df.select(
        *(by or []),
        F.col(state_col).alias("state_1"),
        *[F.lead(F.col(state_col), i).over(w).alias(f"state_{i + 1}")
          for i in range(1, n)],
        F.lead(F.lit(1), n - 1).over(w).alias("_eos"),
    ).filter(F.col("_eos").isNotNull()).drop("_eos")
    out = grams.groupBy(*(by or []), *state_cols).agg(
        F.count(F.lit(1)).alias("support")
    )
    if top_n is not None:
        # NULLS LAST matches ANSI/DuckDB ASC default, so a NULL state at
        # the LIMIT boundary cannot diverge between engines
        out = out.orderBy(
            F.col("support").desc(), *[F.col(c).asc_nulls_last() for c in state_cols]
        ).limit(int(top_n))
    return out


def changepoint_mean_shift(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Single best mean-shift changepoint per key stream, EXACT: over
    every split k (left = first k observations by time), the
    between-segment sum of squares (n_R·S_L − n_L·S_R)² / (n_L·n_R·n)
    in fixed-point cents² — the classic binary-segmentation score with
    the doubles cleared by cross-multiplication. The winning split is
    the max score, ties to the EARLIEST split — via the min-of-
    ordering-struct argmax (the mode_by idiom), one aggregation, no
    second pass. Keys with < 2 usable rows vanish (no split exists).
    NULL values/timestamps drop.

    Output: ``keys`` + ``n`` + ``split_idx`` (size of the left
    segment) + ``split_ts`` (last left-segment timestamp) + ``n_left``
    + ``n_right`` + ``mean_left_cents`` + ``mean_right_cents`` +
    ``score`` (the between-SS in cents², decimal — comparable across
    splits of the SAME stream; not normalized across streams).

    Exact-arithmetic bound: |n_R·S_L − n_L·S_R| ≤ n·Σ|v| must stay
    within 19 digits so its square fits decimal(38,0), AND the
    integral quotient num²/den must fit a BIGINT (Spark's DIV result
    type) — both checked via digit counts, the second per split
    (2·digits(|num|) − digits(den) + 1 ≤ 18 guarantees the quotient
    < 10¹⁸ < Long.MAX), so the promise is a named raise, never a
    silent ANSI overflow or a NULL score winning the argmax in
    non-ANSI mode. Sub-cent `scale` or shorter streams are the
    remedy.

    Plan: ONE shuffle on the keys — the prefix-sum window (explicit
    ROWS frame), per-key totals window, and the argmax aggregation all
    ride it. Per-key stream length is the family's documented
    exact-order bound.
    """
    if not keys:
        raise ValueError("changepoint_mean_shift requires key columns")
    reserved = {"n", "split_idx", "split_ts", "n_left", "n_right",
                "mean_left_cents", "mean_right_cents", "score",
                "_cp_c", "_cp_i", "_cp_cum", "_cp_n", "_cp_s", "_cp_ts",
                "_cp_num", "_cp_den"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"changepoint_mean_shift reserves column names {clash}")
    from .stats import to_cents

    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    wrows = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    wall = W.partitionBy(*keys)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn("_cp_c", to_cents(value_col, scale).cast("decimal(38,0)"))
    staged = (
        base.withColumn("_cp_i", F.row_number().over(w))
        .withColumn("_cp_cum", F.sum("_cp_c").over(wrows))
        .withColumn("_cp_n", F.count(F.lit(1)).over(wall))
        .withColumn("_cp_s", F.sum("_cp_c").over(wall))
        .withColumn("_cp_abs", F.sum(F.abs("_cp_c")).over(wall))
    )
    splits = (
        staged.filter(F.col("_cp_i") < F.col("_cp_n"))
        .withColumn("_cp_num", F.expr(
            "(_cp_n - _cp_i) * _cp_cum - _cp_i * (_cp_s - _cp_cum)"))
        .withColumn("_cp_den", F.expr("_cp_i * (_cp_n - _cp_i) * _cp_n"))
    )
    # digit pre-checks (the correlation_r2 posture): |num| <= n * sum|v|
    # needs <= 19 digits so num² fits decimal(38,0), n needs <= 12
    # digits so the k(n-k)n denominator product does (3 * 12 < 38, and
    # this bound matters exactly when values are all zeros: num=0 but
    # the denominator is still evaluated), and — per split — the
    # integral quotient num² DIV den must fit the BIGINT that Spark's
    # DIV yields: num² < 10^(2·d_num) and den >= 10^(d_den - 1), so
    # 2·d_num - d_den + 1 <= 18 guarantees quotient < 10^18 < Long.MAX
    # (without this, e.g. n=2 with 19-digit num squares to ~1e38 over
    # den=2 — an ANSI overflow, or a NULL score winning the argmax)
    oob = F.expr(
        "length(CAST(_cp_n AS STRING)) + length(CAST(_cp_abs + 1 AS STRING)) > 19"
        " OR 3 * length(CAST(_cp_n AS STRING)) > 38"
        " OR 2 * length(CAST(abs(_cp_num) AS STRING))"
        "   - length(CAST(_cp_den AS STRING)) + 1 > 18"
    )
    score = F.expr("_cp_num * _cp_num DIV _cp_den")
    scored = splits.withColumn(
        "_score",
        F.when(oob, F.raise_error(F.lit(
            "changepoint_mean_shift: stream magnitude exceeds the exact "
            "range for the squared score (decimal(38,0) square or BIGINT "
            "quotient) — use a coarser scale or shorter streams"))).otherwise(score),
    ).withColumn("_neg", -F.col("_score"))
    pick = F.min(F.struct(
        F.col("_neg").alias("ns"),
        F.col("_cp_i").alias("k"),
        # ts keeps its input type (TIMESTAMP_NTZ can't cast to long and
        # doesn't need to: _cp_i is unique per key, so struct-min never
        # compares past it — ts is payload, not ordering)
        F.col(ts_col).alias("ts"),
        F.col("_cp_cum").alias("sl"),
        F.col("_cp_n").alias("n"),
        F.col("_cp_s").alias("s"),
    )).alias("_pick")
    return (
        scored.groupBy(*keys).agg(pick)
        .select(
            *keys,
            F.col("_pick.n").cast("long").alias("n"),
            F.col("_pick.k").cast("long").alias("split_idx"),
            F.col("_pick.ts").alias("split_ts"),
            F.col("_pick.k").cast("long").alias("n_left"),
            (F.col("_pick.n") - F.col("_pick.k")).cast("long").alias("n_right"),
            F.expr("CAST(_pick.sl DIV _pick.k AS BIGINT)").alias("mean_left_cents"),
            F.expr("CAST((_pick.s - _pick.sl) DIV (_pick.n - _pick.k) AS BIGINT)")
            .alias("mean_right_cents"),
            (-F.col("_pick.ns")).cast("decimal(38,0)").alias("score"),
        )
    )


def sma_crossover(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_col: str,
    short_n: int = 3,
    long_n: int = 7,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Moving-average crossover events per key stream, EXACT: at each
    observation with a full long window, the short-window mean is
    compared to the long-window mean by CROSS-MULTIPLICATION of the
    fixed-point sums (sum_s·n_l vs sum_l·n_s — no division anywhere
    near the comparison), and a row is emitted whenever the state
    flips: 'golden' (short crosses above) or 'death' (short crosses
    to not-above; ties count as not-above, so a touch-and-retreat is
    not a double cross). The first full-window row never signals (no
    previous state). NULL values/timestamps drop.

    Output: ``keys`` + ``ts`` + ``direction`` + ``short_sum_cents`` +
    ``long_sum_cents`` + ``short_mean_cents`` + ``long_mean_cents``.

    Plan: ONE shuffle on the keys — both ROWS-frame sums, the
    row_number, and the state lag all ride the same sorted window.
    """
    if not keys:
        raise ValueError("sma_crossover requires key columns")
    if not (0 < int(short_n) < int(long_n)):
        raise ValueError("need 0 < short_n < long_n")
    reserved = {"ts", "direction", "short_sum_cents", "long_sum_cents",
                "short_mean_cents", "long_mean_cents",
                "_sm_c", "_sm_i", "_sm_s", "_sm_l", "_sm_st"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"sma_crossover reserves column names {clash}")
    from .stats import to_cents

    s_n, l_n = int(short_n), int(long_n)
    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn("_sm_c", to_cents(value_col, scale).cast("decimal(38,0)"))
    staged = (
        base.withColumn("_sm_i", F.row_number().over(w))
        .withColumn("_sm_s", F.sum("_sm_c").over(w.rowsBetween(-(s_n - 1), 0)))
        .withColumn("_sm_l", F.sum("_sm_c").over(w.rowsBetween(-(l_n - 1), 0)))
    )
    full = staged.filter(F.col("_sm_i") >= l_n).withColumn(
        "_sm_st",
        F.when(F.col("_sm_s") * l_n > F.col("_sm_l") * s_n, 1).otherwise(0),
    )
    wprev = W.partitionBy(*keys).orderBy(*order)
    flips = full.withColumn("_prev", F.lag("_sm_st").over(wprev)).filter(
        F.col("_prev").isNotNull() & (F.col("_sm_st") != F.col("_prev"))
    )
    return flips.select(
        *keys,
        F.col(ts_col).cast("long").alias("ts"),
        F.when(F.col("_sm_st") == 1, F.lit("golden")).otherwise(F.lit("death"))
        .alias("direction"),
        F.col("_sm_s").cast("long").alias("short_sum_cents"),
        F.col("_sm_l").cast("long").alias("long_sum_cents"),
        F.expr(f"CAST(_sm_s DIV {s_n} AS BIGINT)").alias("short_mean_cents"),
        F.expr(f"CAST(_sm_l DIV {l_n} AS BIGINT)").alias("long_mean_cents"),
    )


def runs_by(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_col: str,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Runs analysis per key stream, EXACT: dichotomize each
    observation as above the key's mean (STRICTLY — compared by
    cross-multiplication v·n > Σv in fixed-point cents, ties land
    'not above') and count the maximal runs of equal state — the
    Wald-Wolfowitz runs count plus the longest run, the randomness /
    clustering diagnostic for event streams. NULL values/timestamps
    drop; single-row keys report one run of length 1.

    Output: ``keys`` + ``n`` + ``n_above`` + ``n_runs`` +
    ``longest_run``.

    Plan: one shuffle on the keys carries the mean windows, the state
    lag, and the run-id prefix sum (explicit ROWS frame); the run-
    length collapse re-keys on (keys, run_id) — map-side combinable,
    run-count rows after the partial aggregate.
    """
    if not keys:
        raise ValueError("runs_by requires key columns")
    reserved = {"n", "n_above", "n_runs", "longest_run",
                "_rn_c", "_rn_st", "_rn_new", "_rn_id",
                "_rn_n", "_rn_s", "_rn_len"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"runs_by reserves column names {clash}")
    from .stats import to_cents

    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    wall = W.partitionBy(*keys)
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
    ).withColumn("_rn_c", to_cents(value_col, scale).cast("decimal(38,0)"))
    staged = (
        base.withColumn("_rn_n", F.count(F.lit(1)).over(wall))
        .withColumn("_rn_s", F.sum("_rn_c").over(wall))
        .withColumn(
            "_rn_st",
            F.when(F.col("_rn_c") * F.col("_rn_n") > F.col("_rn_s"), 1).otherwise(0),
        )
        .withColumn(
            "_rn_new",
            F.when(
                F.lag("_rn_st").over(w).isNull()
                | (F.lag("_rn_st").over(w) != F.col("_rn_st")), 1
            ).otherwise(0),
        )
        .withColumn(
            "_rn_id",
            F.sum("_rn_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
        )
    )
    runs = staged.groupBy(*keys, "_rn_id").agg(
        F.count(F.lit(1)).alias("_rn_len"),
        F.max("_rn_st").alias("_rn_st"),
    )
    return runs.groupBy(*keys).agg(
        F.sum("_rn_len").cast("long").alias("n"),
        F.sum(F.when(F.col("_rn_st") == 1, F.col("_rn_len")).otherwise(0))
        .cast("long").alias("n_above"),
        F.count(F.lit(1)).alias("n_runs"),
        F.max("_rn_len").cast("long").alias("longest_run"),
    )


def acf_table(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    value_col: str,
    max_lag: int = 7,
    tiebreak: str | None = None,
    scale: int = 100,
) -> DataFrame:
    """Autocorrelation table per key: the lag-ℓ AR coefficient for
    every ℓ = 1..max_lag in ONE pass, each in autocorr_lag's exact
    integer formulation (ar_micro = 10⁶·(n·Sxy − Sx·Sy) DIV
    (n·Sxx − Sx·Sx) over the lagged pairs — the OLS slope of v_t on
    v_{t−ℓ}, bit-replayable; a double corr() is summation-order-
    dependent). The seasonality screener: a daily series with weekly
    rhythm shows the lag-7 spike here.

    Output: ``keys`` + ``lag`` + ``n_pairs`` + ``ar_micro`` (NULL
    when < 2 pairs or zero lag-variance).

    Plan: ONE shuffle on the keys — all max_lag LAG projections ride
    one window spec; the (lag, x) pairs then stack via an inline
    explode (rows × max_lag, map-side) into a single map-side-
    combinable five-sum aggregation on (keys, lag). One shuffle total
    vs max_lag shuffles for repeated autocorr_lag calls.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    if not keys:
        raise ValueError("acf_table requires key columns")
    reserved = {"lag", "n_pairs", "ar_micro", "_af_y", "_af_x"}
    clash = sorted(reserved & set(keys))
    if clash:
        raise ValueError(f"acf_table reserves column names {clash}")
    from .stats import to_cents

    order = _stream_order(ts_col, tiebreak)
    w = W.partitionBy(*keys).orderBy(*order)
    base = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "_af_y", to_cents(value_col, scale).cast("decimal(38,0)")
    )
    # the window lags materialize in one projection (a generator can't
    # host window expressions), then a second projection stacks them —
    # both narrow, no extra shuffle
    lagged = base.select(
        *keys, "_af_y",
        *[F.lag("_af_y", l).over(w).alias(f"_af_l{l}")
          for l in range(1, int(max_lag) + 1)],
    )
    stacked = (
        lagged.withColumn("_lx", F.explode(F.array(*[
            F.struct(F.lit(l).alias("lag"), F.col(f"_af_l{l}").alias("x"))
            for l in range(1, int(max_lag) + 1)
        ])))
        .select(*keys, F.col("_af_y"),
                F.col("_lx.lag").alias("lag"), F.col("_lx.x").alias("_af_x"))
        .filter(F.col("_af_x").isNotNull() & F.col("_af_y").isNotNull())
    )
    sums = stacked.groupBy(*keys, "lag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("_n"),
        F.sum("_af_x").alias("_sx"),
        F.sum("_af_y").alias("_sy"),
        F.sum(F.col("_af_x") * F.col("_af_y")).alias("_sxy"),
        F.sum(F.col("_af_x") * F.col("_af_x")).alias("_sxx"),
    )
    den = F.col("_n") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return sums.select(
        *keys, "lag",
        F.col("_n").cast("long").alias("n_pairs"),
        F.when(
            (F.col("_n") >= 2) & (den != 0),
            F.expr("CAST((_n * _sxy - _sx * _sy) * 1000000 DIV "
                   "(_n * _sxx - _sx * _sx) AS BIGINT)"),
        ).alias("ar_micro"),
    )


def session_entry_exit(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    page_col: str,
    gap: int,
    tiebreak: str,
    hot_key_bucket: int | None = None,
) -> DataFrame:
    """Entry/exit/bounce report per page (the web-analytics landing
    table), EXACT: sessionize the stream (gap rule), take each
    session's first and last page (min/max of the (ts, tiebreak, page)
    ordering struct — ``tiebreak`` is REQUIRED and must be unique per
    (key, ts) so first/last are deterministic), then per page: how
    many sessions entered there, exited there, bounced there
    (single-event sessions), with bounce_bp = bounces·10⁴ DIV entries.
    Pages that only ever appear mid-session report zero entries/exits
    and a NULL bounce_bp (no entries — rate undefined).

    Output: ``page`` + ``n_entries`` + ``n_exits`` + ``n_bounces`` +
    ``bounce_bp``.

    Plan: sessionize's one keyed sort (``hot_key_bucket`` passes
    through for skewed keys), one (key, session) aggregation riding
    the same shuffle grain, then two page-grain counts merged with a
    full outer join — page cardinality, never row cardinality.
    """
    if not keys:
        raise ValueError("session_entry_exit requires key columns")
    if not tiebreak:
        raise ValueError(
            "session_entry_exit requires a tiebreak column unique per "
            "(key, ts) — first/last pages are undefined otherwise"
        )
    s = sessionize(
        df, keys=keys, ts_col=ts_col, gap=gap, tiebreak=tiebreak,
        hot_key_bucket=hot_key_bucket, out_col="_se_sid",
    )
    ordk = F.struct(
        F.col(ts_col).cast("long").alias("ts"),
        F.col(tiebreak).alias("tb"),
        F.col(page_col).alias("page"),
    )
    per_session = s.groupBy(*keys, "_se_sid").agg(
        F.min(ordk).alias("_first"),
        F.max(ordk).alias("_last"),
        F.count(F.lit(1)).alias("_n_events"),
    )
    entries = per_session.groupBy(F.col("_first.page").alias("page")).agg(
        F.count(F.lit(1)).alias("n_entries"),
        F.sum(F.when(F.col("_n_events") == 1, 1).otherwise(0)).alias("n_bounces"),
    )
    exits = per_session.groupBy(F.col("_last.page").alias("page")).agg(
        F.count(F.lit(1)).alias("n_exits")
    )
    merged = entries.join(exits, ["page"], "full_outer")
    return merged.select(
        "page",
        F.coalesce("n_entries", F.lit(0)).alias("n_entries"),
        F.coalesce("n_exits", F.lit(0)).alias("n_exits"),
        F.coalesce("n_bounces", F.lit(0)).alias("n_bounces"),
        F.when(
            F.coalesce("n_entries", F.lit(0)) > 0,
            F.expr("CAST(CAST(n_bounces AS DECIMAL(38,0)) * 10000"
                   " DIV CAST(n_entries AS DECIMAL(38,0)) AS BIGINT)"),
        ).alias("bounce_bp"),
    )
