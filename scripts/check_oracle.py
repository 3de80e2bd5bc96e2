"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry on Spark AND its oracle_sql() on DuckDB
over the same parquet, compare row count, column names, and an
order-insensitive value hash.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(v):
    if v is None:
        return "\x00NULL"
    if isinstance(v, bool):
        return f"b:{int(v)}"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return f"f:{int(v)}"
        return f"f:{v!r}"
    if isinstance(v, int):
        return f"f:{v}" if False else f"i:{v}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return "s:" + str(v)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    digests = sorted(
        hashlib.md5("|".join(canon(r[i]) for i in order).encode()).hexdigest() for r in rows
    )
    return hashlib.md5("\n".join(digests).encode()).hexdigest()


def canon_pd(v):
    """Canonicalize a value from a PANDAS frame (numpy scalars, pd.NA,
    NaT, Decimal objects) to the same tag space as ``canon``. This is
    the representation a harness that fetches via DuckDB ``.df()`` /
    Spark ``toPandas()`` hashes — numerically identical results can
    still diverge here (round 6: DuckDB HUGEINT -> float64 under .df()
    vs Spark int64, so 3 hashed as 'f:3' vs 'i:3')."""
    import pandas as pd

    if v is None or v is pd.NA or (isinstance(v, float) and v != v):
        return "\x00NULL"
    try:
        if pd.isna(v):  # NaT and friends (non-array values only)
            return "\x00NULL"
    except (TypeError, ValueError):
        pass
    if hasattr(v, "item") and not isinstance(v, (list, tuple)):
        v = v.item()  # numpy scalar -> python
    return canon(v)


def pandas_rep_hashes(sdf, duck_res):
    """(spark_toPandas_hash, duck_df_hash) — the representation-level
    cross-check. ``canon_pd`` maps NULL-ish consistently on both sides,
    so a mismatch here means the two engines' PANDAS representations of
    the same result differ (dtype divergence: HUGEINT/DECIMAL columns,
    int-vs-float inference) even when fetchall()/collect() agree. A
    driver that hashes pandas frames sees exactly this divergence."""
    spdf = sdf.toPandas()
    ddf = duck_res.df()

    def h(pdf):
        cols = sorted(pdf.columns)
        rows = pdf[cols].itertuples(index=False, name=None)
        digests = sorted(
            hashlib.md5("|".join(canon_pd(v) for v in r).encode()).hexdigest()
            for r in rows
        )
        return hashlib.md5("\n".join(digests).encode()).hexdigest()

    return h(spdf), h(ddf)


def check_all(spark, sf_dir: str, only: set[str] | None = None,
              rep_check: bool = False,
              forensic_dir: str | None = None) -> list[str]:
    """Run every __spark_entry__.queries() entry against its oracle_sql()
    on ``sf_dir``; returns the list of failing query names. Importable so
    the pytest suite can gate ALL registered queries every run (the
    driver's per-round gate may cover only a subset — this keeps the
    newest queries from regressing silently between rounds).

    ``rep_check``: additionally hash the PANDAS representations of both
    sides (Spark ``toPandas`` vs DuckDB ``.df()``) and fail on
    divergence — the round-6 driver reds were exactly this class
    (HUGEINT oracle columns), invisible to the fetchall comparison.

    ``forensic_dir``: write one JSON per query with both hash families,
    row counts, 5 canonical sample rows, library versions, and the
    effective session confs — a committed known-good snapshot a future
    driver mismatch can be diffed against."""
    import json
    import os

    import __spark_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    if forensic_dir:
        os.makedirs(forensic_dir, exist_ok=True)

    qs = entry.queries()
    oracles = entry.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            spark.catalog.clearCache()
            print(f"weak  {name}: no oracle (rows-only) -> {len(s_rows)} rows")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0] for c in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            spark.catalog.clearCache()
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {str(e)[:300]}")
            continue
        rep_s = rep_d = None
        if rep_check or forensic_dir:
            try:
                rep_s, rep_d = pandas_rep_hashes(sdf, con.execute(oracles[name]))
            except Exception as e:
                # stop here: a second failures entry from the value-hash
                # comparison would double-count the query, and a forensic
                # dump with null pandas hashes would masquerade as
                # "rep check not requested"
                spark.catalog.clearCache()
                failures.append(name)
                print(f"FAIL  {name}: rep-check error: {str(e)[:200]}")
                continue
        # operator-internal cache handles (shingles, lm bigrams,
        # sample inputs) must not accumulate across 80+ queries
        spark.catalog.clearCache()
        problems = []
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        if len(s_rows) != len(d_rows):
            problems.append(f"rows spark={len(s_rows)} duck={len(d_rows)}")
        if not problems:
            hs = table_hash(s_rows, s_cols)
            hd = table_hash(d_rows, d_cols)
            if hs != hd:
                problems.append("value-hash mismatch")
            if rep_check and rep_s != rep_d:
                problems.append("pandas-REPRESENTATION mismatch (dtype divergence)")
        if forensic_dir and name in oracles:
            o = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            sample = sorted("|".join(canon(r[i]) for i in o) for r in s_rows)[:5]
            import pandas as pd
            import pyarrow as pa
            dump = {
                "query": name, "sf_dir": sf_dir,
                "rows": len(s_rows), "cols": sorted(s_cols),
                "hash_fetch_spark": table_hash(s_rows, s_cols),
                "hash_fetch_duck": table_hash(d_rows, d_cols),
                "hash_pandas_spark": rep_s, "hash_pandas_duck": rep_d,
                "sample_canonical_rows": sample,
                "versions": {
                    "spark": spark.version, "duckdb": duckdb.__version__,
                    "pandas": pd.__version__, "pyarrow": pa.__version__,
                    "python": sys.version.split()[0],
                },
                "session_confs": {
                    k: _conf(spark, k) for k in (
                        "spark.sql.session.timeZone",
                        "spark.sql.execution.arrow.pyspark.enabled",
                        "spark.sql.shuffle.partitions",
                        "spark.sql.ansi.enabled",
                        "spark.sql.adaptive.enabled",
                        "spark.sql.legacy.parquet.nanosAsLong",
                    )
                },
            }
            with open(os.path.join(forensic_dir, f"{name}.json"), "w") as f:
                json.dump(dump, f, indent=1, sort_keys=True)
        if problems:
            failures.append(name)
            print(f"FAIL  {name}: {'; '.join(problems)}")
            if "value-hash mismatch" in problems:
                o = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
                od = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
                sset = {tuple(canon(r[i]) for i in o) for r in s_rows}
                dset = {tuple(canon(r[i]) for i in od) for r in d_rows}
                print("   spark-only:", list(sset - dset)[:3])
                print("   duck-only :", list(dset - sset)[:3])
        else:
            print(f"OK    {name} ({len(s_rows)} rows)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return failures


def _conf(spark, key):
    try:
        return spark.conf.get(key)
    except Exception:
        return None


def main():
    args = sys.argv[1:]
    forensic_dir = None
    if "--forensic" in args:
        i = args.index("--forensic")
        if i + 1 >= len(args):
            sys.exit("--forensic requires a directory argument")
        forensic_dir = args[i + 1]
        del args[i:i + 2]
    # detect flags AFTER the forensic pair is removed, so a forensic dir
    # that happens to be spelled like a flag can't toggle modes
    rep_check = "--rep" in args
    if rep_check:
        args.remove("--rep")
    vanilla = "--vanilla" in args
    if vanilla:
        args.remove("--vanilla")
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    if vanilla:
        # the driver builds its own session: prove correctness without
        # get_spark's conf set (UTC, Arrow, AQE, broadcast threshold)
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.master("local[8]")
                 .appName("oracle-check-vanilla").getOrCreate())
    else:
        from docetl_spark import get_spark

        spark = get_spark("oracle-check", shuffle_partitions=8)
    failures = check_all(spark, sf_dir, only or None,
                         rep_check=rep_check, forensic_dir=forensic_dir)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
