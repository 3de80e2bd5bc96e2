"""Durable correctness gate: EVERY registered query must hash-match its
DuckDB oracle at sf0.001 on every test run.

The per-round driver gate may re-check only a prior round's key set, so
queries added since would otherwise have no regression signal between
rounds (the round-3 verdict found 15 such queries). This test closes
that gap: it runs the same compare (row count, column names,
order-insensitive value hash) as scripts/check_oracle.py over the full
``__spark_entry__.queries()`` registry.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_every_registered_query_matches_oracle(spark, sf_dir):
    from check_oracle import check_all

    failures = check_all(spark, sf_dir)
    assert failures == [], f"oracle mismatches: {failures}"


def test_entry_contract_shapes(spark, sf_dir):
    """entry() returns a DataFrame with rows; every queries() key with an
    oracle has SQL text; every oracle key is a registered query."""
    import __spark_entry__ as entry

    df = entry.entry(spark)
    assert df.count() >= 0 and df.schema.fieldNames()
    qs, oracles = entry.queries(), entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert all(isinstance(s, str) and s.strip() for s in oracles.values())
