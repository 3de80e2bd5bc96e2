"""Bench coverage is a decision, not an accident: every registry query
is either benched or carries an explicit exclusion class in
bench.BENCH_EXCLUDED (variant / plan-only / micro / gated). A new
queries() entry that lands in neither fails here until classified."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_every_registry_query_benched_or_classified():
    import bench
    import __spark_entry__ as entry

    reg = set(entry.queries())
    benched = set(bench.BENCH_QUERIES)
    excluded = set(bench.BENCH_EXCLUDED)

    assert not benched & excluded, sorted(benched & excluded)
    unknown_benched = benched - reg
    assert not unknown_benched, f"benched but not registered: {sorted(unknown_benched)}"
    unknown_excluded = excluded - reg
    assert not unknown_excluded, f"excluded but not registered: {sorted(unknown_excluded)}"
    unclassified = reg - benched - excluded
    assert not unclassified, (
        "registry queries neither benched nor classified in "
        f"bench.BENCH_EXCLUDED: {sorted(unclassified)}"
    )


def test_exclusion_classes_are_known():
    import bench

    assert set(bench.BENCH_EXCLUDED.values()) <= {"variant", "plan-only", "micro", "gated"}
