"""Fast regression guard for the driver's correctness gate: run a
representative subset of queries() against their DuckDB oracles at
sf0.001 (full sweep: `python tools/compare_oracle.py`)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not available"
)

SUBSET = [
    "rollup_1m",
    "rollup_1h_cascade",
    "gapfill_locf",
    "session_segments",
    "topk_per_group",
    "dedup_exact",
    "text_quality",
    "embedding_norms",
    "grouping_sets",
]


def test_oracle_subset(spark):
    from compare_oracle import compare

    results = compare(spark, SF_DIR, SUBSET)
    bad = {k: v for k, v in results.items() if v["status"] not in ("MATCH", "ROWS_ONLY")}
    assert not bad, bad
    assert len(results) == len(SUBSET)
