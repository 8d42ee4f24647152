"""Plan hygiene across the WHOLE query registry.

The per-operator plan tests (test_plans.py) pin the load-bearing
contracts — Exchange counts, PushedFilters, no-BNLJ for specific ops.
This sweep enforces two engine-wide invariants on every registered
query's physical plan, so a regression in ANY query (including ones
without a dedicated plan test) fails CI:

- no ``CartesianProduct``: a quadratic join is never acceptable at the
  100 TB tier;
- no ``BatchEvalPython``: row-at-a-time Python UDFs are banned — all
  Python execution must be Arrow-batched (ArrowEvalPython /
  FlatMapGroupsInPandas / MapInPandas).

Runs at sf0.001: the plan SHAPE is scale-independent (AQE re-plans at
runtime, but neither flag can appear at runtime if it is absent from
the initial physical plan — AQE only replaces sort-merge/shuffle joins
with broadcast ones, never the reverse).
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_PLAN_SF_DIR", "/root/testdata/sf0.001")


#: BroadcastNestedLoopJoin is quadratic-per-partition and only
#: acceptable where a small broadcast side makes it the RIGHT plan;
#: every such query must be whitelisted here with its justification.
BNLJ_WHITELIST = {
    # exact brute-force top-k: 25 broadcast query vectors against the
    # corpus — the adjudicated-correct plan (the scalable path is
    # ivfpq_ann); see PLANS.md "Flagged occurrences"
    "ann_cosine_topk",
}


def test_no_cartesian_or_rowwise_python_in_any_registry_query(spark):
    from tools.explain_all import formatted_plan

    import __spark_entry__ as entry

    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_DIR)
        plan = formatted_plan(df)
        hits = [f for f in ("CartesianProduct", "BatchEvalPython") if f in plan]
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_WHITELIST:
            hits.append("BroadcastNestedLoopJoin (not whitelisted)")
        if hits:
            offenders[name] = hits
    assert not offenders, f"plan red flags: {offenders}"
