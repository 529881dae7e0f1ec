"""Physical-plan audit over every registered __spark_entry__ query.

Counts the plan shapes that matter at 100 TB — CartesianProduct,
BroadcastNestedLoopJoin, SortMergeJoin, Exchange — and flags anomalies
(any cartesian; nested-loop joins outside the documented brute-force
baseline; unusually exchange-heavy plans). Planning only: no query is
executed beyond what physical planning requires.

Usage: python tools/plan_audit.py [sf_dir]  — one JSON line per query +
a FLAGGED summary line.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

# intended nested-loop plans (documented brute-force baselines)
_BNL_ALLOWED = {"similarity_topk"}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from cmem_plugin_pyshacl_spark.session import get_spark

    spark = get_spark(app_name="plan-audit", master="local[8]", shuffle_partitions=8)
    flagged: list[dict] = []
    for name, fn in entrymod.queries().items():
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # surface, keep auditing
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            flagged.append({"query": name, "error": True})
            continue
        row = {
            "query": name,
            "exchanges": plan.count("Exchange"),
            "sort_merge_joins": plan.count("SortMergeJoin"),
            "cartesian": plan.count("CartesianProduct"),
            "nested_loop": plan.count("BroadcastNestedLoopJoin"),
        }
        print(json.dumps(row))
        if row["cartesian"] or (row["nested_loop"] and name not in _BNL_ALLOWED):
            flagged.append(row)
    print(json.dumps({"flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
