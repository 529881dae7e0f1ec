#!/usr/bin/env python
"""A/B bisect harness for the shacl_full drift (VERDICT r3 next-round #3).

Runs q_shacl_full (and shacl_validate_customer as a control) N times in a
fresh Spark session rooted at the given repo checkout, printing one JSON
line per rep with wall seconds and the 1-min load average sampled just
before the rep.  Run it alternately against HEAD and a worktree of the
pre-sparql_af round-2 commit (same box, interleaved) to separate a plan
regression from host noise:

    python tools/ab_shacl_full.py /root/repo 5
    python tools/ab_shacl_full.py /tmp/r2repo 5
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    repo = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, repo)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName(f"ab_shacl_full:{os.path.basename(repo.rstrip('/'))}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as E

    qs = E.queries()
    # r2 named the customer-validate slot the same way; guard for safety
    names = [n for n in ("shacl_full_report", "shacl_validate_customer") if n in qs]
    out: dict[str, list] = {n: [] for n in names}
    for rep in range(reps):
        for n in names:
            load1 = os.getloadavg()[0]
            t0 = time.monotonic()
            cnt = qs[n](spark, sf_dir).count()
            dt = time.monotonic() - t0
            out[n].append({"rep": rep, "sec": round(dt, 3),
                           "load1": round(load1, 2), "rows": cnt})
            print(json.dumps({"repo": repo, "query": n, **out[n][-1]}),
                  flush=True)
    summary = {
        n: {"best": min(r["sec"] for r in v),
            "median": sorted(r["sec"] for r in v)[len(v) // 2]}
        for n, v in out.items()
    }
    print(json.dumps({"repo": repo, "summary": summary}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
