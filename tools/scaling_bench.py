"""Scaling-efficiency harness (BASELINE.json north_rule: throughput scaling
efficiency >= 0.8 between N and 4N EXECUTORS; sandbox stand-in per driver
instruction: same job + same input at two parallelism levels).

Two modes:

  executors (default, the faithful one): Spark's `local-cluster[n, 8, mem]`
  master launches n REAL separate executor JVMs with 8 cores each — the
  closest single-machine emulation of an n-executor cluster (cross-executor
  shuffles, independent block managers / GC / python worker pools). We
  compare 1 executor vs 4 executors, whole process tree pinned with taskset
  to 8 / 32 cores so "4x the cluster" really means 4x the silicon.

  cores: single-JVM local[N] at 8 vs 32 cores. NOTE: a single shared JVM
  (one block manager, one allocator, one python-runner fabric) caps
  python-heavy scaling well below what separate executors achieve — kept
  for comparison, not as the headline.

Methodology per level: materialize the pages input parquet ONCE (same input
for every level), full-size warm-up run, then interleaved quarter/full reps
taking the min of each. Reported:

    raw_pages_per_sec      = N / min(t_full)
    marginal_pages_per_sec = 0.75 * N / (min(t_full) - min(t_quarter))
                             (cancels data-independent driver fixed costs)
    efficiency             = rate_4N / (4 * rate_N)

Usage: python tools/scaling_bench.py [N_pages] [mode] — one JSON line.
"""

from __future__ import annotations

import json
import subprocess
import sys

WORKER = """
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from cmem_plugin_pyshacl_spark.session import get_spark
from cmem_plugin_pyshacl_spark.sources.pages import generate_pages
from cmem_plugin_pyshacl_spark.plans.pipeline import (
    relations_fused_stage, canonicalize_stage, triples_stage,
    unique_relations_stage)

master = sys.argv[1]
label = sys.argv[2]
n = int(sys.argv[3])
pages_path = sys.argv[4]
shuffle = int(sys.argv[5])
spark = get_spark(app_name=f"scale-{label}", master=master,
                  shuffle_partitions=shuffle)
spark.range(10000).count()

if not os.path.exists(os.path.join(pages_path, "_SUCCESS")):
    generate_pages(spark, n, num_partitions=64).write.mode("overwrite") \\
        .parquet(pages_path)
pages_all = spark.read.parquet(pages_path)

def construct(n_pages):
    pages = pages_all.filter(pages_all.id < n_pages)
    t0 = time.time()
    rel_u = unique_relations_stage(relations_fused_stage(pages)).persist()
    rel_u.count()  # build the shared cache once, like run_pipeline
    mapping = canonicalize_stage(rel_u).persist()
    t = triples_stage(rel_u, mapping, assume_unique=True).persist()
    n_triples = t.count()
    dt = time.time() - t0
    rel_u.unpersist(); mapping.unpersist(); t.unpersist()
    return dt, n_triples

reps = int(os.environ.get("SCALE_REPS", "2"))
construct(n // 4)  # warm-up (JIT, python worker pools, page cache)
t_quarter, t_full, n_triples = 1e18, 1e18, 0
for _ in range(reps):
    t_quarter = min(t_quarter, construct(n // 4)[0])
    dt, n_triples = construct(n)
    t_full = min(t_full, dt)
print("RESULT " + json.dumps({
    "label": label, "master": master, "n_pages": n,
    "t_full": round(t_full, 3), "t_quarter": round(t_quarter, 3),
    "n_triples": n_triples,
    "raw_pages_per_sec": round(n / t_full, 1),
    "marginal_pages_per_sec": round(0.75 * n / (t_full - t_quarter), 1),
}))
spark.stop()
"""


def run(master: str, label: str, cores: int, n: int, shuffle: int) -> dict:
    pages_path = f"/tmp/spark_graft_scale_pages_{n}"
    cmd = [
        "taskset", "-c", f"0-{cores - 1}", sys.executable, "-c", WORKER,
        master, label, str(n), pages_path, str(shuffle),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, timeout=1200, cwd="/root/repo"
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"worker failed ({label}):\n{out.stderr[-3000:]}")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 6_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "executors"
    if mode == "executors":
        lo = run("local-cluster[1,8,16384]", "1x8-executors", 8, n, 16)
        hi = run("local-cluster[4,8,16384]", "4x8-executors", 32, n, 64)
    elif mode == "executors2":
        # 2-core executors: total footprint 2 vs 8 cores stays below the
        # single box's DRAM-bandwidth saturation point, so this pair
        # measures the ENGINE's executor-scaling rather than the shared
        # memory bus (see BENCH.md)
        lo = run("local-cluster[1,2,8192]", "1x2-executors", 2, n, 4)
        hi = run("local-cluster[4,2,8192]", "4x2-executors", 8, n, 16)
    else:
        lo = run("local[8]", "local8", 8, n, 8)
        hi = run("local[32]", "local32", 32, n, 32)
    report = {
        "metric": f"construct_scaling_efficiency_{mode}_1_to_4",
        "unit": "ratio",
        "value": round(
            hi["marginal_pages_per_sec"] / (4 * lo["marginal_pages_per_sec"]), 3
        ),
        "raw_efficiency": round(
            hi["raw_pages_per_sec"] / (4 * lo["raw_pages_per_sec"]), 3
        ),
        "low": lo,
        "high": hi,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
