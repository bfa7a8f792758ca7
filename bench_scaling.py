"""Scaling-efficiency evidence for BASELINE.json north_rule.

The rule requires >=0.8 throughput scaling efficiency going N -> 4N
executors. No real cluster exists in this sandbox, so (per driver
instruction) the SAME job runs at two parallelism levels — local[8] and
local[32] — on identical cached input, in separate JVMs (subprocesses), and
efficiency = (t_N / t_4N) / 4.

Writes BENCH.md with the measured table. Run:  python bench_scaling.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))

CHILD = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, %(repo)r)
from share_spark.session import get_spark
from share_spark.corpus import make_queries
from share_spark.index.build import IndexConfig, IndexReader, build_index
from share_spark.query.wand import wand_topk

cpus = int(sys.argv[1])
cache = sys.argv[2]
spark = get_spark("scaling_%%d" %% cpus, cores=cpus, shuffle_partitions=cpus)
pages = spark.read.parquet(cache)

idx_dir = tempfile.mkdtemp(prefix="scale_idx_")
t0 = time.time()
m = build_index(spark, pages, idx_dir,
                IndexConfig(block_size=128, chunk_docs=8192, n_partitions=cpus))
build_s = time.time() - t0

idx = IndexReader.open(spark, idx_dir)
wand_topk(idx, "data science", k=13).collect()  # warmup
qs = [q for q in make_queries(30) if '"' not in q["query_text"]]
t0 = time.time()
for q in qs:
    wand_topk(idx, q["query_text"], k=q["k"]).collect()
query_s = time.time() - t0

print("RESULT " + json.dumps({
    "cpus": cpus,
    "build_s": round(build_s, 2),
    "docs_per_sec": round(m["n_docs"] / build_s, 1),
    "query_batch_s": round(query_s, 2),
    "queries_per_sec": round(len(qs) / query_s, 2),
}))
import shutil; shutil.rmtree(idx_dir, ignore_errors=True)
""" % {"repo": REPO}


def _ensure_corpus() -> str:
    cache = os.path.join(REPO, ".bench_cache", f"pages_{N_DOCS}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        from share_spark.corpus import make_web_pages_fast
        from share_spark.session import get_spark

        spark = get_spark("gen", cores=8)
        spark.createDataFrame(make_web_pages_fast(N_DOCS, seed=42)).repartition(
            32
        ).write.mode("overwrite").parquet(cache)
        spark.stop()
    return cache


def _run(cpus: int, cache: str) -> dict:
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", CHILD, str(cpus), cache],
        capture_output=True, text=True, env=env, timeout=1800,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from local[{cpus}]:\n{out.stderr[-3000:]}")


def main() -> None:
    cache = _ensure_corpus()
    r8 = _run(8, cache)
    r32 = _run(32, cache)
    build_speedup = r8["build_s"] / r32["build_s"]
    build_eff = build_speedup / 4.0
    q_speedup = r8["query_batch_s"] / r32["query_batch_s"]
    q_eff = q_speedup / 4.0
    report = {
        "n_docs": N_DOCS,
        "local8": r8,
        "local32": r32,
        "build_speedup_8_to_32": round(build_speedup, 3),
        "build_scaling_efficiency": round(build_eff, 3),
        "query_speedup_8_to_32": round(q_speedup, 3),
        "query_scaling_efficiency": round(q_eff, 3),
    }
    print(json.dumps(report, indent=1))
    with open(os.path.join(REPO, "BENCH.md"), "w") as f:
        f.write(
            "# BENCH — measured performance (this sandbox)\n\n"
            "North-rule scaling evidence: the same index-build + query job at two\n"
            "parallelism levels (separate JVMs) on identical cached input\n"
            f"({N_DOCS:,} synthetic web pages, input_hint shape, seed 42).\n"
            "Efficiency = (t_N / t_4N) / 4.\n\n"
            "| metric | local[8] | local[32] | speedup | efficiency |\n"
            "|---|---|---|---|---|\n"
            f"| index build (s) | {r8['build_s']} | {r32['build_s']} | "
            f"{build_speedup:.2f}x | **{build_eff:.2f}** |\n"
            f"| build docs/sec | {r8['docs_per_sec']} | {r32['docs_per_sec']} | — | — |\n"
            f"| 30-query batch (s) | {r8['query_batch_s']} | {r32['query_batch_s']} | "
            f"{q_speedup:.2f}x | {q_eff:.2f} |\n\n"
            "Raw JSON:\n\n```json\n" + json.dumps(report, indent=1) + "\n```\n\n"
            "Notes\n-----\n"
            "- The build job is the throughput metric of BASELINE.json; its\n"
            "  stages (extract/tokenize mapInPandas, groupBy(term) partial agg,\n"
            "  repartitionByRange + sort + block encode) all scale with cores;\n"
            "  local-mode parquet IO and the driver-side manifest jobs are the\n"
            "  non-scaling residue.\n"
            "- Query latency is dominated by fixed Spark job scheduling (~0.3 s\n"
            "  per job), not data volume, at this corpus size — per-query\n"
            "  latency is the BASELINE p95 metric, reported by bench.py.\n"
        )
    print("wrote BENCH.md")


if __name__ == "__main__":
    main()
