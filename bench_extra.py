"""Round-6 optimization probes — the noop-sink isolation harness behind
OPTIMIZATION_r06.md (guide §1.4). NOT the driver bench: bench.py stays the
frozen measurement; this file exists so the numbers in the report are
reproducible.

Usage:
    python bench_extra.py            # all sections at the default sizes
    SPARK_GRAFT_BENCH_DOCS=2000000 python bench_extra.py build
Sections: build, pipeline, query  (positional arg filters).

Prints one line per probe: <section>.<name> <seconds> [detail].
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from share_spark.corpus import make_queries, make_web_pages_fast  # noqa: E402
from share_spark.index.build import (  # noqa: E402
    BLOCKS_SCHEMA,
    IndexConfig,
    IndexReader,
    _make_block_encoder,
    build_index,
    build_termdoc,
)
from share_spark.query.wand import wand_topk  # noqa: E402
from share_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))


def _pages(spark):
    cache = os.path.join(REPO, ".bench_cache", f"pages_{N_DOCS}")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        pdf = make_web_pages_fast(N_DOCS, seed=42)
        spark.createDataFrame(pdf).repartition(CPUS).write.mode(
            "overwrite"
        ).parquet(cache)
    return spark.read.parquet(cache)


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _lap(section, name, fn, n=2):
    best = None
    detail = ""
    for _ in range(n):
        t0 = time.time()
        r = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
        if isinstance(r, (int, str)):
            detail = str(r)
    print(f"{section}.{name} {best:.2f} {detail}".rstrip())


def section_build(spark):
    pages = _pages(spark)
    cfg = IndexConfig(block_size=128, chunk_docs=8192, n_partitions=CPUS * 2)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None

    def full_build():
        d = tempfile.mkdtemp(prefix="bx_idx_", dir=scratch)
        t0 = time.time()
        man = build_index(spark, pages, d, cfg)
        dt = time.time() - t0
        print(f"build.stage_seconds {dt:.2f} {man['stage_seconds']}")
        shutil.rmtree(d, ignore_errors=True)

    full_build()
    full_build()  # warm

    # noop isolation of the postings chain
    docs_dir = tempfile.mkdtemp(prefix="bx_docs_", dir=scratch)
    from share_spark.index.build import build_docs

    build_docs(spark, pages, cfg.analyzer).write.mode("overwrite").parquet(
        docs_dir
    )
    docs = spark.read.parquet(docs_dir)
    window = cfg.chunk_docs * cfg.salt_chunks

    _lap("build", "tokenize_noop", lambda: _noop(build_termdoc(docs, cfg.analyzer)))
    _lap(
        "build",
        "tokenize_shuffle_sort_noop",
        lambda: _noop(
            build_termdoc(docs, cfg.analyzer)
            .repartition(
                cfg.n_partitions,
                F.xxhash64("term", (F.col("doc_id") / window).cast("long")),
            )
            .sortWithinPartitions("term", "doc_id")
        ),
    )
    _lap(
        "build",
        "full_encode_noop",
        lambda: _noop(
            build_termdoc(docs, cfg.analyzer)
            .repartition(
                cfg.n_partitions,
                F.xxhash64("term", (F.col("doc_id") / window).cast("long")),
            )
            .sortWithinPartitions("term", "doc_id")
            .mapInArrow(_make_block_encoder(cfg), schema=BLOCKS_SCHEMA)
        ),
    )
    shutil.rmtree(docs_dir, ignore_errors=True)


def section_pipeline(spark):
    from share_spark import textops

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    _lap(
        "pipeline", "minhash_lsh_md5",
        lambda: textops.minhash_lsh_pairs(docs, 16, 4).count(),
    )
    _lap(
        "pipeline", "minhash_lsh_xxhash64",
        lambda: textops.minhash_lsh_pairs(docs, 16, 4, hash_fn="xxhash64").count(),
    )
    _lap("pipeline", "simhash_sigs", lambda: textops.simhash(docs).count())
    _lap(
        "pipeline", "simhash_pairs",
        lambda: textops.simhash_pairs(docs, 32, 3).count(),
    )
    _lap("pipeline", "text_quality", lambda: textops.text_quality(docs).count())


def section_query(spark):
    cfg = IndexConfig(block_size=128, chunk_docs=8192, n_partitions=CPUS * 2)
    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    d = tempfile.mkdtemp(prefix="bx_qidx_", dir=scratch)
    build_index(spark, _pages(spark), d, cfg)
    idx = IndexReader.open(spark, d)
    queries = list(make_queries(40))
    wand_topk(idx, "data science", k=13).collect()  # warm

    def one_pass():
        lat = []
        for q in queries:
            t0 = time.time()
            wand_topk(idx, q["query_text"], k=q["k"]).collect()
            lat.append(time.time() - t0)
        lat.sort()
        return (
            f"p50={lat[len(lat) // 2]:.3f} "
            f"p95={lat[int(len(lat) * 0.95)]:.3f}"
        )

    _lap("query", "wand_pass", one_pass, n=2)
    shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    if which in ("all", "build"):
        section_build(spark)
    if which in ("all", "pipeline"):
        section_pipeline(spark)
    if which in ("all", "query"):
        section_query(spark)
    spark.stop()
