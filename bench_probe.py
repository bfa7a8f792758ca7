"""Ad-hoc r6 profiling probes (guide §1): isolate per-piece costs with the
noop sink / bounded collects. NOT a driver artifact — bench.py stays frozen.

Usage: python bench_probe.py <probe> [...]
Probes: query, valuesearch, minhash, build, compact
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from share_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "200000"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _pages(spark):
    cache = os.path.join(REPO, ".bench_cache", f"pages_{N_DOCS}")
    return spark.read.parquet(cache)


def _build(spark, pages):
    from share_spark.index.build import IndexConfig, build_index

    scratch = "/dev/shm" if os.path.isdir("/dev/shm") else None
    idx_dir = tempfile.mkdtemp(prefix="probe_idx_", dir=scratch)
    t0 = time.time()
    build_index(
        spark, pages, idx_dir,
        IndexConfig(block_size=128, chunk_docs=8192, n_partitions=CPUS * 2),
    )
    print(f"build: {time.time()-t0:.2f}s -> {idx_dir}")
    return idx_dir


def probe_query(spark):
    from share_spark.corpus import make_queries
    from share_spark.index.build import IndexReader
    from share_spark.query.wand import wand_topk

    pages = _pages(spark)
    idx_dir = _build(spark, pages)
    idx = IndexReader.open(spark, idx_dir)
    queries = list(make_queries(40))
    wand_topk(idx, "data science", k=13).collect()
    # per-query wall, two passes
    for p in range(3):
        lats = []
        for q in queries:
            t0 = time.time()
            wand_topk(idx, q["query_text"], k=q["k"]).collect()
            lats.append(time.time() - t0)
        lats.sort()
        print(
            f"pass{p}: p50={lats[len(lats)//2]:.3f} "
            f"p95={lats[int(len(lats)*0.95)]:.3f} "
            f"min={lats[0]:.3f} max={lats[-1]:.3f} "
            f"sum={sum(lats):.1f}"
        )


def probe_valuesearch(spark):
    from share_spark.queries import QUERIES

    q = QUERIES["valuesearch_full_engine"]
    q(spark, SF_DIR).collect()  # warm
    for i in range(4):
        t0 = time.time()
        q(spark, SF_DIR).collect()
        print(f"valuesearch_full_engine[{i}]: {time.time()-t0:.3f}s")


def probe_minhash(spark):
    from share_spark import textops

    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    n = docs.count()
    toks = textops.token_set(docs)
    nt = toks.count()
    nv = toks.select("token").distinct().count()
    print(f"docs={n} token_rows={nt} vocab={nv}")
    for fn in ("md5", "xxhash64"):
        for i in range(3):
            t0 = time.time()
            c = textops.minhash_lsh_pairs(docs, hash_fn=fn).count()
            print(f"minhash_lsh_pairs[{fn}][{i}]: {time.time()-t0:.3f}s pairs={c}")
    # signature aggregation alone
    for fn in ("md5", "xxhash64"):
        for i in range(2):
            t0 = time.time()
            _noop(textops.minhash_signatures_wide(docs, 16, hash_fn=fn))
            print(f"sig_wide[{fn}][{i}]: {time.time()-t0:.3f}s")


def probe_compact(spark):
    from share_spark.index.build import IndexReader
    from share_spark.streaming.incremental import apply_incremental, compact

    pages = _pages(spark)
    idx_dir = _build(spark, pages)
    changed = pages.filter(F.col("doc_id") % 20 == 0)
    t0 = time.time()
    apply_incremental(spark, idx_dir, changed)
    print(f"ingest: {time.time()-t0:.2f}s")
    t0 = time.time()
    compact(spark, idx_dir, mode="merge")
    print(f"compact_merge: {time.time()-t0:.2f}s")
    IndexReader.open(spark, idx_dir)




def probe_vsphases(spark):
    from share_spark.queries import (
        _derived_doc_values, _derived_value_meta, _indexed, _t,
    )
    from share_spark.query.params import compile_valuesearch, parse_valuesearch

    idx = _indexed(spark, SF_DIR)
    docs = _t(spark, SF_DIR, "documents")
    params = parse_valuesearch(
        "valueSearchPropertyPath=%5B%22dcterms%3Asubject%22%5D"
        "&valueSearchFilter[%5B%22rdf%3Atype%22%5D][any-of]="
        "%3A%2F%2Ftypes.example%2FConcept"
        "&valueSearchText=subject+title"
        "&cardSearchFilter[%5B%22dcterms%3Acreated%22%5D][after]=1995"
        "&page[size]=10"
    )
    # warm
    dv = _derived_doc_values(docs)
    vm = _derived_value_meta(docs)
    compile_valuesearch(params, idx, dv, value_type="iri", value_meta=vm).collect()

    import share_spark.query.valuesearch as vs
    from share_spark.query.filters import apply_filters

    for i in range(3):
        t0 = time.time()
        dv = _derived_doc_values(docs)
        vm = _derived_value_meta(docs)
        t1 = time.time()
        # replicate value_counts pieces with timing
        rows = dv.filter(
            F.col("path_key").isin(['["dcterms:subject"]'])
            & F.col("iri_value").isNotNull()
        )
        # card filter: date after 1995 -> apply_filters on docs
        from share_spark.query.params import parse_valuesearch as _p

        # use compile path for card docs: cheat - just time whole compile
        out = compile_valuesearch(params, idx, dv, value_type="iri", value_meta=vm)
        t2 = time.time()
        out.collect()
        t3 = time.time()
        print(
            f"[{i}] derive_plan={t1-t0:.3f} compile_plan={t2-t1:.3f} "
            f"exec={t3-t2:.3f}"
        )


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "query"
    spark = get_spark("probe", cores=CPUS, shuffle_partitions=CPUS)
    globals()[f"probe_{which}"](spark)
    spark.stop()
