"""Connected components + canonical selection (share_spark/graph.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from share_spark.graph import canonical_docs, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    rows = connected_components(df).collect()
    return {r.doc_id: r.cluster_id for r in rows}


def test_two_components_and_direction_independence(spark):
    # {1,2,3} (undirected, given in mixed direction) and {10,11}
    labels = _cc(spark, [(2, 1), (2, 3), (11, 10)])
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges_via_pointer_jumping(spark):
    # a 64-node chain: naive propagation needs 63 rounds; path doubling
    # must close it within the max_iter=40 budget (O(log n) rounds)
    n = 64
    edges = [(i, i + 1) for i in range(n - 1)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {0}
    assert len(labels) == n


def test_cluster_id_is_min_reachable(spark):
    labels = _cc(spark, [(9, 5), (5, 7), (7, 3), (100, 101)])
    assert labels[9] == 3 and labels[5] == 3 and labels[3] == 3
    assert labels[100] == 100


def test_self_loops_and_duplicate_edges_ignored(spark):
    labels = _cc(spark, [(4, 4), (4, 6), (6, 4), (4, 6)])
    assert labels == {4: 4, 6: 4}


def test_canonical_prefers_quality_then_min_id(spark):
    docs = spark.createDataFrame(
        [(1, 10), (2, 99), (3, 99), (4, 5), (9, 1)],
        "doc_id long, quality long",
    )
    clusters = connected_components(
        spark.createDataFrame([(1, 2), (2, 3)], "doc_a long, doc_b long")
    )
    out = canonical_docs(docs, clusters, prefer_col="quality").collect()
    by_id = {r.doc_id: r for r in out}
    # cluster {1,2,3}: 2 and 3 tie on quality 99 -> min doc_id (2) wins
    assert by_id[2].keep and not by_id[1].keep and not by_id[3].keep
    assert by_id[1].cluster_id == 1 and by_id[3].cluster_id == 1
    # 4 and 9 are singletons: keep themselves, cluster of their own id
    assert by_id[4].keep and by_id[4].cluster_id == 4
    assert by_id[9].keep and by_id[9].cluster_id == 9


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs (mixed components, chains, cliques, isolates-
    in-edges) vs a plain union-find reference."""
    import numpy as np

    def uf_labels(edges):
        parent: dict[int, int] = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {v: find(v) for v in parent}

    rng = np.random.default_rng(7)
    for trial in range(4):
        n = int(rng.integers(20, 120))
        m = int(rng.integers(n // 2, n * 2))
        edges = [
            (int(rng.integers(0, n)), int(rng.integers(0, n)))
            for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            continue
        got = _cc(spark, edges)
        want = uf_labels(edges)
        assert got == want, f"trial {trial}: mismatch"


def test_canonical_without_prefer_uses_min_id(spark):
    docs = spark.createDataFrame([(7,), (8,), (9,)], "doc_id long")
    clusters = connected_components(
        spark.createDataFrame([(8, 9)], "doc_a long, doc_b long")
    )
    out = {r.doc_id: r for r in canonical_docs(docs, clusters).collect()}
    assert out[8].keep and not out[9].keep and out[7].keep


def test_canonical_string_ids_and_null_prefs(spark):
    """String doc ids must work (no numeric-negation tie-break), and a
    cluster whose preferences are ALL null still elects min-id winner."""
    docs = spark.createDataFrame(
        [("b", 10), ("a", 10), ("c", 99), ("x", None), ("y", None)],
        "doc_id string, quality long",
    )
    clusters = connected_components(
        spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], "doc_a string, doc_b string"
        )
    )
    out = {r.doc_id: r for r in canonical_docs(
        docs, clusters, prefer_col="quality"
    ).collect()}
    # cluster {a,b,c}: c wins on quality 99
    assert out["c"].keep and not out["a"].keep and not out["b"].keep
    assert out["a"].cluster_id == "a"
    # cluster {x,y}: all-null prefs -> min id "x" wins
    assert out["x"].keep and not out["y"].keep


def test_canonical_mixed_null_pref_loses(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, 5)], "doc_id long, quality long"
    )
    clusters = connected_components(
        spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    )
    out = {r.doc_id: r for r in canonical_docs(
        docs, clusters, prefer_col="quality"
    ).collect()}
    assert out[2].keep and not out[1].keep
