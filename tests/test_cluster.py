"""Connected components vs a union-find oracle (random graphs +
adversarial chains), and the duplicate_clusters keep-one policy."""

import numpy as np
import pyspark.sql.functions as F

from coffea_spark.llmdata.cluster import connected_components, duplicate_clusters


def _check(spark, edges, n_nodes):
    df = spark.createDataFrame([(int(u), int(v)) for u, v in edges], "src long, dst long")
    got = {r["node"]: r["component"] for r in connected_components(df).collect()}
    # oracle min-root per node, restricted to nodes with edges
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for u, v in edges:
        touched.update((u, v))
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    want = {x: find(x) for x in touched}
    assert got == want, (sorted(got.items())[:5], sorted(want.items())[:5])


def test_cc_random_graph(spark):
    rng = np.random.default_rng(23)
    n = 300
    edges = [(int(a), int(b)) for a, b in rng.integers(0, n, (400, 2)) if a != b]
    _check(spark, edges, n)


def test_cc_long_chain_and_star(spark):
    # a 120-hop chain: converges only if pointer doubling works (plain
    # one-hop propagation would need 120 rounds > max_iter)
    chain = [(i, i + 1) for i in range(120)]
    star = [(500, 500 + i) for i in range(1, 30)]
    _check(spark, chain + star, 600)


def test_cc_two_cliques_bridge(spark):
    k1 = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    k2 = [(100 + i, 100 + j) for i in range(10) for j in range(i + 1, 10)]
    _check(spark, k1 + k2, 200)
    _check(spark, k1 + k2 + [(5, 105)], 200)


def test_duplicate_clusters_keep_one(spark):
    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in range(8)], "doc_id long, text string"
    )
    edges = spark.createDataFrame([(0, 1), (1, 2), (5, 6)], "src long, dst long")
    out = duplicate_clusters(docs, edges)
    m = {r["doc_id"]: r["cluster"] for r in out.collect()}
    assert m == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7}
    kept = out.where(F.col("doc_id") == F.col("cluster")).count()
    assert kept == 5  # 8 docs - 3 absorbed duplicates


def _np_pagerank(edges, n, iterations, d=0.85):
    """Independent dense power iteration (matches Page et al. with
    uniform teleport + uniform dangling redistribution)."""
    import collections

    w = collections.Counter(edges)
    deg = collections.Counter()
    for (u, v), m in w.items():
        deg[u] += m
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        dangling = sum(r[u] for u in range(n) if deg[u] == 0)
        s = np.zeros(n)
        for (u, v), m in w.items():
            s[v] += (m / deg[u]) * r[u]
        r = (1.0 - d) / n + d * (s + dangling / n)
    return r


def test_pagerank_matches_power_iteration(spark):
    from coffea_spark.llmdata.cluster import pagerank

    # real-data-derived deterministic graph over 23 nodes, with
    # dangling nodes (src % 5 == 0 emits no out-links) and parallel edges
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    e = (
        docs.select(
            (F.col("doc_id") % 23).alias("src"),
            ((F.col("doc_id") * 31 + 7) % 23).alias("dst"),
        )
        .where((F.col("src") % 5 != 0) & (F.col("src") != F.col("dst")))
    )
    got = {r["node"]: r["rank"] for r in pagerank(e, iterations=4).collect()}
    pairs = [(r["src"], r["dst"]) for r in e.collect()]
    nodes = sorted({u for p in pairs for u in p})
    idx = {u: i for i, u in enumerate(nodes)}
    want = _np_pagerank([(idx[u], idx[v]) for u, v in pairs], len(nodes), 4)
    assert set(got) == set(nodes)
    for u in nodes:
        assert abs(got[u] - want[idx[u]]) < 1e-12, (u, got[u], want[idx[u]])
    assert abs(sum(got.values()) - 1.0) < 1e-9  # mass conservation


def test_pagerank_edge_cases(spark):
    import pytest

    from coffea_spark.llmdata.cluster import pagerank

    e = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    # damping 0 -> uniform regardless of structure
    out = {r["node"]: r["rank"] for r in pagerank(e, iterations=3, damping=0.0).collect()}
    assert out == {0: 0.5, 1: 0.5}
    # zero iterations -> uniform prior
    out0 = {r["node"]: r["rank"] for r in pagerank(e, iterations=0).collect()}
    assert out0 == {0: 0.5, 1: 0.5}
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping=1.5)
    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, iterations=2).count() == 0
