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
