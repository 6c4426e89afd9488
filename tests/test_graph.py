"""Connected components (operators/graph.py): the near-dup cluster step."""

import pytest
from pyspark.sql import functions as F

from kafka_cdc_hudi_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _cc(spark, pairs, algo=connected_components, **kw):
    df = spark.createDataFrame(pairs, "src long, dst long")
    return {r["node"]: r["component"] for r in algo(df, **kw).collect()}


def test_two_components_and_chain(spark):
    # component {1,2,3} via chain, component {10,11} — direction mixed
    got = _cc(spark, [(2, 1), (2, 3), (11, 10)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    n = 12
    got = _cc(spark, [(i, i + 1) for i in range(n)])
    assert set(got.values()) == {0}
    assert len(got) == n + 1


def test_triangle_plus_bridge(spark):
    got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 8)])
    assert got == {5: 5, 6: 5, 7: 5, 8: 5}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, [(i, i + 1) for i in range(8)], max_iter=2)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min member of each component
    comp = {}
    for n in list(parent):
        comp[n] = find(n)
    return comp


def test_random_graphs_match_union_find(spark):
    """Seeded random graphs: distributed propagation == driver union-find."""
    import random

    rng = random.Random(42)
    for trial in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        got = _cc(spark, edges)
        exp = _union_find(edges)
        assert got == exp, f"trial {trial}"


def test_star_variant_matches_union_find(spark):
    """large-star/small-star: same answers on random graphs AND on a chain
    long enough that plain propagation would need diameter rounds."""
    import random

    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(25)]
    edges = [(a, b) for a, b in edges if a != b]
    assert _cc(spark, edges, algo=connected_components_star) == _union_find(edges)

    chain = [(i, i + 1) for i in range(30)]
    got = _cc(spark, chain, algo=connected_components_star, max_iter=10)
    assert set(got.values()) == {0} and len(got) == 31


def test_cluster_query_canonical_assignment(spark):
    """dedup_clusters: every pair member shares a cluster; canonical is the
    min doc_id; singletons map to themselves."""
    from kafka_cdc_hudi_spark.plans.catalog_text import dedup_clusters, dedup_minhash_lsh

    from .conftest import SF_DIR

    pairs = dedup_minhash_lsh(spark, SF_DIR).collect()
    clusters = {r["doc_id"]: r["cluster_id"] for r in dedup_clusters(spark, SF_DIR).collect()}
    assert pairs, "fixture must produce near-dup pairs"
    for p in pairs:
        assert clusters[p["doc_a"]] == clusters[p["doc_b"]]
        assert clusters[p["doc_a"]] <= min(p["doc_a"], p["doc_b"])
    in_pairs = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    singles = [d for d, c in clusters.items() if d not in in_pairs]
    assert all(clusters[d] == d for d in singles)


class TestPagerankInt:
    def test_star_hub_outranks_leaves(self, spark):
        from kafka_cdc_hudi_spark.operators.graph import pagerank_int

        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 6)], "a long, b long"
        )
        r = {row.node: row.rank_ppb for row in pagerank_int(edges).collect()}
        assert all(r[0] > r[i] for i in range(1, 6)), r
        leaf_ranks = {r[i] for i in range(1, 6)}
        assert len(leaf_ranks) == 1, "symmetric leaves must tie exactly"

    def test_ring_is_uniform(self, spark):
        from kafka_cdc_hudi_spark.operators.graph import pagerank_int

        n = 6
        edges = spark.createDataFrame(
            [(i, (i + 1) % n) for i in range(n)], "a long, b long"
        )
        ranks = {row.rank_ppb for row in pagerank_int(edges).collect()}
        assert len(ranks) == 1, "ring symmetry broken"

    def test_deterministic_across_runs(self, spark):
        from kafka_cdc_hudi_spark.operators.graph import pagerank_int

        edges = spark.createDataFrame(
            [(0, 1), (1, 2), (2, 3), (0, 3), (3, 4)], "a long, b long"
        )
        a = sorted((r.node, r.rank_ppb) for r in pagerank_int(edges).collect())
        b = sorted((r.node, r.rank_ppb) for r in pagerank_int(edges).collect())
        assert a == b


def test_count_triangles_reversed_duplicate_edges(spark):
    """ADVICE r8: a non-canonical edge list containing both (a,b) and
    (b,a) must count each triangle once — least/greatest canonicalization
    collapses reversed duplicates before orientation."""
    from kafka_cdc_hudi_spark.operators.graph import count_triangles

    tri = [(1, 2), (2, 3), (3, 1)]
    canonical = spark.createDataFrame(tri, "doc_a long, doc_b long")
    doubled = spark.createDataFrame(
        tri + [(b, a) for a, b in tri], "doc_a long, doc_b long"
    )
    want = {(r["node"], r["n_triangles"]) for r in count_triangles(canonical).collect()}
    got = {(r["node"], r["n_triangles"]) for r in count_triangles(doubled).collect()}
    assert want == {(1, 1), (2, 1), (3, 1)}
    assert got == want
