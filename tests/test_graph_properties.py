"""Property-based invariants (hypothesis) for the graph operators added in
round 8: for ARBITRARY small graphs — not just the handcrafted topologies —
the distributed algorithms must equal trivial pure-Python references:

* connected_components_altstar == union-find (the alternating-star rounds
  are an optimization of WORK; the fixed point must be topology-blind);
* triangle_counts == brute-force enumeration (degree orientation must be
  result-preserving on every graph, including multi-edges fed as
  duplicate pairs, self-loop-free by construction).

Few examples, deliberately: each example runs real Spark jobs. Hypothesis
earns its keep here by exploring edge shapes (stars, parallel edges,
disconnected singletons) no hand-written case covers.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings, strategies as st


edge = st.tuples(st.integers(0, 13), st.integers(0, 13))
edge_lists = st.lists(edge, min_size=1, max_size=28)


def _uf_components(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in nodes}


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edge_lists)
def test_altstar_equals_union_find_on_random_graphs(spark, raw):
    from crdb_changefeed_publisher_spark.operators.dedup import (
        connected_components_altstar,
    )

    edges = [(a, b) for a, b in raw if a != b]
    nodes = sorted({n for e in raw for n in e})
    pairs = spark.createDataFrame(
        edges or [(99, 99)], "doc_a long, doc_b long"  # all-self-loop corner
    )
    nodes_df = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        int(r.doc_id): int(r.cluster_id)
        for r in connected_components_altstar(pairs, nodes_df).collect()
    }
    assert got == _uf_components(edges, nodes)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(edge_lists)
def test_triangle_counts_equal_bruteforce_on_random_graphs(spark, raw):
    from itertools import combinations

    from crdb_changefeed_publisher_spark.operators.graph import triangle_counts

    canon = {(min(a, b), max(a, b)) for a, b in raw if a != b}
    nodes = sorted({n for e in canon for n in e})
    want: dict[int, int] = {}
    for x, y, z in combinations(nodes, 3):
        if {(x, y), (x, z), (y, z)} <= canon:
            for n in (x, y, z):
                want[n] = want.get(n, 0) + 1
    pairs = spark.createDataFrame(
        list(raw) or [(0, 0)], "doc_a long, doc_b long"
    )
    got = {
        int(r.node): int(r.n_triangles) for r in triangle_counts(pairs).collect()
    }
    assert got == want
