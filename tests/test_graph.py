"""PageRank invariants on graphs whose exact answers are known."""

from __future__ import annotations

from weather4cast_bigdata_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_cycle_is_uniform(spark):
    """On a directed cycle every node is symmetric: rank = 1/n
    exactly, at any damping, from the first iteration."""
    n = 5
    got = _ranks(spark, [(i, (i + 1) % n) for i in range(n)])
    assert all(abs(v - 1.0 / n) < 1e-6 for v in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_star_center_dominates_and_mass_conserved(spark):
    """Leaves all point at a center: the center collects damped mass;
    the dangling center redistributes uniformly, so total rank stays
    1 despite the sink."""
    got = _ranks(spark, [(i, 0) for i in range(1, 6)])
    assert abs(sum(got.values()) - 1.0) < 1e-4
    assert all(got[0] > got[i] for i in range(1, 6))
    # leaves are symmetric
    leaf_vals = {got[i] for i in range(1, 6)}
    assert len(leaf_vals) == 1


def test_chain_with_dangling_sink_conserves_mass(spark):
    got = _ranks(spark, [(1, 2), (2, 3)], iters=15)
    assert abs(sum(got.values()) - 1.0) < 1e-4
    # downstream accumulates: 3 > 2 > 1
    assert got[3] > got[2] > got[1]


def test_parallel_edges_collapse(spark):
    """A duplicated edge must not double the contribution."""
    a = _ranks(spark, [(1, 2), (1, 2), (2, 1)])
    b = _ranks(spark, [(1, 2), (2, 1)])
    assert a == b


def test_deterministic_across_runs(spark):
    edges = [(i, (i * 7) % 23) for i in range(60)]
    assert _ranks(spark, edges) == _ranks(spark, edges)


# --- triangle census ---------------------------------------------------------


def _tri(spark, edges):
    from weather4cast_bigdata_spark.operators.graph import triangle_stats

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return triangle_stats(df).collect()[0]


def test_triangle_counts_k4_plus_pendant(spark):
    """K4 (4 triangles, 12 wedges) plus a pendant edge off node 1
    (adds 3 wedges, no triangle): the census must count each triangle
    once despite the degree-oriented rewrite."""
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    r = _tri(spark, k4 + [(1, 5)])
    assert r["n_edges"] == 7
    assert r["n_triangles"] == 4
    assert r["n_wedges"] == 12 + 3
    assert abs(r["clustering_coeff"] - round(12 / 15 + 1e-9, 6)) < 1e-9


def test_triangle_hub_skew_and_duplicates(spark):
    """A star graph (max-degree hub) has zero triangles no matter how
    its wedges pivot; duplicate edges must not inflate any count."""
    star = [(0, i) for i in range(1, 30)]
    r = _tri(spark, star + star[:10])
    assert r["n_edges"] == 29 and r["n_triangles"] == 0
    assert r["n_wedges"] == 29 * 28 // 2
    assert r["clustering_coeff"] == 0.0
    # closing one spoke pair creates exactly one triangle
    r2 = _tri(spark, star + [(1, 2)])
    assert r2["n_triangles"] == 1


def test_triangle_census_matches_bruteforce_random(spark):
    """Three seeded random graphs: the degree-oriented census must
    equal a plain Python adjacency count of edges/wedges/triangles."""
    import itertools
    import random

    from weather4cast_bigdata_spark.operators.graph import triangle_stats

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        edges = set()
        for _ in range(60):
            a, b = rng.randrange(18), rng.randrange(18)
            if a != b:
                edges.add((min(a, b), max(a, b)))
        adj = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        tri = sum(
            1
            for a, b, c in itertools.combinations(sorted(adj), 3)
            if b in adj[a] and c in adj[a] and c in adj[b]
        )
        wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
        df = spark.createDataFrame(sorted(edges), "id_a long, id_b long")
        r = triangle_stats(df).collect()[0]
        assert r["n_edges"] == len(edges), seed
        assert r["n_wedges"] == wedges, seed
        assert r["n_triangles"] == tri, seed
