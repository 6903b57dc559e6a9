"""connected_components (public wrapper over the dedup CC loop) and
pagerank — known graphs, invariants, and a driver-side reference."""

import pytest

from conduino_spark import (
    connected_components, from_dataframe, pagerank, run_pipe, sink_df,
    source_list,
)


def test_connected_components_chain_and_islands(spark):
    # chain 1-2-3 (one component), island pair 10-11, self-contained 20
    edges = [(1, 2), (2, 3), (10, 11), (20, 20)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    out = run_pipe(from_dataframe(df) | connected_components()
                   | sink_df(), spark)
    got = {r.id: r.lbl for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_connected_components_diameter_bound_raises(spark):
    # path of length 6: min-label needs ~5 rounds; max_iters=2 must
    # raise loudly, not split the component
    edges = [(i, i + 1) for i in range(1, 7)]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        run_pipe(from_dataframe(df)
                 | connected_components(max_iters=2) | sink_df(),
                 spark).collect()


def _pagerank_ref(edges, damping=0.85, iters=10):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    rank = {v: 1.0 / n for v in nodes}
    for _ in range(iters):
        dangling = sum(r for v, r in rank.items() if v not in out)
        contrib = {v: 0.0 for v in nodes}
        for a, b in edges:
            contrib[b] += rank[a] / out[a]
        base = (1 - damping) / n + damping * dangling / n
        rank = {v: base + damping * contrib[v] for v in nodes}
    return rank


# a small directed graph with a dangling node (4 has no out-edges)
EDGES = [(1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4)]


def test_pagerank_matches_reference_and_sums_to_one(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = run_pipe(from_dataframe(df) | pagerank(iters=10) | sink_df(),
                   spark)
    got = {r.id: r.rank for r in out.collect()}
    want = _pagerank_ref(EDGES, iters=10)
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    # 4 collects from both 2 and 3 and keeps its mass (dangling) — top
    assert max(got, key=got.get) == 4


def test_pagerank_validation(spark):
    with pytest.raises(ValueError):
        pagerank(damping=1.0)
    with pytest.raises(ValueError):
        pagerank(iters=0)


def test_pagerank_from_minhash_pairs_shape(spark, sf_dir):
    # integration: rank documents by near-dup connectivity — the pair
    # stream from LSH feeds pagerank as an undirected graph
    from conduino_spark import minhash_dedup_pairs, read_table

    docs = read_table(sf_dir, "documents")
    pairs = run_pipe(docs | minhash_dedup_pairs() | sink_df(), spark)
    und = pairs.unionByName(
        pairs.selectExpr("id_b AS id_a", "id_a AS id_b"))
    out = run_pipe(
        from_dataframe(und)
        | pagerank(src="id_a", dst="id_b", iters=5, ndigits=9)
        | sink_df(), spark)
    rows = out.collect()
    assert len(rows) > 0
    assert sum(r.rank for r in rows) == pytest.approx(1.0, abs=1e-6)
