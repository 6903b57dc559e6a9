"""Round-15 optimization-session laws: the batched driver-sync CC
loop (connected components).

The r15 round-2 change runs TWO propagation rounds per
driver-synchronous convergence action (guide §2.4/§5.4 — the loop is
gap-bound).  These laws pin that batching never changes what the loop
RETURNS: labels equal the per-round formulation on graphs whose depth
is odd, even, and exactly at the batch boundary, and genuine
non-convergence still raises.  (The same batching was A/B-tested on
k_core and REJECTED — see OPTIMIZATION_r15.md.)
"""

import pytest

from conduino_spark.operators.dedup import _cc_min_label


def _chain_pairs(spark, n):
    # path graph 1-2-...-n: label 1 needs n-1 propagation rounds to
    # reach node n, so n toggles odd/even round parity at will
    return spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "id_a long, id_b long")


# --- connected components: batched rounds -----------------------------------

@pytest.mark.parametrize("n", [2, 3, 6, 7])
def test_cc_batched_rounds_chain_all_parities(spark, n):
    labels = {r.id: r.lbl
              for r in _cc_min_label(_chain_pairs(spark, n)).collect()}
    assert labels == {i: 1 for i in range(1, n + 1)}


def test_cc_batched_two_components(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (11, 12), (12, 13)],
        "id_a long, id_b long")
    labels = {r.id: r.lbl for r in _cc_min_label(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10}


def test_cc_nonconvergence_still_raises_batched(spark):
    # diameter 7 >> max_iters=1 (+2 budget rounds): must still raise
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc_min_label(_chain_pairs(spark, 8), max_iters=1).collect()


def test_cc_converges_exactly_at_bound(spark):
    # chain of 6 needs 5 label-changing rounds; max_iters=5 must
    # converge (the old per-round loop converged here too — the +2
    # budget pays for the batched confirming check)
    labels = _cc_min_label(_chain_pairs(spark, 6), max_iters=5)
    assert {r.lbl for r in labels.collect()} == {1}


# --- k-core: depth parities (regression guard for the A/B-rejected
# batched-peel variant — these pin the per-peel loop's returns) -------------

def _kcore_ids(spark, edges, k, **kw):
    from conduino_spark import k_core
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.id for r in k_core(k, **kw)(df).collect()}


def test_k_core_triangle_with_tails(spark):
    # two tail peels (depth 2) then fixpoint: triangle survives
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)]
    assert _kcore_ids(spark, edges, 2) == {1, 2, 3}


def test_k_core_odd_depth(spark):
    # depth 3 (odd): a chain hung off a triangle peels 3 rounds
    # before the triangle is bare
    edges = [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5), (5, 6)]
    assert _kcore_ids(spark, edges, 2) == {1, 2, 3}
