"""Property-based law tests (SURVEY §5 strategy: reference semantics as
executable oracles).

The chunked two-phase plans (scan/pairs/consecutive) were rewritten in
r2 around deterministic bucket chunk ids — these properties pin their
semantics against pure-Python references under random inputs, chunk
counts, and __seq gap regimes (dense counters vs mono-id-style blocks).
"""

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from conduino_spark import (
    SEQ, Stage, consecutive, pairs, run_pipe, scan, sink_list, source_list,
)


def _shift(bits):
    return Stage(lambda df: df.withColumn(SEQ, F.col(SEQ) * (1 << bits)),
                 name=f"shift{bits}")


LAW_SETTINGS = dict(max_examples=8, deadline=None,
                    suppress_health_check=[HealthCheck.function_scoped_fixture])


@settings(**LAW_SETTINGS)
@given(xs=st.lists(st.integers(min_value=-50, max_value=50), max_size=20),
       npart=st.integers(min_value=1, max_value=6),
       bits=st.sampled_from([0, 20, 33]),
       rescan=st.booleans())
def test_scan_sum_law(spark, xs, npart, bits, rescan):
    got = run_pipe(source_list(xs) | _shift(bits)
                   | scan("sum", npart=npart, rescan=rescan)
                   | sink_list(), spark)
    acc, want = 0, []
    for x in xs:
        acc += x
        want.append(acc)
    assert got == want


@settings(**LAW_SETTINGS)
@given(xs=st.lists(st.integers(min_value=-50, max_value=50), max_size=20),
       npart=st.integers(min_value=1, max_value=6),
       bits=st.sampled_from([0, 33]),
       rescan=st.booleans())
def test_pairs_law(spark, xs, npart, bits, rescan):
    got = run_pipe(source_list(xs) | _shift(bits)
                   | pairs(npart=npart, rescan=rescan)
                   | sink_list(), spark)
    assert got == list(zip(xs, xs[1:]))


@settings(**LAW_SETTINGS)
@given(xs=st.lists(st.integers(min_value=-50, max_value=50), max_size=16),
       n=st.integers(min_value=1, max_value=5),
       npart=st.integers(min_value=1, max_value=6),
       bits=st.sampled_from([0, 33]),
       rescan=st.booleans())
def test_consecutive_law(spark, xs, n, npart, bits, rescan):
    got = run_pipe(source_list(xs) | _shift(bits)
                   | consecutive(n, npart=npart, rescan=rescan)
                   | sink_list(), spark)
    want = [xs[max(0, i - n):i] for i in range(len(xs))]
    want.append(xs[-n:] if xs else [])
    assert got == want


@settings(**LAW_SETTINGS)
@given(lts=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 100)),
                    max_size=15),
       rts=st.sets(st.tuples(st.integers(0, 3), st.integers(0, 100)),
                   max_size=15),
       direction=st.sampled_from(["backward", "forward"]))
def test_asof_join_law(spark, lts, rts, direction):
    from conduino_spark import asof_join, from_dataframe
    left = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(lts)] or [(0, 0, 0)][:0],
        "k long, t long, lid long")
    right = spark.createDataFrame(
        [(k, t, k * 1000 + t) for k, t in rts] or [(0, 0, 0)][:0],
        "k long, t long, rv long")
    st_ = asof_join(from_dataframe(right), on="k", left_time="t",
                    right_cols={"rv": "rv"}, direction=direction)
    got = {r["lid"]: r["rv"] for r in st_(left).collect()}

    def ref(k, t):
        cands = [(rt, k * 1000 + rt) for rk, rt in rts if rk == k
                 and (rt <= t if direction == "backward" else rt >= t)]
        if not cands:
            return None
        best = (max if direction == "backward" else min)(c[0] for c in cands)
        return k * 1000 + best

    want = {i: ref(k, t) for i, (k, t) in enumerate(lts)}
    assert got == want
