"""Link-graph analytics: PageRank + connected components
(operators/graph.py)."""

import math

from ccr_web_crawler_spark.operators.graph import connected_components, pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["id"]: r["rank"] for r in pagerank(df, **kw).collect()}


def test_pagerank_symmetric_cycle(spark):
    # a↔b: perfectly symmetric — ranks stay exactly 0.5 every iteration
    r = _ranks(spark, [(1, 2), (2, 1)], n_iter=4)
    assert r == {1: 0.5, 2: 0.5}


def test_pagerank_dangling_mass_conserved(spark):
    # 1→2, 2 has no outlinks: dangling mass redistributes, total mass
    # stays 1 and the hand-computed first iteration matches
    r = _ranks(spark, [(1, 2)], n_iter=1)
    assert math.isclose(r[1], 0.15 / 2 + 0.85 * 0.25, rel_tol=1e-12)
    assert math.isclose(r[2], 0.15 / 2 + 0.85 * 0.75, rel_tol=1e-12)
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-12)
    r3 = _ranks(spark, [(1, 2)], n_iter=3)
    assert math.isclose(sum(r3.values()), 1.0, rel_tol=1e-12)


def test_pagerank_fixed_iter_mode_bitwise_equal(spark):
    # checkpoint_every > 1 (the fixed-iteration mode: fewer driver
    # materialization barriers, plan doubles between pins) must be
    # BIT-identical to the per-iteration default — decimal accumulation
    # makes the arithmetic order-independent, so only the physical
    # checkpoint cadence differs
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    per_iter = _ranks(spark, edges, n_iter=4, checkpoint_every=1)
    pinned_late = _ranks(spark, edges, n_iter=4, checkpoint_every=4)
    assert per_iter == pinned_late


def test_pagerank_sink_attracts_rank(spark):
    # 1→3, 2→3, 3→1: node 3 collects the most rank
    r = _ranks(spark, [(1, 3), (2, 3), (3, 1)], n_iter=5)
    assert r[3] > r[1] > r[2]
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-12)


def test_connected_components_chain_and_pair(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    out = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_min_propagates_long_chain(spark):
    # 0-1-2-...-7: min label must travel the whole diameter
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(7)], "src long, dst long"
    )
    out = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert out == {i: 0 for i in range(8)}


def test_connected_components_direction_irrelevant(spark):
    # edges given dst→src still form one component (undirected semantics)
    df = spark.createDataFrame([(5, 4), (3, 4), (2, 3)], "src long, dst long")
    out = {r["id"]: r["component"] for r in connected_components(df).collect()}
    assert set(out.values()) == {2}


def test_connected_components_warns_when_max_iter_exhausted(spark):
    # 10-node path, eccentricity 9 > max_iter=3: hash-min cannot have
    # converged — the no-silent-caps contract requires a RuntimeWarning
    # (default) or a raise (strict=True), never silent truncated labels
    import warnings

    import pytest

    df = spark.createDataFrame([(i, i + 1) for i in range(9)], "src long, dst long")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        out = connected_components(df, max_iter=3).collect()
    assert len(out) == 10
    msgs = [str(w.message) for w in caught if w.category is RuntimeWarning]
    assert any("not converged" in m for m in msgs), msgs
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(df, max_iter=3, strict=True)
    # a converged run stays silent
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        connected_components(df, max_iter=15).collect()
    assert not [w for w in caught if w.category is RuntimeWarning]
