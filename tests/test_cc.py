"""Connected-components (C5) unit tests: chains, stars, isolated nodes,
determinism across reruns."""

from __future__ import annotations

from cmem_plugin_pyshacl_spark.plans.connected_components import (
    connected_components,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "src string, dst string")
    out = connected_components(df)
    return {r.node: r.component for r in out.collect()}


def test_single_edge(spark):
    assert _cc(spark, [("b", "a")]) == {"a": "a", "b": "a"}


def test_chain_collapses_to_min(spark):
    # a-b-c-d-e chain: all must label to 'a' (multi-hop propagation)
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")]
    assert _cc(spark, edges) == {x: "a" for x in "abcde"}


def test_two_components(spark):
    edges = [("a", "b"), ("c", "d")]
    got = _cc(spark, edges)
    assert got == {"a": "a", "b": "a", "c": "c", "d": "c"}


def test_star_and_selfloop(spark):
    edges = [("hub", f"leaf{i}") for i in range(5)] + [("hub", "hub")]
    got = _cc(spark, edges)
    # min node is 'hub' vs 'leaf*' -> 'hub'
    assert set(got.values()) == {"hub"}
    assert len(got) == 6


def test_deterministic_rerun(spark):
    edges = [(f"n{i}", f"n{(i * 7) % 20}") for i in range(20)]
    assert _cc(spark, edges) == _cc(spark, edges)


def test_bipartite_hub_pattern(spark):
    # the canonicalization shape: surfaces -> norm: hub nodes
    edges = [
        ("org0", "norm:org0"), ("org0 Inc.", "norm:org0"),
        ("org1", "norm:org1"),
    ]
    got = _cc(spark, edges)
    assert got["org0"] == got["org0 Inc."] == got["norm:org0"]
    assert got["org1"] == got["norm:org1"]
    assert got["org0"] != got["org1"]


def test_driver_and_distributed_paths_identical(spark):
    """The adaptive small-graph union-find must produce EXACTLY the
    distributed star-contraction labeling."""
    from cmem_plugin_pyshacl_spark.plans.connected_components import (
        connected_components,
    )

    rows = [(f"n{i}", f"n{(i * 7) % 40}") for i in range(40)] + [
        ("a", "b"), ("b", "c"), ("x", "x"), ("lone", "lone"),
    ]
    edges = spark.createDataFrame(rows, "src string, dst string")
    small = connected_components(edges)  # threshold path
    big = connected_components(edges, small_graph_threshold=0)  # distributed
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, big.collect()))
