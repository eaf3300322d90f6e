"""Connected-components label propagation."""

from __future__ import annotations

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.graph import (
    connected_components,
)


def test_components_chain_and_isolates(spark):
    # chain 1-2-3-4 (one component), pair 10-11, isolate 20
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 20]], ["node"]
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["src", "dst"]
    )
    comp = {
        r["node"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20}


def test_components_converge_on_deep_chain(spark):
    """A 16-hop chain needs multiple propagation rounds — checks the
    fixpoint loop actually iterates past round one."""
    n = 16
    nodes = spark.createDataFrame([(i,) for i in range(n)], ["node"])
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], ["src", "dst"]
    )
    comp = connected_components(nodes, edges)
    assert {r["component"] for r in comp.collect()} == {0}
