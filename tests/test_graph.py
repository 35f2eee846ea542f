"""connected_components (operators/graph.py) — the dedup-cluster
closure. Cases: multi-component graphs, chains (diameter > 1 round),
isolated nodes via ``nodes=``, string ids, and the strict
non-convergence valve. connected_components_star (large-star/small-star)
is pinned equal to the simple form and converges on long paths in
logarithmic iterations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from bucketizers_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _cc(spark, edges, **kw):
    e = spark.createDataFrame(edges, "src long, dst long")
    out = connected_components(e, **kw)
    return {r["node"]: r["component"] for r in out.collect()}


class TestConnectedComponents:
    def test_two_components_and_chain(self, spark):
        # {1,2,3,4} as a 4-chain (diameter 3) and {10,11} as an edge
        got = _cc(spark, [(2, 1), (3, 2), (4, 3), (10, 11)])
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_triangle_plus_pendant(self, spark):
        got = _cc(spark, [(5, 6), (6, 7), (7, 5), (7, 8)])
        assert got == {5: 5, 6: 5, 7: 5, 8: 5}

    def test_isolated_nodes_are_singletons(self, spark):
        e = spark.createDataFrame([(1, 2)], "src long, dst long")
        nodes = spark.range(1, 6).select(F.col("id").alias("node"))
        out = connected_components(e, nodes=nodes)
        got = {r["node"]: r["component"] for r in out.collect()}
        assert got == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}

    def test_string_ids(self, spark):
        e = spark.createDataFrame(
            [("b", "a"), ("c", "b"), ("x", "y")], "src string, dst string"
        )
        out = connected_components(e)
        got = {r["node"]: r["component"] for r in out.collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_self_loops_ignored(self, spark):
        got = _cc(spark, [(1, 1), (1, 2), (2, 2)])
        assert got == {1: 1, 2: 1}

    def test_strict_valve_raises_then_lenient_passes(self, spark):
        # an 8-chain needs more than 2 min-propagation rounds; force the
        # distributed rounds (the r7 small-graph union-find fast path
        # always converges, so the valve only applies at scale)
        chain = [(i + 1, i) for i in range(1, 8)]
        e = spark.createDataFrame(chain, "src long, dst long")
        with pytest.raises(RuntimeError, match="no fixpoint"):
            connected_components(e, max_rounds=2, small_graph_threshold=0)
        out = connected_components(
            e, max_rounds=2, strict=False, small_graph_threshold=0
        )
        # lenient: still a valid partial merge (labels monotonically
        # decreased), just not the full closure
        got = {r["node"]: r["component"] for r in out.collect()}
        assert all(c <= n for n, c in got.items())

    def test_small_graph_fast_path_equals_rounds(self, spark):
        # r7: the driver union-find fast path must equal the distributed
        # min-label rounds exactly — same labels, same singleton handling
        import random

        rng = random.Random(7)
        edges = [
            (rng.randrange(200), rng.randrange(200)) for _ in range(150)
        ]
        e = spark.createDataFrame(edges, "src long, dst long")
        nodes = spark.createDataFrame(
            [(i,) for i in range(250)], "node long"
        )
        fast = {
            (r["node"], r["component"])
            for r in connected_components(e, nodes=nodes).collect()
        }
        slow = {
            (r["node"], r["component"])
            for r in connected_components(
                e, nodes=nodes, small_graph_threshold=0
            ).collect()
        }
        assert fast == slow and len(fast) == 250


class TestConnectedComponentsStar:
    @staticmethod
    def _both(spark, edges, **kw):
        e = spark.createDataFrame(edges, "src long, dst long")
        simple = {
            r["node"]: r["component"]
            for r in connected_components(e, **kw).collect()
        }
        star = {
            r["node"]: r["component"]
            for r in connected_components_star(e, **kw).collect()
        }
        return simple, star

    def test_equals_simple_form(self, spark):
        edges = [(2, 1), (3, 2), (4, 3), (10, 11), (7, 5), (5, 6), (6, 7)]
        simple, star = self._both(spark, edges)
        assert star == simple

    def test_long_path_converges_logarithmically(self, spark):
        """A 33-node path (diameter 32): label propagation needs 32
        rounds; the star form must finish within 8 iterations — the
        O(log n) claim, pinned."""
        edges = [(i, i + 1) for i in range(32)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components_star(e, max_rounds=8).collect()
        }
        assert got == {i: 0 for i in range(33)}

    def test_hot_star_graph(self, spark):
        """Celebrity node: 0 connected to 1..40 — already a star; one
        iteration fixpoint, everything labeled 0."""
        edges = [(0, i) for i in range(1, 41)]
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["component"]
            for r in connected_components_star(e, max_rounds=3).collect()
        }
        assert got == {i: 0 for i in range(41)}

    def test_isolated_nodes_and_random_graph(self, spark):
        import random

        rng = random.Random(99)
        edges = [
            (rng.randrange(60), rng.randrange(60)) for _ in range(45)
        ]
        nodes = spark.createDataFrame(
            [(i,) for i in range(70)], "node long"
        )
        e = spark.createDataFrame(edges, "src long, dst long")
        simple = {
            r["node"]: r["component"]
            for r in connected_components(e, nodes=nodes).collect()
        }
        star = {
            r["node"]: r["component"]
            for r in connected_components_star(e, nodes=nodes).collect()
        }
        assert star == simple and len(star) == 70

    def test_strict_valve(self, spark):
        e = spark.createDataFrame(
            [(i, i + 1) for i in range(32)], "src long, dst long"
        )
        with pytest.raises(RuntimeError, match="no fixpoint"):
            connected_components_star(e, max_rounds=1)
