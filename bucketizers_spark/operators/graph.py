"""Distributed connected components — the clustering step a dedup
pipeline runs over its near-duplicate PAIRS to pick one canonical
document per duplicate group (pairs alone under-delete: if A~B and B~C
but A!~C, keeping "one of each pair" keeps two of {A,B,C}).

Algorithm: iterative min-label propagation. Every node starts labeled
with itself; each round every node takes the minimum label among itself
and its neighbors; stop when a round changes nothing. Converges in
O(diameter) rounds — near-dup clusters are dense and shallow (diameter
is typically 2-4 even for million-doc clusters), so the round count is
small and INDEPENDENT of total data size.

Scale shape (the part that must survive 100 TB):
- each round is one equijoin of the label frame against the edge list on
  node id plus one groupBy(node).min(label) — both shuffle on node id,
  both AQE-skew-splittable; nothing is collected except the single
  `changed` count that decides termination.
- the label frame is localCheckpoint()ed per round: iterative plans
  otherwise grow lineage linearly and re-execute the whole history each
  round (the classic iterative-Spark trap).
- `max_rounds` is a safety valve, not a tuning knob: a pathological
  path-graph component of length > max_rounds would come out split, so
  the valve raises by default rather than silently under-merging.

For graphs with giant high-degree components the label-propagation
round cost is dominated by the hot node's edge fan-in; the
alternating large-star/small-star algorithm (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) halves that by rewiring
edges toward component minima between rounds. Near-dup graphs don't
need it (bounded doc multiplicity bounds degree), so this module ships
the simpler form; the seam to swap is this one function.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    *,
    nodes: DataFrame | None = None,
    node_col: str = "node",
    max_rounds: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Return (node, component) where component is the minimum node id
    reachable from ``node`` over the undirected ``edges``.

    ``nodes`` (optional) adds isolated vertices — each comes out as its
    own singleton component. Node ids must be orderable (int or string).
    ``strict=True`` raises if ``max_rounds`` passes without a fixpoint
    (an unconverged result silently under-merges clusters)."""
    # materialize the caller's edge plan ONCE before mirroring it: the
    # union's two branches would otherwise re-execute a possibly huge
    # upstream pipeline (dedup_cluster feeds the whole band-join +
    # jaccard rescore here) twice
    e0 = edges.select(
        F.col(src).alias("a"), F.col(dst).alias("b")
    ).localCheckpoint()
    und = (
        e0.union(e0.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .where(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        und.select(F.col("a").alias(node_col))
        .union(und.select(F.col("b").alias(node_col)))
        .distinct()
        .withColumn("component", F.col(node_col))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        # neighbor labels: edge (a,b) proposes b's current label to a
        proposed = (
            und.join(
                labels.select(
                    F.col(node_col).alias("b"), F.col("component").alias("_nl")
                ),
                "b",
            )
            .select(F.col("a").alias(node_col), F.col("_nl"))
            .groupBy(node_col)
            .agg(F.min("_nl").alias("_nmin"))
        )
        # lazy checkpoint: the convergence count below is the action that
        # materializes it — one job per round instead of two (the eager
        # checkpoint ran the plan, then the count ran again)
        new_labels = (
            labels.join(proposed, node_col, "left")
            .select(
                node_col,
                F.least(
                    F.col("component"), F.coalesce(F.col("_nmin"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("_nmin"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("_chg"),
            )
            .localCheckpoint(eager=False)
        )
        changed = new_labels.agg(F.sum("_chg")).first()[0] or 0
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        if strict:
            raise RuntimeError(
                f"connected_components: no fixpoint in {max_rounds} rounds "
                "(component diameter exceeds max_rounds; raise it)"
            )
    if nodes is not None:
        iso = nodes.select(F.col(node_col)).distinct().join(
            labels.select(node_col), node_col, "left_anti"
        )
        labels = labels.union(
            iso.withColumn("component", F.col(node_col))
        )
    return labels
