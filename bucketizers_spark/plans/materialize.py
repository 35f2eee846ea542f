"""Lineage-cut seam: reliable checkpoint in production, local in tests.

Iterative operators (connected components, the trie cascade, the
two-phase rank) and multi-consumer frames need their lineage truncated —
without a cut, each round's plan nests the previous round's
(exponential analysis cost) or a second consumer re-derives the whole
upstream pipeline.

``localCheckpoint`` is the right cut on a single host (no HDFS round
trip), but its blocks are NON-REPLICATED executor-local state: on a
multi-executor cluster, losing one executor makes the frame
unrecoverable — Spark cannot recompute a truncated lineage — and the
query fails. Production runs therefore configure a reliable checkpoint
directory (``spark.sparkContext.setCheckpointDir(...)`` to HDFS/S3),
and every engine lineage cut automatically upgrades to the
fault-tolerant ``checkpoint()`` through this seam. The sandbox leaves
the dir unset and gets the fast local path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, *, eager: bool = True) -> DataFrame:
    """Truncate ``df``'s lineage: ``checkpoint()`` when a reliable
    checkpoint dir is configured on the SparkContext, else
    ``localCheckpoint()``."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
