"""Property-path utilities (O2/O3): the RDF-faithful mode.

The engine's fixed-schema hot path resolves a property path as a plain
column reference (SURVEY.md §1.4). For quad-shaped inputs
(member_id, subject, predicate, object) this module supplies:

- ``parse_property_path`` (O3): the reference's ``'(<p1> <p2>)'`` string
  form → predicate list (setPropertyPathQuads,
  /root/reference/packages/bucketizer-core/lib/BucketizerCore.ts:253-279).
- ``extract_property_path`` (O2): the recursive multi-hop traversal
  (extractPropertyPathObject, BucketizerCore.ts:336-348) as an N-way
  self-equijoin over the quad table — each hop joins the previous hop's
  object to the next hop's subject. Multi-valued hops naturally fan out
  to multiple rows (the reference's multi-bucket membership).

This is a batch utility, deliberately NOT in the streaming hot path: at
10^12 scale the path is resolved at ingest into a fixed column.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_IRI = re.compile(r"<([^>]*)>")


def parse_property_path(path: str) -> list[str]:
    """'(<p1> <p2>)' or '<p1>' → [p1, p2]. Mirrors BucketizerCore.ts:253-279
    (string form; the RDF-list form maps to a plain Python list)."""
    path = path.strip()
    preds = _IRI.findall(path)
    if not preds:
        raise ValueError(f"cannot parse property path {path!r}")
    return preds


def extract_property_path(
    quads: DataFrame, predicates: list[str], member_col: str = "member_id"
) -> DataFrame:
    """Resolve a sequence path over a quad table → (member_id, value) with
    one row per terminal match (0 rows for non-matching members — route
    those through the fallback pager, BucketizerCore.ts:294-300).

    Hop k filters to its predicate first (predicate pushdown into the scan)
    and joins hop(k-1).object == hop(k).subject. Empty path returns the
    member ids themselves (BucketizerCore.ts:339-341)."""
    if not predicates:
        return quads.select(
            F.col(member_col), F.col(member_col).alias("value")
        ).distinct()

    current = (
        quads.where(
            (F.col("predicate") == predicates[0])
            & (F.col("subject") == F.col(member_col))
        )
        .select(F.col(member_col), F.col("object").alias("value"))
    )
    for pred in predicates[1:]:
        nxt = quads.where(F.col("predicate") == pred).select(
            F.col(member_col).alias("_m2"),
            F.col("subject").alias("_s2"),
            F.col("object").alias("_o2"),
        )
        current = (
            current.join(
                nxt,
                (current["value"] == nxt["_s2"])
                & (current[member_col] == nxt["_m2"]),
            )
            .select(F.col(member_col), F.col("_o2").alias("value"))
        )
    return current
