"""Arrival-order pager (S1) and the bucketless fallback pager (O4/S6).

Reference semantics: BasicBucketizer keeps a global ``memberCounter`` and
rolls to a new page when it reaches ``pageSize``, emitting a
``Relation(page-1 → page)`` at each boundary
(/root/reference/packages/bucketizer-basic/lib/BasicBucketizer.ts:47-94).
The fallback pager does the same over no-match members with buckets named
``bucketless-{N}`` and relations from the strategy root
(/root/reference/packages/bucketizer-core/lib/BucketizerCore.ts:375-396).

Spark realization (SURVEY.md §7 key insight): the running counter is a pure
function of the 0-based arrival index — ``bucket = floor(idx / page_size)``.
With a dense ``seq`` column stamped at the source (Iceberg snapshot/file/row
order in production; the fixture generator here) this is a **stateless
narrow map — no shuffle at all**. Without a dense seq we fall back to
``row_number()`` which is a global sort: fine at test SF, documented as the
non-scalable path (at 10^12 rows you stamp seq at the source, full stop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bucketizers_spark.operators.core import (
    BucketizeResult,
    empty_seals,
    relation_row,
)
from bucketizers_spark.operators.rank import with_global_rank0


def _with_rank0(df: DataFrame, seq_col: str, dense_seq: bool) -> DataFrame:
    """Add a 0-based arrival rank as ``_rank0``. With a dense source-stamped
    seq this is a free narrow map (the production path); otherwise the
    two-phase range-partitioned rank (operators/rank.py) — distributed,
    never a single-task sort."""
    if dense_seq:
        return df.withColumn("_rank0", F.col(seq_col).cast("long"))
    # probe_uncut: the pager's input is the caller's raw frame (scan-
    # cheap), so the dense probe runs column-pruned with no checkpoint
    return with_global_rank0(df, seq_col, out_col="_rank0", probe_uncut=True)


def _boundary_relations(
    assignments: DataFrame,
    bucket_expr,
    from_expr,
    rel_type: str = "Relation",
):
    """One relation per page boundary: emitted with the first member of each
    new page (BasicBucketizer.ts:54-60). Derived from the assignment frame
    with a groupBy on the (already computed) bucket — a tiny aggregate."""
    return (
        assignments.where(F.col("_page") >= 1)
        .groupBy("_page")
        .agg(F.min(F.col("_seq_for_rel")).alias("created_at_seq"))
        .select(
            *relation_row(
                from_expr(F.col("_page")),
                rel_type,
                bucket_expr(F.col("_page")),
                seq=F.col("created_at_seq"),
            )
        )
    )


def basic_pager(
    df: DataFrame,
    *,
    page_size: int = 50,
    seq_col: str = "seq",
    dense_seq: bool = False,
) -> BucketizeResult:
    """Page members by arrival order: bucket = str(floor(rank / page_size))."""
    spark = df.sparkSession
    assigned = (
        _with_rank0(df, seq_col, dense_seq)
        .withColumn("_page", F.floor(F.col("_rank0") / F.lit(page_size)))
        .withColumn("_seq_for_rel", F.col(seq_col))
        .withColumn("bucket_id", F.col("_page").cast("string"))
    )
    relations = _boundary_relations(
        assigned,
        bucket_expr=lambda p: p,
        from_expr=lambda p: (p - 1).cast("string"),
    )
    assignments = assigned.drop("_page", "_seq_for_rel", "_rank0")
    return BucketizeResult(assignments, relations, empty_seals(spark))


def fallback_pager(
    df: DataFrame,
    *,
    page_size: int = 50,
    root: str = "root",
    seq_col: str = "seq",
    dense_seq: bool = False,
) -> BucketizeResult:
    """Bucketless pager for members with no property match.

    ``df`` must already be filtered to the unmatched members (the engine's
    analog of a zero-match property path, BucketizerCore.ts:294-300); their
    arrival rank *within that subset* drives the paging, exactly like the
    reference's dedicated ``bucketlessPageMemberCounter``.
    ``dense_seq`` only applies if the subset itself is densely numbered.
    """
    spark = df.sparkSession
    assigned = (
        _with_rank0(df, seq_col, dense_seq)
        .withColumn("_page", F.floor(F.col("_rank0") / F.lit(page_size)))
        .withColumn("_seq_for_rel", F.col(seq_col))
        .withColumn("bucket_id", F.concat(F.lit("bucketless-"), F.col("_page")))
    )
    # every new page gets one Relation from the root (BucketizerCore.ts:383-393),
    # including page 0 (unlike basic, whose page 0 is the root itself)
    relations = (
        assigned.groupBy("_page")
        .agg(F.min("_seq_for_rel").alias("created_at_seq"))
        .select(
            *relation_row(
                F.lit(root),
                "Relation",
                F.concat(F.lit("bucketless-"), F.col("_page")),
                seq=F.col("created_at_seq"),
            )
        )
    )
    assignments = assigned.drop("_page", "_seq_for_rel", "_rank0")
    return BucketizeResult(assignments, relations, empty_seals(spark))
