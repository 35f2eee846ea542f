"""Shared operator plumbing: result bundle + output schemas.

The reference's ``bucketize()`` returns one quad bag mixing three record
kinds (SDS records, relations, immutable marks —
/root/reference/packages/bucketizer-core/lib/BucketizerCore.ts:311-315).
A columnar engine separates them into three typed DataFrames (FIXTURES.md F4):

- ``assignments``: one row per (bucket, member) pair — the SDS records
  (createSDSRecord, BucketizerCore.ts:162-172). Carries all member payload
  columns plus ``bucket_id``; a member that gets zero buckets (the
  exhausted multi-word substring case, SubstringBucketizer.ts:80-86)
  appears with ``bucket_id IS NULL`` so no data is silently dropped.
- ``relations``: the hypermedia graph edges (expandRelation,
  BucketizerCore.ts:125-160).
- ``seals``: ``sds:immutable`` marks (BucketizerCore.ts:311-312),
  generalized to watermark-driven sealing in streaming mode.
"""

from __future__ import annotations

from typing import Callable, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

RELATIONS_SCHEMA = T.StructType(
    [
        T.StructField("from_bucket", T.StringType()),
        T.StructField("relation_type", T.StringType()),
        T.StructField("to_bucket", T.StringType()),
        T.StructField("values", T.ArrayType(T.StringType())),
        T.StructField("path", T.StringType()),
        T.StructField("created_at_seq", T.LongType()),
    ]
)

SEALS_SCHEMA = T.StructType(
    [
        T.StructField("bucket_id", T.StringType()),
        T.StructField("sealed_at_seq", T.LongType()),
    ]
)


_Frame = Union[DataFrame, Callable[[], DataFrame]]


class BucketizeResult:
    """Operator result bundle. ``relations``/``seals`` accept a zero-arg
    factory instead of a DataFrame: some operators (subject-page) must run
    eager work (the two-phase rank's materialize + offset collect) to BUILD
    the relation frames — a consumer that only reads ``assignments`` (the
    hot path: member routing) must not pay for it. The factory is invoked
    and memoized on first attribute access."""

    def __init__(
        self, assignments: DataFrame, relations: _Frame, seals: _Frame
    ) -> None:
        self.assignments = assignments
        self._relations = relations
        self._seals = seals

    @property
    def relations(self) -> DataFrame:
        if callable(self._relations):
            self._relations = self._relations()
        return self._relations

    @relations.setter
    def relations(self, value: _Frame) -> None:
        self._relations = value

    @property
    def seals(self) -> DataFrame:
        if callable(self._seals):
            self._seals = self._seals()
        return self._seals

    @seals.setter
    def seals(self, value: _Frame) -> None:
        self._seals = value


def empty_relations(spark) -> DataFrame:
    return spark.createDataFrame([], RELATIONS_SCHEMA)


def empty_seals(spark) -> DataFrame:
    return spark.createDataFrame([], SEALS_SCHEMA)


def relation_row(from_b, rel_type: str, to_b, values=None, path=None, seq=None):
    """Build a relations-schema select list from Column expressions."""
    return [
        F.coalesce(from_b, F.lit(None).cast("string")).alias("from_bucket"),
        F.lit(rel_type).alias("relation_type"),
        to_b.cast("string").alias("to_bucket"),
        (values if values is not None else F.lit(None).cast("array<string>")).alias(
            "values"
        ),
        (path if path is not None else F.lit(None).cast("string")).alias("path"),
        (seq if seq is not None else F.lit(None).cast("long")).alias("created_at_seq"),
    ]
