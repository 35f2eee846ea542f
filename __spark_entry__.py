"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship subject-page bucketization over the sf0.001
documents table; ``queries``/``oracle_sql`` expose every implemented
operator (SURVEY.md §2 + pipeline extras), each with a DuckDB oracle —
including the substring/token tries, whose level-synchronous cascade
unrolls into fixed-depth SQL (entry_queries._trie_sql).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: subject-page bucketize sf0.001 documents, count members and
    total chars per bucket page-rotation root."""
    from pyspark.sql import functions as F

    from bucketizers_spark.operators import subject_page

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs = docs.withColumn(
        "subject",
        F.concat(
            F.lit("http://example.org/doc/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
        ),
    )
    res = subject_page(
        docs, "subject", salt="s0", seq_col="doc_id", max_relations=20
    )
    return (
        res.assignments.groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("bucket_id")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bucketizers_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from bucketizers_spark.entry_queries import ORACLES

    return dict(ORACLES)
