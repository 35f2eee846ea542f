"""Streaming cross-batch exact dedup — the incremental-ingestion form of
the batch ``dedup_exact`` operator (entry_queries.q_dedup_exact).

A training-data pipeline ingests a corpus in snapshots; each new batch
must dedup against EVERYTHING already seen, not just within itself.
Keyed state does exactly that: key = md5(canonical text), state = the
first-seen canonical doc id. Every row is emitted with its ``canon_id``
and ``is_dup`` flag; the first arrival of a hash across the stream's
lifetime is the canon, every later arrival (same batch or any future
batch) is a duplicate of it.

Semantics note vs batch: batch ``dedup_exact`` canonizes to the MIN
doc_id of a duplicate set (an order-free choice — batch has no arrival
order); the stream canonizes to the FIRST-ARRIVED doc_id (ties within
one micro-batch broken by min (seq, doc_id)) — the only choice that is
stable under incremental arrival, since a later batch may carry a
smaller id whose re-canonization would retract already-emitted rows.
When arrival order follows doc_id order the two coincide (the pytest
pins that equality); when it doesn't, the streaming answer is the one
every incremental system gives (first writer wins).

Scale shape: state cardinality = distinct document hashes (32-byte key +
one id per unique doc); the per-key kernel touches only that key's rows
in the current batch — one shuffle per micro-batch on the hash key, no
rescan of history. RocksDB state store holds billions of keys per the
usual Structured Streaming sizing; nothing here is driver-side.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_DEDUP_STATE = T.StructType([T.StructField("canon", T.StringType())])


def _make_dedup_fn(id_col: str, seq_col: str | None):
    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        canon = state.get[0] if state.exists else None
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            # materialize all chunks first: the canon must be the global
            # first row of this key in the batch, not per-Arrow-chunk
            order = (
                [seq_col, id_col] if seq_col is not None else [id_col]
            )
            pdf = pdf.sort_values(order).reset_index(drop=True)
            if canon is None:
                canon = str(pdf[id_col].iloc[0])
            pdf["canon_id"] = canon
            pdf["is_dup"] = pdf[id_col].astype(str) != canon
            yield pdf
        state.update((canon,))

    return fn


def exact_dedup_stream(
    stream_df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    seq_col: str | None = "seq",
) -> DataFrame:
    """Tag a streaming document frame with (canon_id, is_dup) under
    cross-batch first-arrival dedup state. ``seq_col`` orders arrivals
    within a micro-batch (pass None to order by ``id_col`` alone)."""
    keyed = stream_df.withColumn("_h", F.md5(F.col(text_col)))
    out_schema = T.StructType(
        list(keyed.schema.fields)
        + [
            T.StructField("canon_id", T.StringType()),
            T.StructField("is_dup", T.BooleanType()),
        ]
    )
    return (
        keyed.groupBy("_h")
        .applyInPandasWithState(
            _make_dedup_fn(id_col, seq_col),
            outputStructType=out_schema,
            stateStructType=_DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        .drop("_h")
    )
