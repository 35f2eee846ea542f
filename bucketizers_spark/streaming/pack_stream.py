"""Streaming per-source sequence packing — the incremental-ingestion
form of the batch per-source packing query
(entry_queries.q_pack_by_source).

A training-data ingester appends tokenized documents continuously;
packing them into fixed-length training examples must not wait for the
corpus to close. Keyed state makes packing incremental: key = source,
state = ONE long (the running token offset of that source's
concatenated stream). Each arriving document takes the next
[off, off + n_tok) token span and emits its (chunk, doc-slice) manifest
rows — exactly the rows the batch window-sum form produces when arrival
order follows doc_id order (the pytest pins that equality, including
across a kill/resume where a post-restart document must continue the
offset a pre-kill document left behind).

Semantics note vs batch (same shape as exact_dedup_stream's note):
batch orders by doc_id — order-free input, canonical order chosen;
the stream packs in ARRIVAL order (ties within a micro-batch broken by
(seq, doc_id)) — the only choice stable under incremental arrival,
since re-packing on a late small doc_id would retract already-emitted
manifest rows. When arrival follows doc_id order the two coincide.

Scale shape: state is one long per source (the smallest state in the
repo); the per-key kernel touches only the key's rows in the current
micro-batch — one shuffle per micro-batch on source, no history
rescan. Token counting (`n_tok`) happens JVM-side before the stateful
op; the Python kernel does integer packing arithmetic over the batch's
rows only, emitting a bounded ceil(n_tok/L)+1 rows per doc. Skew: a
single hot source serializes in one task per batch — inherent to
sequential packing (an offset is a chain); shard hot sources upstream
if per-source order within shards suffices.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_PACK_STATE = T.StructType([T.StructField("off", T.LongType())])

PACK_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("chunk_id", T.LongType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("off_in_chunk", T.LongType()),
        T.StructField("doc_off", T.LongType()),
        T.StructField("n_from_doc", T.LongType()),
    ]
)


def _make_pack_fn(chunk_len: int):
    def fn(
        key, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterable[pd.DataFrame]:
        off = int(state.get[0]) if state.exists else 0
        pdf = pd.concat(list(pdfs), ignore_index=True)
        rows = []
        if len(pdf):
            # materialize all chunks first: the offset chain must follow
            # the batch-global (seq, doc_id) order, not per-Arrow-chunk
            pdf = pdf.sort_values(["seq", "doc_id"]).reset_index(drop=True)
            src = str(key[0])
            for doc_id, n_tok in zip(pdf["doc_id"], pdf["n_tok"]):
                n = int(n_tok)
                fin = off + n
                for c in range(off // chunk_len, (fin - 1) // chunk_len + 1):
                    s = max(off, c * chunk_len)
                    e = min(fin, (c + 1) * chunk_len)
                    rows.append(
                        (
                            src,
                            c,
                            str(doc_id),
                            s - c * chunk_len,
                            s - off,
                            e - s,
                        )
                    )
                off = fin
        state.update((off,))
        if rows:
            yield pd.DataFrame(rows, columns=[f.name for f in PACK_SCHEMA])

    return fn


def pack_stream(
    stream_df: DataFrame,
    *,
    chunk_len: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Pack a streaming document frame into per-source fixed-length
    chunks under cross-batch offset state, returning the (chunk,
    doc-slice) manifest (PACK_SCHEMA). Requires a ``seq`` column to
    order arrivals within a micro-batch."""
    if "seq" not in stream_df.columns:
        raise ValueError("pack_stream needs a seq column")
    d = stream_df.select(
        F.col(source_col).alias("source"),
        "seq",
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
    )
    return d.groupBy("source").applyInPandasWithState(
        _make_pack_fn(chunk_len),
        outputStructType=PACK_SCHEMA,
        stateStructType=_PACK_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
