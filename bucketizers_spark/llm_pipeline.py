"""End-to-end training-data preparation — the composition a user runs.

Every stage is an already-verified driver-contract operator
(entry_queries: corpus_filter / mix_temperature / pack_sequences /
pack_materialize / shuffle_shard semantics, each hash-pinned against
its DuckDB oracle); this module wires them over an arbitrary documents
DataFrame and returns the artifacts a training launch consumes:

1. FILTER  — quality gate (length + stopword ratio) ∧ language
   agreement ∧ exact-dedup keep (corpus_filter's predicate);
2. MIX     — deterministic temperature sampling (md5-threshold draw,
   mix_temperature's tempered rates);
3. PACK    — exclusive-prefix-sum manifest over the surviving docs
   (with_global_prefix_sum + _pack_manifest, the two-phase
   distributed scan);
4. CHUNKS  — materialized fixed-length examples with content md5
   (pack_materialize's bounded groupBy assembly);
5. SHARD   — dense pseudo-random training order + round-robin shard
   assignment over the CHUNKS (with_global_rank0 over md5(chunk_id);
   chunk ids are unique so the rank is exact).

Scale shape is the sum of its parts — each stage's plan is audited in
BENCH/PLANS.md under its query name; composing them adds NO new wide
operations (the stages hand off whole DataFrames, lineage fused by
Catalyst until the rank operators' deliberate localCheckpoints).

The pytest pins the composition against the standalone green queries
(filter off ⇒ chunks == q_pack_materialize exactly) and the loader
invariants with the filter on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from bucketizers_spark.operators.rank import (
    with_global_prefix_sum,
    with_global_rank0,
)


def filter_corpus(docs: DataFrame, *, min_words: int = 5) -> DataFrame:
    """corpus_filter's predicate over an arbitrary documents frame:
    keep docs passing the quality gate, language agreement, and exact
    dedup (doc is its own md5-canon AMONG gate survivors — gate first,
    so the canon shuffle moves only survivors; same order as
    q_corpus_filter and the streaming ingest). Returns the surviving
    rows of ``docs`` unchanged (all columns)."""
    from bucketizers_spark.functions.quality import gate_predicate

    surv = docs.where(
        gate_predicate(F.col("text"), F.col("lang"), min_words=min_words)
    )
    canon = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    return (
        surv.withColumn("_canon", canon)
        .where(F.col("_canon") == F.col("doc_id"))
        .drop("_canon")
    )


def gopher_filter(docs: DataFrame, *, dedup: bool = True) -> DataFrame:
    """Gopher word-level quality rules (functions/quality.py
    gopher_metrics_col — the exact q_gopher_rules expressions, one
    definition) as a pipeline stage over an arbitrary documents frame,
    followed (by default) by the same gate-then-canon exact dedup
    order as filter_corpus: rules filter at the scan, the md5-canon
    window shuffles only survivors. Returns surviving rows unchanged
    (all columns)."""
    from bucketizers_spark.functions.quality import gopher_metrics_col

    surv = docs.where(gopher_metrics_col(F.col("text"))["keep"])
    if not dedup:
        return surv
    canon = F.min("doc_id").over(Window.partitionBy(F.md5("text")))
    return (
        surv.withColumn("_canon", canon)
        .where(F.col("_canon") == F.col("doc_id"))
        .drop("_canon")
    )


def semantic_dedup(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    emb_col: str = "embedding",
    k: int = 8,
    tau: float = 0.35,
) -> DataFrame:
    """SemDeDup stage over any frame carrying an embedding column
    (operators/semdedup.semdedup_flags — the exact q_semdedup
    semantics, one definition): keep only cluster-scoped lowest-id
    representatives at rounded cosine >= tau. Returns surviving rows
    of ``df`` unchanged (all columns)."""
    from bucketizers_spark.operators.semdedup import semdedup_flags

    flags = semdedup_flags(
        df.select(id_col, emb_col), id_col=id_col, emb_col=emb_col,
        k=k, tau=tau,
    )
    keep_ids = flags.where("kept").select(id_col)
    return df.join(keep_ids, id_col, "left_semi")


def mix_corpus(
    docs: DataFrame, *, alpha: float = 0.3, budget: int | None = None
) -> DataFrame:
    """mix_temperature's tempered deterministic draw over an arbitrary
    documents frame (budget=None keeps everything — useful when the
    mixture step is not wanted). Returns surviving rows unchanged."""
    if budget is None:
        return docs
    from bucketizers_spark.functions.quality import (
        md5_prefix_key,
        temperature_thresholds,
    )

    th = temperature_thresholds(
        docs, alpha=alpha, budget=budget, th_col="_th"
    )
    key = md5_prefix_key(F.col("doc_id"))
    return (
        docs.join(F.broadcast(th), "lang")
        .where(key < F.col("_th"))
        .drop("_th")
    )


def pack_chunks(docs: DataFrame, *, chunk_len: int = 1024) -> DataFrame:
    """pack_sequences + pack_materialize over an arbitrary documents
    frame: (chunk_id, n_docs, n_tok, content_md5), chunks cut every
    ``chunk_len`` tokens from the doc_id-ordered concatenation."""
    from bucketizers_spark.entry_queries import _pack_manifest

    d = docs.select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("n_tok")
    )
    o = with_global_prefix_sum(d, "doc_id", "n_tok", out_col="off")
    man = _pack_manifest(o, chunk_len)
    j = man.join(docs.select("doc_id", "text"), "doc_id")
    seg = F.concat_ws(
        " ",
        F.slice(
            F.split(F.col("text"), " "),
            (F.col("doc_off") + 1).cast("int"),
            F.col("n_from_doc").cast("int"),
        ),
    )
    pieces = j.select(
        "chunk_id",
        "n_from_doc",
        F.struct(F.col("off_in_chunk").alias("o"), seg.alias("s")).alias("p"),
    )
    return (
        pieces.groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_from_doc").alias("n_tok"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.sort_array(F.collect_list("p")), lambda x: x["s"]
                    ),
                )
            ).alias("content_md5"),
        )
        .select("chunk_id", "n_docs", "n_tok", "content_md5")
    )


def shard_chunks(chunks: DataFrame, *, n_shards: int = 8) -> DataFrame:
    """shuffle_shard over the CHUNK inventory: dense pseudo-random
    training order (exact — chunk ids are unique) + round-robin shard
    and position."""
    keyed = chunks.withColumn(
        "shuffle_key", F.md5(F.col("chunk_id").cast("string"))
    )
    o = with_global_rank0(keyed, "shuffle_key", out_col="order_idx")
    return o.select(
        "chunk_id",
        "n_docs",
        "n_tok",
        "content_md5",
        "order_idx",
        (F.col("order_idx") % n_shards).cast("long").alias("shard_id"),
        F.floor(F.col("order_idx") / n_shards)
        .cast("long")
        .alias("pos_in_shard"),
    )


def prepare_training_data(
    docs: DataFrame,
    *,
    chunk_len: int = 1024,
    n_shards: int = 8,
    min_words: int = 5,
    mix_alpha: float = 0.3,
    mix_budget: int | None = None,
    filter_docs: bool = True,
    quality: str = "gate",
) -> DataFrame:
    """The whole pipeline: filter → mix → pack → materialize → shard.
    Returns one row per training chunk: (chunk_id, n_docs, n_tok,
    content_md5, order_idx, shard_id, pos_in_shard).

    ``quality`` selects the filter family when ``filter_docs``:
    "gate" (corpus_filter's length/stop-ratio/language predicate) or
    "gopher" (the Gopher word-level rule set) — both followed by the
    md5-canon exact dedup. ``semantic_dedup`` is a standalone stage
    (it needs an embedding column documents frames usually lack);
    compose it explicitly before this function when embeddings exist."""
    if filter_docs:
        if quality == "gate":
            kept = filter_corpus(docs, min_words=min_words)
        elif quality == "gopher":
            kept = gopher_filter(docs)
        else:
            raise ValueError(f"unknown quality filter {quality!r}")
    else:
        kept = docs
    mixed = mix_corpus(kept, alpha=mix_alpha, budget=mix_budget)
    return shard_chunks(
        pack_chunks(mixed, chunk_len=chunk_len), n_shards=n_shards
    )
