"""IVF (inverted-file) ANN over embedding columns — the configurable
operator behind ann_ivf (entry_queries pins K=16, nprobe=4, lowest-id
centroids for the DuckDB-replayable driver form).

Index shape: every vector is assigned to its nearest of K centroids
("cells"); a query probes only its ``nprobe`` nearest cells and
exact-rescores inside them. Cost per query ~ n * nprobe / K of the
brute-force scan; recall depends on how often a true neighbour lands in
an unprobed cell. Measured sweep on the driver fixture (near-random
embeddings — the HARD case for IVF, no cluster structure to exploit):
tools/ivf_recall_sweep.py → BENCH/PLANS.md.

Scale shape (100 TB): centroids are O(K·dim) — always broadcast; cell
assignment is one broadcast-join + map-side-combined argmax (n slim rows
shuffled once, or zero shuffles if consumers accept the map output);
probing is an equijoin on cell id. Never an all-pairs product. K should
grow with sqrt(n) (FAISS guidance) so cells stay bounded; nprobe is the
linear recall knob, exactly like LSH bands.

Centroid training: ``kmeans_centroids`` runs seeded spherical Lloyd
iterations driver-side over a DETERMINISTIC hash-ordered sample
(md5-ordered ids — stable across runs/partitionings, no RNG in the
sample). The sample is bounded (default 4096 × dim doubles), so the
driver never holds data proportional to n — the classic big-data k-means
split: train on a sample, assign at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _cosine(a, b):
    """Bit-identical to entry_queries._cosine (elementwise double
    products folded left-to-right) so operator-built results hash-match
    the pinned driver form."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nb = F.aggregate(
        F.transform(b, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return dot / (F.sqrt(na) * F.sqrt(nb))


def lowest_id_centroids(
    emb: DataFrame, k: int, *, id_col: str = "vec_id", emb_col: str = "embedding"
) -> DataFrame:
    """The K lowest-id vectors as centroids — deterministic and
    SQL-replayable (the driver-gated ann_ivf form uses this so the
    DuckDB oracle can reproduce the exact cells)."""
    return emb.where(F.col(id_col) < k).select(
        F.col(id_col).alias("c_id"), F.col(emb_col).alias("ce")
    )


def kmeans_centroids(
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    sample_n: int = 4096,
    iters: int = 10,
    seed: int = 20260816,
) -> DataFrame:
    """Seeded spherical k-means centroids trained on a deterministic
    md5-ordered sample. Returns a K-row (c_id, ce) frame to broadcast.

    Determinism: the sample is the ``sample_n`` ids with smallest
    md5(id) (a stable pseudo-random order, no RNG state, retry-safe like
    sample_stratified); init picks every (sample//k)-th sorted sample
    vector (spread, not random); Lloyd updates run in numpy float64 with
    fixed iteration count — same input, same centroids, every run."""
    import numpy as np

    sample = (
        emb.select(id_col, emb_col)
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(sample_n)
        .collect()
    )
    M = np.array([r[emb_col] for r in sample], dtype=np.float64)
    n = M.shape[0]
    if n == 0:
        raise ValueError("kmeans_centroids: empty input")
    k = min(k, n)
    Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
    # spread init: every (n//k)-th vector of the hash-ordered sample
    C = Mn[:: max(n // k, 1)][:k].copy()
    for _ in range(iters):
        # spherical Lloyd: assign by max dot (== cosine on unit vectors)
        a = np.argmax(Mn @ C.T, axis=1)
        for j in range(k):
            pts = Mn[a == j]
            if len(pts):
                c = pts.sum(axis=0)
                nrm = np.linalg.norm(c)
                if nrm > 1e-12:
                    C[j] = c / nrm
            # empty cell: keep the previous centroid (deterministic)
    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(
        [(j, [float(x) for x in C[j]]) for j in range(k)],
        "c_id long, ce array<double>",
    )


def assign_cells(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> DataFrame:
    """(id, cell): nearest-centroid assignment. One broadcast crossJoin
    (K rows) + map-side-combined argmax groupBy; ties go to the smallest
    c_id. Similarities are rounded to 4 places first so Spark and the
    SQL oracle agree on tie sets."""
    scored = emb.crossJoin(F.broadcast(centroids)).select(
        id_col,
        "c_id",
        F.round(_cosine(F.col(emb_col), F.col("ce")), 4).alias("_sim"),
    )
    best = F.max(F.struct(F.col("_sim"), (-F.col("c_id")).alias("_nc")))
    return scored.groupBy(id_col).agg(
        (-best.getField("_nc")).cast("long").alias("cell")
    )


def stateless_cell_expr(cent_rows, emb_col: str = "embedding"):
    """Nearest-centroid cell as ONE column expression over literal
    centroid arrays — no crossJoin, no groupBy, no state. ``cent_rows``
    is the collected (c_id, ce) list (K is bounded by design, so
    literalizing it is free). Bit-identical tie behavior to
    assign_cells: array_max over (rounded cosine, -c_id) structs =
    max similarity, then smallest c_id. This is both the streaming
    form (an argmax groupBy would be an illegal second stateful op
    under a keyed-state kernel) and the cheap batch form when the
    assignment feeds a narrow pipeline (semdedup: no shuffle until
    the per-cell kernel)."""
    sims = F.array(
        *[
            F.struct(
                F.round(
                    _cosine(F.col(emb_col), F.lit(list(ce))), 4
                ).alias("s"),
                F.lit(-int(cid)).alias("nc"),
            )
            for cid, ce in cent_rows
        ]
    )
    return (-F.array_max(sims)["nc"]).cast("long")


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    *,
    nprobe: int = 4,
    topk: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    query_id_col: str = "query_id",
    query_emb_col: str = "qe",
) -> DataFrame:
    """Top-k neighbours per query, searching only the ``nprobe`` nearest
    cells. Output (query_id, vec_id, sim_r4, rk) matches the brute-force
    ann_topk shape so recall is directly comparable."""
    cells = assign_cells(emb, centroids, id_col=id_col, emb_col=emb_col)
    qscored = queries.crossJoin(F.broadcast(centroids)).select(
        query_id_col,
        query_emb_col,
        F.col("c_id").alias("cell"),
        F.round(_cosine(F.col(query_emb_col), F.col("ce")), 4).alias("_cs"),
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("_cs").desc(), F.col("cell")
    )
    probes = (
        qscored.withColumn("_pr", F.row_number().over(wq))
        .where(F.col("_pr") <= nprobe)
        .select(query_id_col, query_emb_col, "cell")
    )
    members = cells.join(emb.select(id_col, emb_col), id_col)
    cand = probes.join(members, "cell").where(
        F.col(id_col) != F.col(query_id_col)
    )
    sim = F.round(_cosine(F.col(query_emb_col), F.col(emb_col)), 4)
    scored2 = (
        cand.select(query_id_col, id_col, sim.alias("sim_r4"))
        .groupBy(query_id_col, id_col)
        .agg(F.max("sim_r4").alias("sim_r4"))  # dedup multi-probe hits
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("sim_r4").desc(), F.col(id_col)
    )
    return scored2.withColumn("rk", F.row_number().over(w)).where(
        F.col("rk") <= topk
    )
