"""Sign (random-hyperplane) LSH over embedding columns — the configurable
operator behind ann_lsh / emb_near_dup (entry_queries pins bits=16,
bands=16 for the driver-checked forms).

Parameter guidance (cosine similarity s, collision prob per bit
p = 1 - arccos(s)/pi; band hit prob p**bits; candidate recall
1 - (1 - p**bits)**bands):

- ``bits`` bounds BUCKET SIZE: 2**bits buckets per band caps the band
  self-join at sum(bucket^2). 16 bits = 65k buckets/band keeps the join
  linear-ish at 10^12 rows; 8 bits = 256 buckets/band makes each bucket
  ~n/256 — quadratic blowup on near-uniform data. Prefer MORE BANDS over
  FEWER BITS at scale: cost of bands is linear (n·bands hash+join rows),
  cost of shorter bits is quadratic (bucket population).
- ``bands`` buys RECALL at linear cost: at cos 0.9 a 16-bit band hits
  p = 0.857^16 ~= 0.084, so 4 bands ~= 0.30 recall, 16 ~= 0.75,
  32 ~= 0.94. Measured sweep on the driver fixture: BENCH/PLANS.md
  (tools/lsh_recall_sweep.py regenerates it).
- Sign-LSH is inherently weak at LOW similarity thresholds (cos <= 0.5:
  p <= 0.67, needing 10s-100s of bands even at 6-8 bits) — for such
  workloads use minhash over feature shingles or brute-force partitioned
  rescoring instead.

The hyperplanes are seeded ±1 Rademacher vectors (random.Random — stable
across Python/numpy versions, reproducible in SQL oracles as literal
weight tables). One (batch × dim) @ (dim × bands·bits) numpy matmul per
Arrow batch computes every sign bit — no per-row Python.
"""

from __future__ import annotations

import random

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from bucketizers_spark.plans.materialize import cut_lineage


def hyperplanes(
    dim: int, bits: int, bands: int, seed: int = 20260816
) -> list[list[list[float]]]:
    """Seeded ±1 hyperplanes, shape [bands][bits][dim]. The nested loop
    order (bands → bits → dim) is part of the contract: entry_queries'
    pinned 16×4 oracle weights reproduce it literally."""
    rng = random.Random(seed)
    return [
        [[rng.choice((-1.0, 1.0)) for _ in range(dim)] for _ in range(bits)]
        for _ in range(bands)
    ]


def sign_lsh_udf(dim: int, bits: int, bands: int, seed: int = 20260816):
    """Vectorized Arrow UDF embedding → array<string> (one bucket per
    band). Built lazily per (dim, bits, bands, seed)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    H = np.array(
        [h for band in hyperplanes(dim, bits, bands, seed) for h in band],
        dtype=np.float64,
    )

    @pandas_udf("array<string>")
    def f(s: pd.Series) -> pd.Series:
        M = np.vstack(s.to_numpy()).astype(np.float64)
        sign_bits = np.where((M @ H.T) >= 0, "1", "0")
        return pd.Series(
            [
                ["".join(r[b * bits : (b + 1) * bits]) for b in range(bands)]
                for r in sign_bits
            ]
        )

    return f


def sign_lsh_buckets(
    df: DataFrame,
    emb_col: str,
    *,
    dim: int,
    bits: int = 16,
    bands: int = 16,
    seed: int = 20260816,
    id_cols: list[str] | None = None,
) -> DataFrame:
    """(id_cols…, band, bucket) — one row per (vector, band)."""
    ids = id_cols or [c for c in df.columns if c != emb_col]
    udf = sign_lsh_udf(dim, bits, bands, seed)
    return df.select(*ids, udf(F.col(emb_col)).alias("_bk")).select(
        *ids, F.posexplode("_bk").alias("band", "bucket")
    )


def lsh_candidate_pairs(
    df: DataFrame,
    id_col: str,
    emb_col: str,
    *,
    dim: int,
    bits: int = 16,
    bands: int = 16,
    seed: int = 20260816,
) -> DataFrame:
    """Distinct unordered candidate pairs (a_id < b_id) sharing any band
    bucket. The band+bucket equijoin is the only shuffle — never
    all-pairs; the bucket frame is materialized once so the hash UDF and
    the embedding scan run one time, not once per join side."""
    buckets = sign_lsh_buckets(
        df.select(id_col, emb_col), emb_col,
        dim=dim, bits=bits, bands=bands, seed=seed, id_cols=[id_col],
    ).transform(cut_lineage)
    return (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col(f"x.{id_col}") < F.col(f"y.{id_col}")),
        )
        .select(
            F.col(f"x.{id_col}").alias("a_id"),
            F.col(f"y.{id_col}").alias("b_id"),
        )
        .distinct()
    )
