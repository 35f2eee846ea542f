"""Measure PQ/ADC top-10 recall against exact-L2 ground truth on the
driver fixture, for both codebook modes (lowest-id — the
oracle-replayable form the pinned ann_pq query uses — and per-subspace
Lloyd-trained) and for the raw-ADC vs shortlist+exact-rescore serving
modes. Same numpy math as the Spark/DuckDB expressions, so the sweep
needs no JVM; deterministic end-to-end.

Usage: python tools/pq_recall_sweep.py [sf_dir] [shortlists...]
Output: a markdown table (pasted into BENCH/PLANS.md). Queries are
vec_id < 5, matching ann_pq / ann_pq_rescore.
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np

M_SUB, K, D = 8, 16, 8  # matches entry_queries._PQ_M/_PQ_K/_PQ_D


def load(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"select vec_id, embedding from "
        f"read_parquet('{sf_dir}/embeddings.parquet') order by vec_id"
    ).fetchall()
    ids = np.array([r[0] for r in rows])
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    return ids, mat


def lowest_id_codebook(mat: np.ndarray) -> list[np.ndarray]:
    return [mat[:K, m * D : (m + 1) * D].copy() for m in range(M_SUB)]


def trained_codebook(mat: np.ndarray, iters: int = 10) -> list[np.ndarray]:
    """Per-subspace Lloyd from the lowest-id init — deterministic
    (fixed iteration count, empty cells keep their centroid)."""
    out = []
    for m in range(M_SUB):
        x = mat[:, m * D : (m + 1) * D]
        c = x[:K].copy()
        for _ in range(iters):
            d2 = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(K):
                mask = assign == j
                if mask.any():
                    c[j] = x[mask].mean(0)
        out.append(c)
    return out


def encode(mat: np.ndarray, cb: list[np.ndarray]) -> np.ndarray:
    codes = np.zeros((len(mat), M_SUB), dtype=int)
    for m in range(M_SUB):
        sub = mat[:, m * D : (m + 1) * D]
        d2 = ((sub[:, None, :] - cb[m][None, :, :]) ** 2).sum(-1)
        codes[:, m] = d2.argmin(1)
    return codes


def sweep(ids, mat, cb, shortlists) -> dict:
    codes = encode(mat, cb)
    res = {s: [] for s in ["adc"] + list(shortlists)}
    for qid in range(5):
        q = mat[qid]
        d_exact = ((mat - q) ** 2).sum(1)
        d_exact[qid] = np.inf
        truth = set(ids[np.lexsort((ids, d_exact))[:10]])
        adc = np.zeros(len(mat))
        for m in range(M_SUB):
            lut = ((q[m * D : (m + 1) * D][None, :] - cb[m]) ** 2).sum(1)
            adc += lut[codes[:, m]]
        adc[qid] = np.inf
        order = np.lexsort((ids, adc))
        res["adc"].append(len(truth & set(ids[order[:10]])) / 10)
        for s in shortlists:
            cand = ids[order[:s]]
            dc = {i: d_exact[i] for i in cand}
            final = set(sorted(dc, key=lambda i: (dc[i], i))[:10])
            res[s].append(len(truth & final) / 10)
    return {k: round(sum(v) / len(v), 3) for k, v in res.items()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    shortlists = [int(a) for a in sys.argv[2:]] or [50, 100, 200]
    ids, mat = load(sf_dir)
    print(f"n={len(mat)} dim={mat.shape[1]} M={M_SUB} K={K} ({sf_dir})")
    print("| codebook | raw ADC | " + " | ".join(f"rescore@{s}" for s in shortlists) + " |")
    print("|---|---|" + "---|" * len(shortlists))
    for name, cb in (
        ("lowest-id (ann_pq pinned)", lowest_id_codebook(mat)),
        ("lloyd-trained", trained_codebook(mat)),
    ):
        r = sweep(ids, mat, cb, shortlists)
        cells = " | ".join(str(r[s]) for s in shortlists)
        print(f"| {name} | {r['adc']} | {cells} |")


if __name__ == "__main__":
    main()
