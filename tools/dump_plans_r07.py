"""Dump .explain('formatted') for the r07-touched queries.

Usage: python tools/dump_plans_r07.py <repo_root> <out_dir> <suffix> [sf_dir]
Writes <out_dir>/<query>_<suffix>.txt for each touched query, importing
the engine from <repo_root> (so a git worktree of the round-start commit
produces the 'before' plans).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

TOUCHED = [
    "semdedup", "ann_ivf", "ann_ivf_kmeans", "ann_topk", "ann_int8",
    "knn_classify", "ann_pq", "ann_pq_rescore", "ann_ivfpq",
    "emb_near_dup", "substring_trie", "substring_trie_relations",
    "token_prefix_trie", "multi_source_trie", "multi_giant_parent_trie",
    "dedup_minhash", "ngram_jaccard", "dedup_cluster", "decontaminate",
    "segment_dedup", "segment_dedup_cdc", "ngram_diversity",
    "ngram_topk", "pmi_bigrams", "basic_pager", "fallback_pager",
    "lm_score",
]


def main() -> None:
    repo_root, out_dir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    sys.path.insert(0, repo_root)
    os.makedirs(out_dir, exist_ok=True)

    from bucketizers_spark.entry_queries import QUERIES
    from bucketizers_spark.plans.session import get_spark

    spark = get_spark("plans-r07", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in TOUCHED:
        try:
            df = QUERIES[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as exc:  # pragma: no cover
            plan = f"ERROR: {exc}\n"
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as fh:
            fh.write(plan)
        print(f"# {name}_{suffix}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
