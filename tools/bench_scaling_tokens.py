"""Token-PIPELINE scaling evidence (companion to bench_scaling.py).

bench_scaling.py certifies the bucketizer path (salted trie cascade +
windows + subject pages). This harness certifies the TRAINING-DATA
path — the two distributed-scan operators every token pipeline leans
on, forced onto their at-scale forms (single_task_threshold=0, so the
test-SF single-task gate cannot hide the distributed machinery):

1. sequence packing: exclusive global prefix sum of per-doc token
   counts (operators/rank.with_global_prefix_sum — range partition on
   seq, P collected partial sums, broadcast exclusive prefix) + the
   bounded manifest explode (ceil(n/L)+1 rows per doc);
2. shuffle-shard: dense global permutation rank over a unique md5 key
   (with_global_rank0, same two-phase scheme; md5 keys are uniform by
   construction so the range partitioner gets no skew).

Same calibration job, interleave, and min-per-level protocol as
bench_scaling.py (imported from it); writes its own BASELINE.md
section, preserving every other harness's section.

Usage: python tools/bench_scaling_tokens.py [n_rows] [trials]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import (  # noqa: E402
    CALIB_WORKER,
    LEVELS,
    REPO,
    ensure_data,
    run,
)

TOKEN_WORKER = """
import json, sys, time
sys.path.insert(0, {repo!r})
from bucketizers_spark.plans.session import get_spark
from pyspark.sql import functions as F
from bucketizers_spark.operators.rank import (
    with_global_prefix_sum, with_global_rank0,
)
from bucketizers_spark.entry_queries import _pack_manifest

cores = int(sys.argv[1])
data = sys.argv[2]
L = 1024
spark = get_spark(f"scale-tok-{{cores}}", cores=cores, shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")
df = spark.read.parquet(data).repartition(64).persist()
n_rows = df.count()
n_tok = int(df.agg(F.sum("n_tok")).collect()[0][0])

t0 = time.time()
# 1) packing manifest via the forced-distributed exclusive prefix sum,
#    expanded by the SAME _pack_manifest the driver queries use
d = df.select("seq", "doc_id", F.col("n_tok").cast("long").alias("n_tok"))
o = with_global_prefix_sum(d, "seq", "n_tok", out_col="off",
                           single_task_threshold=0)
m = _pack_manifest(o, L).count()

# 2) shuffle-shard over a UNIQUE md5 key (doc ids repeat in the stream)
keyed = df.select(
    F.md5(F.concat_ws("\\x1f", "doc_id", F.col("seq").cast("string"))).alias("k")
)
r = with_global_rank0(keyed, "k", single_task_threshold=0).count()
dt = time.time() - t0
print(json.dumps(dict(cores=cores, rows=n_rows, tokens=n_tok, secs=dt,
                      rows_per_sec=n_rows/dt, tokens_per_sec=n_tok/dt,
                      outputs=[m, r])))
spark.stop()
"""

SECTION = "## Token-pipeline scaling (packing prefix sum + shuffle rank)"


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    data = ensure_data(n_rows)
    eng: dict[int, list[dict]] = {c: [] for c in LEVELS}
    cal: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for t in range(trials):
        for cores in LEVELS:
            c = run(CALIB_WORKER, cores)
            cal[cores].append(c)
            e = run(TOKEN_WORKER, cores, data)
            eng[cores].append(e)
            print(
                f"trial {t} local[{cores}]: calib {c['secs']:.1f}s | "
                f"pipeline {e['secs']:.1f}s ({e['tokens_per_sec']:,.0f} tok/s)",
                file=sys.stderr,
                flush=True,
            )
    outs = [r["outputs"] for rs in eng.values() for r in rs]
    assert all(o == outs[0] for o in outs), ("parallelism changed results!", outs)

    lo, hi = LEVELS
    best_e = {c: min(rs, key=lambda r: r["secs"]) for c, rs in eng.items()}
    best_c = {c: min(rs, key=lambda r: r["secs"]) for c, rs in cal.items()}
    eng_speedup = best_e[lo]["secs"] / best_e[hi]["secs"]
    cal_speedup = best_c[lo]["secs"] / best_c[hi]["secs"]
    summary = {
        "n_rows": n_rows,
        "trials": trials,
        "levels": list(LEVELS),
        "engine_best": {c: round(best_e[c]["secs"], 1) for c in LEVELS},
        "engine_all_secs": {
            c: [round(r["secs"], 1) for r in eng[c]] for c in LEVELS
        },
        "calib_best": {c: round(best_c[c]["secs"], 1) for c in LEVELS},
        "calib_all_secs": {
            c: [round(r["secs"], 1) for r in cal[c]] for c in LEVELS
        },
        "tok_per_sec": {c: round(best_e[c]["tokens_per_sec"]) for c in LEVELS},
        "engine_speedup": round(eng_speedup, 3),
        "calibration_speedup_ceiling": round(cal_speedup, 3),
        "raw_efficiency": round(eng_speedup / (hi / lo), 3),
        "normalized_efficiency": round(eng_speedup / cal_speedup, 3),
    }
    print(json.dumps(summary))
    write_section(summary)


def write_section(s: dict) -> None:
    lo, hi = s["levels"]
    md = f"""{SECTION}

The training-data operators at their FORCED-distributed scale forms
(single_task_threshold=0 — the test-SF single-task gate disabled):
exclusive global prefix sum of per-doc token counts → packing manifest
explode, then dense global permutation rank over a unique uniform md5
key. Same input ({s['n_rows']:,} sequences, FIXTURES.md F1), protocol
and calibration as the main harness; outputs pinned identical across
levels and trials.

| | local[{lo}] | local[{hi}] |
|---|---|---|
| pipeline best wall s | {s['engine_best'][lo]:.1f} | {s['engine_best'][hi]:.1f} |
| tokens/s | {s['tok_per_sec'][lo]:,} | {s['tok_per_sec'][hi]:,} |
| pipeline all trials (s) | {s['engine_all_secs'][lo]} | {s['engine_all_secs'][hi]} |
| calibration best wall s | {s['calib_best'][lo]:.1f} | {s['calib_best'][hi]:.1f} |
| calibration all trials (s) | {s['calib_all_secs'][lo]} | {s['calib_all_secs'][hi]} |

- pipeline speedup {lo}->{hi} cores: **{s['engine_speedup']:.2f}x**
- hardware ceiling (calibration) speedup: **{s['calibration_speedup_ceiling']:.2f}x**
- raw efficiency (speedup / 4): {s['raw_efficiency']:.3f}
- **normalized efficiency (pipeline / ceiling): {s['normalized_efficiency']:.3f}**

Reproduce: `python tools/bench_scaling_tokens.py {s['n_rows']} {s['trials']}`
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    old = open(path).read()
    if SECTION in old:
        # replace this harness's existing section (up to the next ## )
        start = old.index(SECTION)
        nxt = old.find("\n## ", start + 1)
        old = old[:start] + (old[nxt + 1 :] if nxt != -1 else "")
    # insert before the streaming section (or append)
    marker = "## Streaming end-to-end throughput"
    if marker in old:
        i = old.index(marker)
        new = old[:i] + md.rstrip() + "\n\n" + old[i:]
    else:
        new = old.rstrip() + "\n\n" + md
    with open(path, "w") as fh:
        fh.write(new)


if __name__ == "__main__":
    main()
