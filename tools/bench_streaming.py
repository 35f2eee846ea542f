"""END-TO-END STREAMING throughput at two parallelism levels — the
north_rule metric verbatim: "sequences/sec (and tokens/sec) bucketized
end-to-end … with exactly-once sink".

The measured job is the full streaming trie pipeline, not a batch
operator: chunked seq-ordered parquet (the Iceberg-snapshot stand-in,
sources/stream.py) → file-stream source (one chunk per micro-batch) →
TrieStreamJob (salted token-prefix cascade with versioned cross-batch
counters) → IdempotentParquetSink (manifest-committed, replay-safe).
Wall time runs from query start until every staged chunk is processed
and committed; rows/s = total sequences / that wall time, so source
scan, state carry, relation emission, and sink commit are all inside
the measurement.

Same two-level methodology as tools/bench_scaling.py (driver
instruction: evidence the two-cluster-size criterion at two parallelism
levels on the same input): local[N] vs local[4N], fresh JVM per run,
interleaved trials, min per level, plus the md5 calibration ceiling so
the engine's scaling is separable from the box's (see BENCH/BASELINE.md
"Hardware ceiling calibration").

Writes/updates the "Streaming end-to-end throughput" section of
BENCH/BASELINE.md. Usage: python tools/bench_streaming.py [n_rows]
[n_chunks] [trials]
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

sys.path.insert(0, REPO)
from tools.bench_scaling import CALIB_WORKER, ensure_data  # noqa: E402

LEVELS = (8, 32)

STREAM_WORKER = """
import json, os, shutil, sys, time, uuid
sys.path.insert(0, {repo!r})
from bucketizers_spark.plans.session import get_spark
from pyspark.sql import functions as F
from bucketizers_spark.sources.stream import read_token_stream, stage_chunks
from bucketizers_spark.streaming.trie_stream import TrieStreamJob

cores = int(sys.argv[1])
data = sys.argv[2]
n_chunks = int(sys.argv[3])
spark = get_spark(f"bench-stream-{{cores}}", cores=cores,
                  shuffle_partitions=cores)
spark.sparkContext.setLogLevel("ERROR")

wd = os.path.join({repo!r}, ".scratch", f"bstream_{{uuid.uuid4().hex[:8]}}")
os.makedirs(wd, exist_ok=True)
pdf = None
import pandas as pd
pdf = pd.read_parquet(data)
chunk_dir = os.path.join(wd, "chunks")
stage_chunks(pdf, chunk_dir, n_chunks=n_chunks)
n_rows = len(pdf)
n_tok = int(pdf["n_tok"].sum())
del pdf

# tail_threshold=0: ALL levels distributed (pure JVM). The grouped-walk
# tail wins in batch mode where groups are few and heavy; a token-chain
# micro-batch shatters into tens of thousands of tiny level-L groups and
# the per-group applyInPandas overhead dominates (measured 35s -> 18s per
# 250k batch; BENCH/PLANS.md "streaming trie tail")
job = TrieStreamJob(
    os.path.join(wd, "sink"), os.path.join(wd, "state"),
    mode="token", value_col="tokens", page_size=200, max_depth=6,
    salt_buckets=64, tail_threshold=0,
)
stream = read_token_stream(spark, chunk_dir, max_files_per_trigger=1)
t0 = time.time()
q = job.start(stream, os.path.join(wd, "ckpt"))
q.processAllAvailable()
q.stop()
dt = time.time() - t0
sunk = job.sink.read_all(spark).count()
assert sunk == n_rows, (sunk, n_rows)
print(json.dumps(dict(cores=cores, rows=n_rows, tokens=n_tok, secs=dt,
                      rows_per_sec=n_rows / dt, tokens_per_sec=n_tok / dt,
                      sunk=sunk)))
spark.stop()
shutil.rmtree(wd, ignore_errors=True)
"""


def run(worker: str, cores: int, *args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", worker.format(repo=REPO), str(cores), *args],
        capture_output=True, text=True, check=True, cwd=REPO,
    )
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    data = ensure_data(n_rows)
    eng: dict[int, list[dict]] = {c: [] for c in LEVELS}
    cal: dict[int, list[dict]] = {c: [] for c in LEVELS}
    for t in range(trials):
        for cores in LEVELS:
            c = run(CALIB_WORKER, cores)
            cal[cores].append(c)
            e = run(STREAM_WORKER, cores, data, str(n_chunks))
            eng[cores].append(e)
            print(
                f"trial {t} local[{cores}]: calib {c['secs']:.1f}s | "
                f"stream {e['secs']:.1f}s ({e['rows_per_sec']:,.0f} seq/s, "
                f"{e['tokens_per_sec']:,.0f} tok/s)",
                file=sys.stderr, flush=True,
            )
    lo, hi = LEVELS
    best_e = {c: min(rs, key=lambda r: r["secs"]) for c, rs in eng.items()}
    best_c = {c: min(rs, key=lambda r: r["secs"]) for c, rs in cal.items()}
    eng_speedup = best_e[lo]["secs"] / best_e[hi]["secs"]
    cal_speedup = best_c[lo]["secs"] / best_c[hi]["secs"]
    summary = {
        "n_rows": n_rows,
        "n_chunks": n_chunks,
        "trials": trials,
        "levels": list(LEVELS),
        "stream_best": {c: round(best_e[c]["secs"], 1) for c in LEVELS},
        "stream_all_secs": {
            c: [round(r["secs"], 1) for r in eng[c]] for c in LEVELS
        },
        "calib_best": {c: round(best_c[c]["secs"], 1) for c in LEVELS},
        "seq_per_sec": {c: round(best_e[c]["rows_per_sec"]) for c in LEVELS},
        "tok_per_sec": {c: round(best_e[c]["tokens_per_sec"]) for c in LEVELS},
        "engine_speedup": round(eng_speedup, 3),
        "calibration_speedup_ceiling": round(cal_speedup, 3),
        "raw_efficiency": round(eng_speedup / (hi / lo), 3),
        "normalized_efficiency": round(
            eng_speedup / cal_speedup, 3
        ) if cal_speedup else None,
    }
    print(json.dumps(summary))
    write_section(summary)


def write_section(s: dict) -> None:
    lo, hi = s["levels"]
    sec = f"""## Streaming end-to-end throughput (exactly-once sink)

The north_rule metric measured verbatim on the STREAMING path: chunked
seq-ordered parquet ({s['n_chunks']} micro-batches, Iceberg-snapshot
stand-in) → file-stream source → TrieStreamJob (salted token-prefix
cascade, salt 64, page 200, versioned cross-batch counters) →
IdempotentParquetSink (manifest-committed; sink row count asserted ==
input). Wall time covers query start → all batches committed, so state
carry, relation emission, and sink commits are inside the number.
local[{lo}] vs local[{hi}], fresh JVM per run, {s['trials']} interleaved
trials, min per level ({s['n_rows']:,} sequences).

| | local[{lo}] | local[{hi}] |
|---|---|---|
| stream best wall s | {s['stream_best'][lo]:.1f} | {s['stream_best'][hi]:.1f} |
| sequences/s | {s['seq_per_sec'][lo]:,} | {s['seq_per_sec'][hi]:,} |
| tokens/s | {s['tok_per_sec'][lo]:,} | {s['tok_per_sec'][hi]:,} |
| stream all trials (s) | {s['stream_all_secs'][lo]} | {s['stream_all_secs'][hi]} |
| calibration best wall s | {s['calib_best'][lo]:.1f} | {s['calib_best'][hi]:.1f} |

- stream speedup {lo}→{hi} cores: **{s['engine_speedup']:.2f}x**
- hardware ceiling (calibration) speedup: **{s['calibration_speedup_ceiling']:.2f}x**
- raw efficiency (speedup / 4): {s['raw_efficiency']:.3f}
- **normalized efficiency (stream / ceiling): {s['normalized_efficiency']:.3f}**

Reading: micro-batch streaming carries a per-batch serial fraction
batch mode does not — offset commits, versioned counter-state writes,
sink manifest commits, and one fixed job train per cascade level
(~{s['n_chunks']}× each). At this batch size that fraction dominates
BOTH parallelism levels (neither the stream nor the calibration speeds
up on this box), so the two-level comparison reads flat-on-flat; the
data-proportional work inside each batch is exactly the batch cascade,
whose scaling the thread-level harness above measures (normalized
0.94). The fixed fraction shrinks linearly as batches grow — at 10^12
scale a micro-batch is GBs, not 250k rows. Config note: the streaming
job runs tail_threshold=0 (all-distributed levels) — the batch-default
grouped-walk tail is 2x slower per micro-batch (BENCH/PLANS.md
"Streaming trie tail").

Reproduce: `python tools/bench_streaming.py {s['n_rows']} {s['n_chunks']} {s['trials']}`
"""
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    text = open(path).read()
    marker = "## Streaming end-to-end throughput"
    if marker in text:
        text = re.sub(
            re.escape(marker) + r".*?(?=\n## |\Z)", sec, text, flags=re.S
        )
    else:
        # keep the process-isolated section last for narrative flow
        pmark = "## Process-isolated executor scaling"
        if pmark in text:
            idx = text.index(pmark)
            text = text[:idx] + sec + "\n" + text[idx:]
        else:
            text = text.rstrip() + "\n\n" + sec
    with open(path, "w") as fh:
        fh.write(text)


if __name__ == "__main__":
    main()
