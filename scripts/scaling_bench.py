"""Throughput scaling evidence for the north rule's N vs 4N criterion.

No real cluster exists in this sandbox, so the same extraction job runs
at several parallelism levels — headline pair local[2] (N) vs local[8]
(4N), plus local[32] to document this VM's memory-bandwidth wall — over
the SAME materialized corpus, each run in a fresh JVM (subprocess).
Levels are interleaved across rounds and the min is taken, because the
shared host shows up-to-1.5x run-to-run noise. Timed region = the
extraction action only into a noop sink (no JVM startup, no sink I/O).

Efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4; the rule requires
>= 0.8. Results are written to BENCH.md.

Usage: python scripts/scaling_bench.py [--n-docs 60000] [--runs 4]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/scaling_corpus.parquet"

_JOB = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from stirling_pdf_spark.session import get_spark
from stirling_pdf_spark.operators.extract_pipeline import extract_spans
spark = get_spark("scaling", cores={cores}, shuffle_partitions={cores})
docs = spark.read.parquet({corpus!r})
# warm-up: JIT, Python worker fork, Arrow codepaths (small slice)
extract_spans(docs.limit(512), num_partitions={cores}).count()
results = []
for _ in range({runs}):
    t0 = time.time()
    extract_spans(docs, num_partitions={cores} * 2).write.format(
        "noop").mode("overwrite").save()
    results.append(time.time() - t0)
n_docs = docs.count()
print("RESULT " + json.dumps({{"cores": {cores}, "n_docs": n_docs,
                               "secs": results}}))
spark.stop()
"""


def run_level(cores: int, runs: int) -> dict:
    code = _JOB.format(repo=REPO, cores=cores, corpus=CORPUS, runs=runs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=3600)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"no RESULT from cores={cores}:\n{out.stdout[-2000:]}"
                       f"\n{out.stderr[-2000:]}")


def run_levels_interleaved(levels: tuple, rounds: int) -> dict:
    """One fresh-JVM run per (round, level), levels interleaved within a
    round so shared-host noise (this sandbox VM has noisy neighbors —
    consecutive identical runs vary up to 1.5x) biases every level
    equally; min over rounds approximates the quiet machine."""
    secs: dict[int, list] = {c: [] for c in levels}
    n_docs = 0
    for _ in range(rounds):
        for cores in levels:
            r = run_level(cores, 1)
            secs[cores].extend(r["secs"])
            n_docs = r["n_docs"]
    return {c: {"secs": [round(s, 2) for s in secs[c]],
                "best_s": round(min(secs[c]), 2),
                "docs_per_sec": round(n_docs / min(secs[c]), 1),
                "n_docs": n_docs} for c in levels}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-docs", type=int, default=60000)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    if not os.path.exists(CORPUS):
        code = f"""
import sys; sys.path.insert(0, {REPO!r})
from stirling_pdf_spark.session import get_spark
from stirling_pdf_spark.corpus.spark_synth import synth_docs_df
spark = get_spark("synth", cores=32)
synth_docs_df(spark, {args.n_docs}, seed=42, mega_pages=(300, 400),
              num_partitions=64).write.parquet({CORPUS!r})
spark.stop()
"""
        subprocess.run([sys.executable, "-c", code], check=True, timeout=1800,
                       capture_output=True, text=True)

    levels = run_levels_interleaved((2, 8, 32), args.runs)
    for cores, lv in levels.items():
        print(f"local[{cores}]: {lv}")

    eff_2_8 = (levels[8]["docs_per_sec"] / levels[2]["docs_per_sec"]) / 4.0
    eff_8_32 = (levels[32]["docs_per_sec"] / levels[8]["docs_per_sec"]) / 4.0
    summary = {"levels": levels,
               "scaling_efficiency_2_to_8": round(eff_2_8, 3),
               "scaling_efficiency_8_to_32": round(eff_8_32, 3)}
    print(json.dumps(summary))

    out_path = os.path.join(REPO, "SCALING.json")
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"wrote {out_path}; update the BENCH.md table by hand "
          "(BENCH.md carries narrative sections this script must not "
          "clobber)")


if __name__ == "__main__":
    main()
