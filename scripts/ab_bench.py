#!/usr/bin/env python
"""Interleaved code-A/B bench (VERDICT r4 item 1): settle whether the
round-4 local[32] kg_pipeline slide (44.2 s -> 78.0 s) was code or box
state.

Runs the kg cell (bench.py protocol: 24-dataset synthetic corpus,
best-of-3 inside one fresh JVM at local[32]) ALTERNATELY against two
checkouts — interleaved A B A B A B, so slow box drift hits both arms
equally — and brackets every kg block with the sha1 capacity
microbenchmark (same cell scaling_bench.py and bench.py use) so each
block can be normalized against the box state at the moment it ran.

Usage:
    python scripts/ab_bench.py /path/to/checkoutA /path/to/checkoutB \
        [blocks=3] [cpus=32] [kg_scale=4]

Prints one JSON line with per-block raw seconds, per-block capacity
seconds, and capacity-normalized ratios per arm.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

KG_SNIPPET = r"""
import time, json, sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[{cpus}]")
    .config("spark.sql.shuffle.partitions", "{parts}")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.driver.memory", "12g")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "4m")
    .config("spark.sql.files.openCostInBytes", "4m")
    .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from rdf_generator_spark.sources.corpus import corpus_parquet_df
from rdf_generator_spark.sources.synth import synth_corpus_rows
from rdf_generator_spark.plans.pipeline import build_graph
rows = synth_corpus_rows(n_datasets={nds}, ntax=40, nchar=40, seed=1234,
                         giant_every=6, giant_scale=3)
corpus = corpus_parquet_df(spark, rows)
times = []
n = 0
for _ in range(3):
    t0 = time.perf_counter()
    res = build_graph(spark, corpus)
    n = res["triples"].count()
    times.append(round(time.perf_counter() - t0, 2))
print(json.dumps({{"n_triples": n, "sec": min(times), "ladder": times}}))
spark.stop()
"""

CAP_SNIPPET = r"""
import time, json
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master("local[{cpus}]")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "8g").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
df = spark.range(0, 40_000_000, 1, 64)
t0 = time.perf_counter()
n = df.select(F.sha1(F.col("id").cast("string").cast("binary")).alias("h")).filter(
    F.col("h").startswith("0000")).count()
print(json.dumps({{"n": n, "sec": round(time.perf_counter()-t0, 2)}}))
spark.stop()
"""


def run_py(code: str, pythonpath: str) -> dict:
    env = dict(os.environ, PYTHONPATH=pythonpath)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"no JSON from subprocess:\n{out.stderr[-2000:]}")
    return json.loads(lines[-1])


def main():
    path_a = os.path.abspath(sys.argv[1])
    path_b = os.path.abspath(sys.argv[2])
    blocks = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cpus = int(sys.argv[4]) if len(sys.argv) > 4 else 32
    kg_scale = int(sys.argv[5]) if len(sys.argv) > 5 else 4
    nds = 6 * kg_scale
    kg_code = KG_SNIPPET.format(cpus=cpus, parts=2 * cpus, nds=nds)
    cap_code = CAP_SNIPPET.format(cpus=cpus)

    results = {"A": [], "B": []}
    arms = [("A", path_a), ("B", path_b)]
    for blk in range(blocks):
        for arm, path in arms:
            cap_before = run_py(cap_code, path)["sec"]
            kg = run_py(kg_code, path)
            cap_after = run_py(cap_code, path)["sec"]
            cap = min(cap_before, cap_after)
            rec = {
                "block": blk,
                "sec": kg["sec"],
                "ladder": kg["ladder"],
                "n_triples": kg["n_triples"],
                "cap_before": cap_before,
                "cap_after": cap_after,
                "norm": round(kg["sec"] / cap, 3),
            }
            results[arm].append(rec)
            print(json.dumps({"arm": arm, **rec}), file=sys.stderr, flush=True)

    def summarize(recs):
        best = min(r["sec"] for r in recs)
        best_norm = min(r["norm"] for r in recs)
        return {"best_sec": best, "best_norm": best_norm,
                "secs": [r["sec"] for r in recs],
                "norms": [r["norm"] for r in recs]}

    out = {
        "protocol": f"interleaved A/B, {blocks} blocks, local[{cpus}], "
                    f"{nds} datasets, best-of-3 per block, capacity cell "
                    "before+after each block (min of the two used for norm)",
        "A": {"path": path_a, **summarize(results["A"])},
        "B": {"path": path_b, **summarize(results["B"])},
        "blocks": results,
    }
    a, b = out["A"], out["B"]
    out["raw_ratio_B_over_A"] = round(b["best_sec"] / a["best_sec"], 3)
    out["norm_ratio_B_over_A"] = round(b["best_norm"] / a["best_norm"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
