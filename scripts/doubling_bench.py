#!/usr/bin/env python
"""Same-JVM interleaved corpus-doubling measurement (VERDICT r4 item 7,
done under box noise).

The sandbox's effective CPU allotment swings run-to-run (same-day sha1
capacity cells have measured 0.59 s and 9.2 s for identical work), so
two corpus sizes benchmarked in separate sessions cannot be compared.
This script alternates builds of an N-dataset and a 2N-dataset corpus
INSIDE ONE JVM — same box state, same JIT warmth — with the sha1
capacity cell between every build, and reports the warm wall ratio.
A per-byte-flat engine shows ratio ~= 2.0 (plus a small fixed-cost
amortization discount); a superlinear bottleneck shows ratio >> 2.

Usage: python scripts/doubling_bench.py [kg_scale_low=32] [cpus=32] [rounds=2]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main():
    kg_scale_low = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    kg_scale_high = 2 * kg_scale_low

    from bench import build_session, capacity_sha1_sec
    from rdf_generator_spark import queries as Q
    from rdf_generator_spark.plans.pipeline import build_graph
    from rdf_generator_spark.sources.corpus import corpus_parquet_df
    from rdf_generator_spark.sources.synth import synth_corpus_rows

    # one session sized for the LARGER corpus (the auto rule caps at
    # 80% machine RAM)
    spark = build_session(cpus, kg_scale_high)
    spark.sparkContext.setLogLevel("ERROR")
    Q.ensure_workers_can_import(spark)

    corpora = {}
    for tag, scale in (("low", kg_scale_low), ("high", kg_scale_high)):
        rows = synth_corpus_rows(
            n_datasets=6 * scale, ntax=40, nchar=40, seed=1234,
            giant_every=6, giant_scale=3,
        )
        corpora[tag] = corpus_parquet_df(spark, rows)

    walls = {"low": [], "high": []}
    caps = []
    n_triples = {}
    for _ in range(rounds):
        for tag in ("low", "high"):
            caps.append(capacity_sha1_sec(spark))
            t0 = time.perf_counter()
            res = build_graph(spark, corpora[tag])
            n_triples[tag] = res["triples"].count()
            walls[tag].append(round(time.perf_counter() - t0, 2))
            print(json.dumps({"arm": tag, "sec": walls[tag][-1],
                              "cap": caps[-1]}), file=sys.stderr, flush=True)
    caps.append(capacity_sha1_sec(spark))

    best_low, best_high = min(walls["low"]), min(walls["high"])
    out = {
        "datasets_low": 6 * kg_scale_low,
        "datasets_high": 6 * kg_scale_high,
        "n_triples_low": n_triples["low"],
        "n_triples_high": n_triples["high"],
        "walls_low": walls["low"],
        "walls_high": walls["high"],
        "best_low": best_low,
        "best_high": best_high,
        "tps_low": round(n_triples["low"] / best_low, 1),
        "tps_high": round(n_triples["high"] / best_high, 1),
        "wall_ratio": round(best_high / best_low, 3),
        "capacity_cells": caps,
        "cap_spread": round(max(caps) / min(caps), 2),
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
