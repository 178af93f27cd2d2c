"""Deterministic sampling + sequence packing for training-data curation.

Both operators are pure functions of their inputs — no RNG state, no
partition-order dependence — so results are stable across retries,
repartitionings, and engines (each has an exact DuckDB twin in the
driver registry).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _hash32(key: Column, seed: int) -> Column:
    """First 32 bits of md5(seed:key) as a bigint in [0, 2^32)."""
    hx = F.md5(F.concat_ws(":", F.lit(str(seed)), key.cast("string")))
    return F.conv(F.substring(hx, 1, 8), 16, 10).cast("bigint")


def deterministic_sample(
    df: DataFrame,
    fraction: float,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Seeded Bernoulli sample: keep rows where the 32-bit md5 prefix of
    (seed, key) falls under fraction * 2^32.

    Unlike ``df.sample()``, membership is a pure function of
    (seed, key): re-running, repartitioning, or recomputing a lost
    partition selects the SAME rows — the property a resumable
    training-data pipeline needs. Per-row hash, no shuffle; the filter
    stays in whole-stage codegen."""
    threshold = int(fraction * (1 << 32))
    return df.filter(_hash32(F.col(key_col), seed) < F.lit(threshold))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    cap: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Deterministic per-stratum quota (the training-mix shape: at most
    ``cap`` documents per source/domain/language bucket): keep the
    ``cap`` rows of each stratum with the smallest md5(seed:key), ties
    broken by the key itself.

    Like `deterministic_sample`, selection is a pure function of
    (seed, key) — retries, repartitionings, and resumed jobs pick the
    identical rows, and growing a stratum only ever displaces rows at
    the quota boundary. One shuffle on the stratum key; the rank
    window sorts within a stratum only. For strata so large that even
    one stratum's sort is a straggler, pre-thin with
    `deterministic_sample(fraction ~ cap/stratum_estimate)` first —
    composition preserves determinism."""
    hx = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(key_col).cast("string")))
    w = Window.partitionBy(strata_col).orderBy(hx, F.col(key_col))
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= cap)
        .drop("__rk")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 32,
) -> DataFrame:
    """Assign documents to token-budget packs (context-window shards)
    of ~``max_tokens`` whitespace tokens each.

    Packing needs a running token total, i.e. a prefix sum — a single
    global window would funnel the corpus through one task. Instead the
    corpus is hash-bucketed (``buckets`` independent streams; packs
    never span buckets, which is fine — packs are independent units by
    construction) and the prefix sum runs per bucket: each bucket is
    one sort-based window task over corpus/buckets rows, so parallelism
    and memory both scale with the bucket count. A document lands in
    pack floor(preceding_total / max_tokens) of its bucket; packs can
    overflow by at most one document (standard streaming-packing
    semantics; no document is split).

    Returns (id, bucket, pack_id, n_tokens)."""
    toks = F.size(F.split(F.col(text_col), r"\s+"))
    b = F.pmod(_hash32(F.col(id_col), seed=0), F.lit(buckets)).cast("int")
    base = df.select(
        F.col(id_col), b.alias("bucket"), toks.cast("bigint").alias("n_tokens")
    )
    w = (
        Window.partitionBy("bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint"))
    return base.select(
        id_col, "bucket",
        F.floor(prev / max_tokens).cast("bigint").alias("pack_id"),
        "n_tokens",
    )
