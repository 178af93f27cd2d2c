"""Text analysis operators: language-ID, quality scoring, token counting,
document fingerprinting. All built-in expressions; one aggregation per
operator at most."""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_STOPWORDS_EN = [
    "the", "a", "an", "of", "and", "to", "in", "is", "it", "that", "for",
    "on", "with", "as", "was", "at", "by", "this",
]
_STOPWORDS_ES = ["el", "la", "de", "que", "y", "en", "un", "una", "es", "por"]
_STOPWORDS_FR = ["le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"]


def token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Whitespace + BPE-ish subword counts per document, no explode —
    array algebra on the split column."""
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    # BPE-ish: alpha runs, digit runs, and punctuation singles
    pieces = F.expr(
        f"regexp_extract_all({text_col}, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"
    )
    return df.select(
        F.col(id_col),
        F.size(toks).alias("n_ws_tokens"),
        F.size(F.array_distinct(toks)).alias("n_uniq_tokens"),
        F.size(pieces).alias("n_subword_tokens"),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def lang_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess (en/es/fr/other) — the n-gram
    heuristic tier; a model-based ID would slot in as a Pandas UDF."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: t != "")

    def hits(words: List[str]):
        arr = F.array(*[F.lit(w) for w in words])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    out = df.select(
        F.col(id_col),
        F.size(toks).alias("n"),
        hits(_STOPWORDS_EN).alias("en_hits"),
        hits(_STOPWORDS_ES).alias("es_hits"),
        hits(_STOPWORDS_FR).alias("fr_hits"),
    )
    best = F.greatest("en_hits", "es_hits", "fr_hits")
    return out.select(
        id_col, "n", "en_hits", "es_hits", "fr_hits",
        F.when(best * 20 < F.col("n"), "other")
        .when(F.col("en_hits") == best, "en")
        .when(F.col("es_hits") == best, "es")
        .otherwise("fr")
        .alias("lang_guess"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean word length, punctuation
    and stopword ratios, repetition; score in [0, 100]."""
    # integer-exact arithmetic throughout: scaled ratios use integral
    # division and threshold tests are cross-multiplied, so results are
    # bit-identical across engines (no float rounding mode issues)
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    n_chars = F.length(F.col(text_col))
    sum_wordlen = n_chars - n + 1
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(w) for w in _STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, F.lower(t))))
    n_uniq = F.size(F.array_distinct(toks))
    score = (
        F.when(n < 5, 0).otherwise(25)
        + F.when((sum_wordlen >= 3 * n1) & (sum_wordlen <= 12 * n1), 25).otherwise(0)
        + F.when(n_punct * 5 < n_chars, 25).otherwise(0)
        + F.when(10 * n_uniq >= 3 * n1, 25).otherwise(0)
    )
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        F.floor(100 * sum_wordlen.cast("bigint") / n1).cast("bigint").alias("mean_wordlen_x100"),
        F.floor(1000 * n_uniq.cast("bigint") / n1).cast("bigint").alias("uniq_ratio_x1000"),
        score.cast("int").alias("quality_score"),
    )


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    window: Optional[int] = None, shingle_hash: str = "xxhash64",
) -> DataFrame:
    """Document fingerprints: normalized-content hash plus a winnowing-
    style rolling selection — the minimum shingle hash per fixed-size
    window (robust to local edits).

    `shingle_hash`: "xxhash64" (default, fastest — JVM long hash) or
    "md5" (hex-string min; slower but reproducible in engines without
    xxhash64, used by the DuckDB correctness oracle). The winnowed set
    is sorted before hashing so the fingerprint is order-canonical."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    base = df.select(F.col(id_col), F.md5(norm).alias("content_fp"), norm.alias("__n"))
    if not window:
        return base.drop("__n")
    toks = F.split(F.col("__n"), " ")
    k = 3
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - k, F.lit(0)))
    hash_fn = F.xxhash64 if shingle_hash == "xxhash64" else F.md5
    sh_hashes = F.transform(
        idx, lambda i: hash_fn(F.array_join(F.slice(toks, i + 1, k), " "))
    )
    widx = F.sequence(
        F.lit(0),
        F.greatest((F.size(sh_hashes) - window), F.lit(0)),
    )
    winnowed = F.array_sort(F.array_distinct(
        F.transform(widx, lambda i: F.array_min(F.slice(sh_hashes, i + 1, window)))
    ))
    return base.select(
        id_col, "content_fp", F.size(winnowed).alias("n_winnowed"),
        F.md5(F.array_join(F.transform(winnowed, lambda x: x.cast("string")), ",")).alias("winnow_fp"),
    )


# ---------------------------------------------------------------------------
# Corpus-curation extras: PII redaction and benchmark decontamination.
# ---------------------------------------------------------------------------

# Patterns deliberately avoid lookarounds so Java regex (Spark) and RE2
# (DuckDB oracle) agree byte-for-byte.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"),
    ("phone", r"\+[0-9]{7,15}\b"),
]


def redact_pii(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Redact emails / IPv4s / international phone numbers to typed
    placeholders and count matches per category — the standard pre-
    training scrub. Pure regexp column algebra (one narrow pass, no
    shuffle); patterns are lookaround-free so they behave identically
    in engines using RE2."""
    out = df
    redacted = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), F.lit(0)))
            .cast("int").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, f"[{name.upper()}]")
    return out.select(
        F.col(id_col), *counts, redacted.alias("redacted_text")
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 2,
    top_n: int = 1000,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus token vocabulary (the tokenizer-building shape): global
    whitespace-token counts -> ``min_count`` floor -> deterministic
    top-``top_n`` ranked by (count desc, token asc).

    Scale shape: the single shuffle is the token groupBy, bounded by
    the distinct-token count with map-side partial aggregation; the
    top-N compiles to TakeOrderedAndProject (per-partition partial
    top-N merged on the driver — no global sort, no single-partition
    window), and the rank window runs over <= top_n surviving rows.
    """
    from pyspark.sql.window import Window

    toks = df.select(
        F.explode(
            F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    if lowercase:
        toks = toks.select(F.lower(F.col("tok")).alias("tok"))
    counts = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    top = counts.orderBy(F.desc("cnt"), "tok").limit(top_n)
    w = Window.orderBy(F.desc("cnt"), "tok")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "rank", "tok", "cnt"
    )


def repetition_score(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document n-gram repetition (the C4/RefinedWeb-style
    boilerplate signal): per document, total vs distinct n-gram
    occurrences and the duplicated fraction, integer-exact
    (``dup_ratio_x1000 = floor(1000*(total-distinct)/total)``).

    Pure per-row array algebra — no explode, no shuffle; follows the
    same short-document convention as `fingerprint` (documents shorter
    than ``n`` tokens yield one truncated gram), so the DuckDB twin is
    bit-identical.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    grams = F.transform(
        idx, lambda i: F.array_join(F.slice(toks, i + 1, n), " ")
    )
    total = F.size(grams)
    distinct = F.size(F.array_distinct(grams))
    return df.select(
        F.col(id_col),
        total.alias("n_ngrams"),
        distinct.alias("n_uniq_ngrams"),
        F.floor(
            1000 * (total - distinct).cast("bigint")
            / F.greatest(total, F.lit(1))
        ).cast("bigint").alias("dup_ratio_x1000"),
    )


def contamination_pairs(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "bench_id",
    bench_text_col: str = "text",
) -> DataFrame:
    """Benchmark decontamination: (doc_id, bench_id, n_shared) for every
    document sharing at least one n-gram shingle with a benchmark row
    (the standard 13-gram test-set-leak check).

    Scale shape: shingles of the (small) benchmark side broadcast; the
    corpus side streams through one narrow shingle pass and the join —
    pair fan-out is bounded by benchmark shingles, never corpus^2."""
    from rdf_generator_spark.textops.dedupe import _shingles

    d = _shingles(docs, id_col, text_col, n)
    b = _shingles(benchmark, bench_id_col, bench_text_col, n).select(
        F.col("doc_id").alias("bench_id"), "tok"
    )
    return (
        d.join(F.broadcast(b), "tok")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_shared: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop documents sharing >= min_shared n-gram shingles with the
    benchmark (left-anti join on the contamination pairs)."""
    bad = (
        contamination_pairs(docs, benchmark, n, id_col, text_col)
        .groupBy("doc_id")
        .agg(F.sum("n_shared").alias("t"))
        .filter(F.col("t") >= min_shared)
        .select(F.col("doc_id").alias(id_col))
    )
    return docs.join(bad, id_col, "left_anti")
