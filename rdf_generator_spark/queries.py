"""Driver-contract query registry: Spark impls + DuckDB oracle SQL.

Each entry maps a SURVEY.md §2 operator (or a training-data-pipeline
operator) onto the driver's relational testdata
(/root/testdata/sf*/: region nation customer supplier part orders
lineitem events documents embeddings). Numeric outputs are integers
(cents / scaled) so the value-hash comparison is immune to float
formatting; every computed column is aliased identically on both sides.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Callable, Dict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_PKG_ZIP_SENT = False


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to executors (PYTHONPATH-independent), once."""
    global _PKG_ZIP_SENT
    if _PKG_ZIP_SENT:
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_base = os.path.join(tempfile.gettempdir(), "rdf_generator_spark_pkg")
    zip_path = shutil.make_archive(zip_base, "zip", os.path.dirname(pkg_dir),
                                   os.path.basename(pkg_dir))
    spark.sparkContext.addPyFile(zip_path)
    _PKG_ZIP_SENT = True


# --------------------------------------------------------------------------
# Suite consolidation helpers (driver-window budget): a suite entry
# UNION ALLs its member queries, stringifying each member row as
# (op, out) on BOTH engines. Column values are '|'-joined with a '\N'
# null sentinel; to keep column boundaries unambiguous (a value
# containing '|' or a literal '\N' must not shift fields or collide
# with NULL), every value is escaped first: '\' -> '\\', then
# '|' -> '\|'. Escaped data can never produce a bare '\N' (its
# backslash doubles), so the sentinel stays unambiguous too.
# --------------------------------------------------------------------------

def _suite_esc_col(c):
    e = F.replace(c.cast("string"), F.lit("\\"), F.lit("\\\\"))
    e = F.replace(e, F.lit("|"), F.lit("\\|"))
    return F.coalesce(e, F.lit("\\N"))


def _suite_esc_sql(expr: str) -> str:
    return (
        "COALESCE(replace(replace(CAST(" + expr + " AS VARCHAR), "
        "'\\', '\\\\'), '|', '\\|'), '\\N')"
    )


def make_suite_query(specs):
    """specs: [(member_fn, [out_col, ...]), ...] -> one suite callable."""

    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        out = None
        for fn, cols in specs:
            d = fn(spark, sf_dir).select(
                F.lit(fn.__name__).alias("op"),
                F.concat_ws(
                    "|", *[_suite_esc_col(F.col(c)) for c in cols]
                ).alias("out"),
            )
            out = d if out is None else out.unionByName(d)
        return out

    return q


def make_suite_oracle(specs, oracles) -> str:
    parts = []
    for fn, cols in specs:
        inner = oracles[fn.__name__]
        cc = " || '|' || ".join(_suite_esc_sql(c) for c in cols)
        parts.append(
            f"SELECT '{fn.__name__}' AS op, {cc} AS out "
            f"FROM ({inner}) AS sub_{fn.__name__}"
        )
    return "\nUNION ALL\n".join(parts)


# --------------------------------------------------------------------------
# KG-operator analogues over the relational testdata
# --------------------------------------------------------------------------

def j1_broadcast_fill(spark, sf_dir):
    """J1 entity linking: broadcast dimension join filling 'missing' values."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    out = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return out.select(
        "c_custkey",
        F.when(F.col("c_mktsegment") == "BUILDING", F.col("n_name"))
        .otherwise(F.col("c_mktsegment"))
        .alias("filled_label"),
    )


def j2_first_wins_index(spark, sf_dir):
    """J2 first-wins label index via row_number window."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("props").alias("first_props"))
    )


def j3_dual_key_match(spark, sf_dir):
    """J3 dual-key species match: first record matching either key.

    Spark side uses a union of two equi-joins (shuffle-friendly) instead
    of an OR-join; results are identical."""
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    m1 = c.join(s, c.c_custkey == s.s_suppkey).select("c_custkey", "s_suppkey")
    m2 = c.join(s, c.c_nationkey == s.s_nationkey).select("c_custkey", "s_suppkey")
    return (
        m1.unionByName(m2)
        .groupBy("c_custkey")
        .agg(F.min("s_suppkey").alias("matched_supp"))
    )


def j5_symbol_state_join(spark, sf_dir):
    """J5 cell-symbol -> state join with invalid-symbol filtering.

    The symbol extraction is ONE fused expression: the old
    filter(rlike) + cast shape evaluated get_json_object three times
    per row once the filter was pushed below the projection (rlike,
    the inferred null-check, and the cast). The anchored
    regexp_extract returns '' (-> try_cast NULL) for non-^\\d+$
    symbols, and the inner equi-join drops NULL keys, so the kept-row
    set is identical to the explicit rlike filter."""
    e = _t(spark, sf_dir, "events")
    s = _t(spark, sf_dir, "supplier")
    idx = F.regexp_extract(
        F.get_json_object("props", "$.k"), r"^(\d+)$", 1
    ).try_cast("int")
    return (
        e.select(idx.alias("idx"), "value")
        .join(s, F.col("idx") == s.s_suppkey)
        .groupBy("s_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v_cents"),
        )
    )


def a1_first_label_wins(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderkey").alias("first_orderkey"))
    )


def a2_sequential_counters(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.concat(F.lit("order:id-"), F.row_number().over(w)).alias("seq_label"),
    )


def a3_set_dedup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_returnflag", "l_linestatus", F.col("l_quantity").cast("int").alias("qty")
    ).distinct()


def a5_prune_anti_join(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    # distinct before the anti-join's build side (round 6, guide §3.1):
    # anti-join semantics only test key membership, and the planner was
    # broadcasting the RAW fact-table key column — 10x the rows (and at
    # scale, a fact-sized broadcast). The distinct partially aggregates
    # map-side, so the exchange and the broadcast carry unique keys
    # only. Same result set; 0.73 -> 0.59 s on a 10x lineitem replica.
    li = (
        _t(spark, sf_dir, "lineitem")
        .select(F.col("l_partkey").alias("p_partkey"))
        .distinct()
    )
    return p.join(li, "p_partkey", "left_anti").select("p_partkey")


def j6_label_priority(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    out = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    return out.select(
        "c_custkey",
        F.coalesce(
            F.when(F.col("n_regionkey") < 2, F.col("n_name")), F.col("c_name")
        ).alias("label"),
    )


def f2_variant_fanout(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    variants = F.when(
        F.col("o_orderstatus") == "O", F.array(F.lit("female"), F.lit("male"))
    ).otherwise(F.array(F.lit("base")))
    return o.select("o_orderkey", F.explode(variants).alias("variant"))


def f3_statement_typing(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cls = (
        F.when(F.col("o_orderpriority").startswith("1"), "urgent-class")
        .when(F.col("o_orderpriority").startswith("2"), "high-class")
        .otherwise("normal-class")
    )
    return o.groupBy(cls.alias("stmt_class")).agg(F.count(F.lit(1)).alias("n"))


def k2_metadata_salt(spark, sf_dir):
    """K2 dataset-salt fingerprint: sha256 over sorted normalized texts."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return (
        d.groupBy("source")
        .agg(
            F.substring(
                F.sha2(F.array_join(F.array_sort(F.collect_list(norm)), "||"), 256),
                1, 16,
            ).alias("salt")
        )
    )


def v1_cardinality_rule(spark, sf_dir):
    """V1 SHACL-style min/max cardinality as groupBy + filter."""
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    counts = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("actual"))
    )
    return counts.filter((F.col("actual") < 1) | (F.col("actual") > 40))


def q1_pricing_summary(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    cents = lambda c: F.round(c * 100).cast("bigint")  # noqa: E731
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("bigint")).alias("sum_qty"),
            F.sum(cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
            F.sum(cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias(
                "sum_disc_cents"
            ),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_topk(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast(
        "bigint"
    )
    return (
        c.filter(F.col("c_mktsegment") == "BUILDING")
        .join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey")
        .agg(F.sum(rev).alias("revenue_cents"))
        .orderBy(F.desc("revenue_cents"), "o_orderkey")
        .limit(10)
    )


def q5_local_volume(spark, sf_dir):
    """TPC-H Q5-style 6-way join: revenue per nation where customer and
    supplier share the nation, dimensions broadcast."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100).cast("bigint")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue_cents"), F.count(F.lit(1)).alias("n_items"))
    )


def a4_distinct_rollup(spark, sf_dir):
    """Exact distinct-count rollup (A4-style stats): suppliers and parts
    per nation across lineitem."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count_distinct("l_suppkey").alias("n_suppliers"),
            F.count_distinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def o3_bucket_route(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    bucket = F.split(F.col("p_type"), " ")[0]
    return (
        p.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(F.round(F.col("p_retailprice") * 100).cast("bigint")).alias(
                "min_price_cents"
            ),
        )
    )


# --------------------------------------------------------------------------
# Training-data pipeline operators (documents / embeddings)
# --------------------------------------------------------------------------

def dedup_exact(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.min("doc_id").alias("keeper"))
    )


def _tokens(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).distinct()


def dedup_jaccard_pairs(spark, sf_dir):
    """n-gram (unigram) Jaccard near-dup candidates >= 0.6."""
    toks = _tokens(spark, sf_dir)
    sizes = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = toks.select(F.col("doc_id").alias("d1"), "tok")
    b = toks.select(F.col("doc_id").alias("d2"), "tok")
    inter = (
        a.join(b, "tok")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("inter_cnt"))
    )
    s1 = sizes.select(F.col("doc_id").alias("d1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("d2"), F.col("sz").alias("sz2"))
    return (
        inter.join(s1, "d1").join(s2, "d2")
        .filter(
            F.col("inter_cnt") * 10
            >= 6 * (F.col("sz1") + F.col("sz2") - F.col("inter_cnt"))
        )
        .select("d1", "d2", "inter_cnt")
    )


def minhash_band_pairs(spark, sf_dir):
    """MinHash+LSH candidate pairs: 8 md5 hashes, 2 bands of 4."""
    toks = _tokens(spark, sf_dir)
    hashed = toks.select(
        "doc_id",
        F.explode(F.array(*[F.lit(i) for i in range(8)])).alias("i"),
        "tok",
    ).select(
        "doc_id",
        "i",
        F.md5(F.concat(F.col("i").cast("string"), F.lit(":"), F.col("tok"))).alias("h"),
    )
    sigs = hashed.groupBy("doc_id", "i").agg(F.min("h").alias("mh"))
    bands = (
        sigs.withColumn("band", (F.col("i") / 4).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(F.array_sort(F.collect_list(F.concat_ws("@", F.col("i"), F.col("mh")))), "|")
            ).alias("bh")
        )
    )
    a = bands.select(F.col("doc_id").alias("d1"), "band", "bh")
    b = bands.select(F.col("doc_id").alias("d2"), "band", "bh")
    return (
        a.join(b, ["band", "bh"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )


def text_token_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_distinct(F.col("tok")).alias("n_uniq"),
        F.round(
            100.0 * F.sum(F.length("tok")) / F.count(F.lit(1))
        ).cast("bigint").alias("avg_len_x100"),
    )


_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is"]


def text_langid(spark, sf_dir):
    """Stopword-ratio language heuristic."""
    d = _t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    agg = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("tok").isin(_STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    return agg.select(
        "doc_id",
        "n_stop",
        F.when(F.col("n_stop") * 20 >= F.col("n"), "en").otherwise("other").alias(
            "lang_guess"
        ),
    )


def text_fingerprint(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fp"))


def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k vs the vec_id=0 query vector (rank only —
    float-free output)."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("embedding"), F.col("q_emb"),
            lambda x, y: x.cast("double") * y.cast("double"),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    norm = lambda c: F.sqrt(  # noqa: E731
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )
    sims = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != 0)
        .select(
            "vec_id",
            (dot / (norm(F.col("embedding")) * norm(F.col("q_emb")))).alias("sim"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject (per-partition top-k,
    # merged on the driver) — no global single-partition window shuffle. The
    # row_number window then runs over just the 8 surviving rows.
    top = sims.orderBy(F.desc("sim"), "vec_id").limit(8)
    w = Window.orderBy(F.desc("sim"), "vec_id")
    return top.withColumn("rank", F.row_number().over(w)).select("rank", "vec_id")


def events_sessionize(spark, sf_dir):
    """Stateful sessionization (gap > 1800 s) as batch windows."""
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        e.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").alias("n_sessions"))
    )


def w1_tumbling_window(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("v_cents"),
        )
    )


# --------------------------------------------------------------------------
# Engine-native entries (no SQL oracle — rows-only checks)
# --------------------------------------------------------------------------

def k1_uuid5_mint(spark, sf_dir):
    """UUID5 minting in pure SQL (ids.py sha1 algebra) over the 25 fixed
    nation names — seeds known a priori, so the DuckDB oracle is a
    precomputed uuid.uuid5 VALUES table (DuckDB has no sha1)."""
    from rdf_generator_spark.ids import kb_iri

    n = _t(spark, sf_dir, "nation")
    return n.select("n_name", kb_iri("doc", F.col("n_name")).alias("iri"))


def text_quality_score(spark, sf_dir):
    from rdf_generator_spark.textops.analysis import quality_score

    return quality_score(_t(spark, sf_dir, "documents"))


def dedup_simhash_pairs(spark, sf_dir):
    """SimHash near-dup pairs with the md5 token-hash variant so the
    full fingerprint + pigeonhole-band algebra has a DuckDB twin (the
    default xxhash64 variant is pytest-covered). The oracle brute-forces
    all pairs; the pigeonhole guarantee (4 bands > 3 flips) makes the
    banded Spark plan exactly equal to the brute-force answer."""
    from rdf_generator_spark.textops.dedupe import simhash, simhash_near_pairs

    d = _t(spark, sf_dir, "documents")
    return simhash_near_pairs(simhash(d, token_hash="md5"), max_hamming=3)


def dedup_embedding_neardup(spark, sf_dir):
    """Embedding near-dup pairs with 20 planted scaled copies
    (vec_id+1000000, vector*1.5 — cosine exactly 1.0). sign(p.v) is
    scale-invariant, so every LSH band matches the planted pairs
    deterministically; the 0.98 threshold is far above any natural pair
    in the synthetic data, making the exact-cosine DuckDB twin a true
    oracle (not a recall coin-flip)."""
    from rdf_generator_spark.textops.dedupe import embedding_neardup_pairs

    e = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    planted = e.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * F.lit(1.5)).alias("embedding"),
    )
    return embedding_neardup_pairs(
        e.unionByName(planted), threshold=0.98
    ).select("d1", "d2")


def ann_ivf_topk(spark, sf_dir):
    """IVF approximate nearest neighbors for 3 query vectors."""
    from rdf_generator_spark.textops.similarity import ivf_build, ivf_topk

    vecs = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = vecs.limit(3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    cents, assign = ivf_build(vecs, n_cells=8, iters=2)
    return ivf_topk(vecs, assign, cents, queries, k=5, n_probe=3).select(
        "q_id", "rank", "vec_id"
    )


def text_winnow_fingerprint(spark, sf_dir):
    """Winnowing fingerprint with the md5 shingle-hash variant so the
    full rolling-min algebra has a DuckDB twin (DuckDB lacks xxhash64;
    the default xxhash64 variant is covered by pytest)."""
    from rdf_generator_spark.textops.analysis import fingerprint

    return fingerprint(_t(spark, sf_dir, "documents"), window=4,
                       shingle_hash="md5")


def multimodal_features(spark, sf_dir):
    """REAL binary-column decode (round 5): BMP/PPM/WAV-PCM payloads
    are encoded from closed-form pixel/sample formulas, decoded by the
    pure-numpy codec layer (textops/codecs.py) inside the mapInPandas
    stage, and the decoded statistics are re-quantized to the exact
    integers DuckDB derives from the same formulas WITHOUT touching the
    containers. n_bytes doubles as a container-layout check (BMP row
    padding, netpbm header, RIFF framing)."""
    import numpy as np

    from rdf_generator_spark.textops.codecs import (
        encode_bmp,
        encode_ppm,
        encode_wav_pcm,
    )
    from rdf_generator_spark.textops.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    ensure_workers_can_import(spark)
    rows = []
    for i in range(8):
        w, h = 16 + i, 8 + i
        x = np.arange(w)[None, :, None]
        y = np.arange(h)[:, None, None]
        c = np.arange(3)[None, None, :]
        img = ((x * 7 + y * 13 + c * 31 + i) % 256).astype(np.uint8)
        enc = encode_bmp(img) if i % 2 == 0 else encode_ppm(img)
        mime = "image/bmp" if i % 2 == 0 else "image/x-portable-pixmap"
        rows.append((i, "image", bytearray(enc), (mime, w, h, None)))
    for i in range(8, 16):
        n = 512 + i
        t = np.arange(n)
        s = (((t * 2654435761 + i * 7919) % 65536) - 32768).astype(np.int16)
        rows.append(
            (i, "audio", bytearray(encode_wav_pcm(s[:, None], 8000 + i)),
             ("audio/wav", None, None, None))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    f = extract_features(media, dim=8, fake=False)
    isimg = F.col("format") != F.lit("wav")
    # feature floats carry exact small integers (w/h/ch/n/rate/zc) and a
    # float32 mean whose *count-scaled* round is provably the integer
    # pixel sum (|err| = count * mean * 2^-24 << 0.5) — every emitted
    # column is therefore integer-exact on both engines
    return f.select(
        "media_id", "format", "n_bytes",
        F.round(F.col("feature")[0]).cast("bigint").alias("d0"),
        F.round(F.col("feature")[1]).cast("bigint").alias("d1"),
        F.round(F.col("feature")[2]).cast("bigint").alias("d2"),
        F.when(
            isimg,
            F.round(
                F.col("feature")[3]
                * F.col("feature")[0] * F.col("feature")[1] * F.col("feature")[2]
            ),
        )
        .otherwise(F.round(F.col("feature")[6]))
        .cast("bigint")
        .alias("d3"),
    )


def kg_pipeline_synth(spark, sf_dir):
    """Full KG pipeline on a small deterministic synthetic corpus."""
    from rdf_generator_spark.plans.pipeline import build_graph
    from rdf_generator_spark.sources.corpus import corpus_df
    from rdf_generator_spark.sources.synth import synth_corpus_rows

    ensure_workers_can_import(spark)
    corpus = corpus_df(spark, synth_corpus_rows(n_datasets=2, ntax=6, nchar=6, seed=11))
    res = build_graph(spark, corpus)
    return (
        res["triples"]
        .groupBy("repo")
        .agg(F.count(F.lit(1)).alias("n_triples"))
        .orderBy("repo")
    )


QUERIES: Dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "j1_broadcast_fill": j1_broadcast_fill,
    "j2_first_wins_index": j2_first_wins_index,
    "j3_dual_key_match": j3_dual_key_match,
    "j5_symbol_state_join": j5_symbol_state_join,
    "a1_first_label_wins": a1_first_label_wins,
    "a2_sequential_counters": a2_sequential_counters,
    "a3_set_dedup": a3_set_dedup,
    "a5_prune_anti_join": a5_prune_anti_join,
    "j6_label_priority": j6_label_priority,
    "f2_variant_fanout": f2_variant_fanout,
    "f3_statement_typing": f3_statement_typing,
    "k2_metadata_salt": k2_metadata_salt,
    "v1_cardinality_rule": v1_cardinality_rule,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_topk": q3_shipping_topk,
    "q5_local_volume": q5_local_volume,
    "a4_distinct_rollup": a4_distinct_rollup,
    "o3_bucket_route": o3_bucket_route,
    "dedup_exact": dedup_exact,
    "dedup_jaccard_pairs": dedup_jaccard_pairs,
    "minhash_band_pairs": minhash_band_pairs,
    "text_token_stats": text_token_stats,
    "text_langid": text_langid,
    "text_fingerprint": text_fingerprint,
    "ann_cosine_topk": ann_cosine_topk,
    "events_sessionize": events_sessionize,
    "w1_tumbling_window": w1_tumbling_window,
    "k1_uuid5_mint": k1_uuid5_mint,
    "kg_pipeline_synth": kg_pipeline_synth,
    "text_quality_score": text_quality_score,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_embedding_neardup": dedup_embedding_neardup,
    "ann_ivf_topk": ann_ivf_topk,
    "text_winnow_fingerprint": text_winnow_fingerprint,
    "multimodal_features": multimodal_features,
}

ORACLES: Dict[str, str] = {
    "j1_broadcast_fill": """
        SELECT c_custkey,
               CASE WHEN c_mktsegment='BUILDING' THEN n_name ELSE c_mktsegment END
                 AS filled_label
        FROM customer JOIN nation ON c_nationkey=n_nationkey
    """,
    "j2_first_wins_index": """
        SELECT user_id, event_type, props AS first_props
        FROM events
        QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id) = 1
    """,
    "j3_dual_key_match": """
        SELECT c_custkey, MIN(s_suppkey) AS matched_supp
        FROM customer JOIN supplier
          ON (s_suppkey=c_custkey OR s_nationkey=c_nationkey)
        GROUP BY c_custkey
    """,
    "j5_symbol_state_join": """
        WITH e AS (SELECT json_extract_string(props,'$.k') AS sym, value FROM events)
        SELECT s_suppkey, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS v_cents
        FROM e JOIN supplier ON TRY_CAST(sym AS INT)=s_suppkey
        WHERE regexp_matches(sym,'^\\d+$')
        GROUP BY s_suppkey
    """,
    "a1_first_label_wins": """
        SELECT o_custkey, o_orderkey AS first_orderkey
        FROM orders
        QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) = 1
    """,
    "a2_sequential_counters": """
        SELECT o_orderkey,
               'order:id-' || ROW_NUMBER() OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey)
                 AS seq_label
        FROM orders
    """,
    "a3_set_dedup": """
        SELECT DISTINCT l_returnflag, l_linestatus, CAST(l_quantity AS INT) AS qty
        FROM lineitem
    """,
    "a5_prune_anti_join": """
        SELECT p_partkey FROM part
        WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey=p_partkey)
    """,
    "j6_label_priority": """
        SELECT c_custkey,
               COALESCE(CASE WHEN n_regionkey<2 THEN n_name END, c_name) AS label
        FROM customer JOIN nation ON c_nationkey=n_nationkey
    """,
    "f2_variant_fanout": """
        SELECT o_orderkey, 'female' AS variant FROM orders WHERE o_orderstatus='O'
        UNION ALL
        SELECT o_orderkey, 'male' AS variant FROM orders WHERE o_orderstatus='O'
        UNION ALL
        SELECT o_orderkey, 'base' AS variant FROM orders WHERE o_orderstatus<>'O'
    """,
    "f3_statement_typing": """
        SELECT CASE WHEN o_orderpriority LIKE '1%' THEN 'urgent-class'
                    WHEN o_orderpriority LIKE '2%' THEN 'high-class'
                    ELSE 'normal-class' END AS stmt_class,
               COUNT(*) AS n
        FROM orders GROUP BY 1
    """,
    "k2_metadata_salt": """
        SELECT source,
               SUBSTRING(sha256(string_agg(
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'),
                   '||' ORDER BY regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')
               )), 1, 16) AS salt
        FROM documents GROUP BY source
    """,
    "v1_cardinality_rule": """
        SELECT c_custkey, COUNT(o_orderkey) AS actual
        FROM customer LEFT JOIN orders ON o_custkey=c_custkey
        GROUP BY c_custkey
        HAVING COUNT(o_orderkey) < 1 OR COUNT(o_orderkey) > 40
    """,
    "q1_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT)
                 AS sum_base_cents,
               CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
                 AS sum_disc_cents,
               COUNT(*) AS count_order
        FROM lineitem GROUP BY l_returnflag, l_linestatus
    """,
    "q3_shipping_topk": """
        SELECT o_orderkey,
               CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM customer
        JOIN orders ON c_custkey=o_custkey
        JOIN lineitem ON o_orderkey=l_orderkey
        WHERE c_mktsegment='BUILDING'
        GROUP BY o_orderkey
        ORDER BY revenue_cents DESC, o_orderkey
        LIMIT 10
    """,
    "q5_local_volume": """
        SELECT n_name,
               CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100)
                             AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               COUNT(*) AS n_items
        FROM customer
        JOIN orders ON c_custkey=o_custkey
        JOIN lineitem ON o_orderkey=l_orderkey
        JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        JOIN nation ON s_nationkey=n_nationkey
        JOIN region ON n_regionkey=r_regionkey
        GROUP BY n_name
    """,
    "a4_distinct_rollup": """
        SELECT n_name,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey=s_suppkey
        JOIN nation ON s_nationkey=n_nationkey
        GROUP BY n_name
    """,
    "o3_bucket_route": """
        SELECT string_split(p_type,' ')[1] AS bucket, COUNT(*) AS n,
               MIN(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS min_price_cents
        FROM part GROUP BY 1
    """,
    "dedup_exact": """
        SELECT md5(text) AS h, COUNT(*) AS n, MIN(doc_id) AS keeper
        FROM documents GROUP BY md5(text)
    """,
    "dedup_jaccard_pairs": """
        WITH toks AS (
            SELECT DISTINCT doc_id, t.tok
            FROM documents, UNNEST(string_split(text,' ')) AS t(tok)
        ),
        sizes AS (SELECT doc_id, COUNT(*) AS sz FROM toks GROUP BY doc_id),
        inter AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS inter_cnt
            FROM toks a JOIN toks b ON a.tok=b.tok AND a.doc_id<b.doc_id
            GROUP BY a.doc_id, b.doc_id
        )
        SELECT d1, d2, inter_cnt
        FROM inter
        JOIN sizes s1 ON s1.doc_id=d1
        JOIN sizes s2 ON s2.doc_id=d2
        WHERE inter_cnt*10 >= 6*(s1.sz + s2.sz - inter_cnt)
    """,
    "minhash_band_pairs": """
        WITH toks AS (
            SELECT DISTINCT doc_id, t.tok
            FROM documents, UNNEST(string_split(text,' ')) AS t(tok)
        ),
        hashed AS (
            SELECT doc_id, i.i, md5(CAST(i.i AS VARCHAR) || ':' || tok) AS h
            FROM toks CROSS JOIN (SELECT UNNEST(range(8)) AS i) i
        ),
        sigs AS (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY doc_id, i),
        bands AS (
            SELECT doc_id, CAST(i//4 AS INT) AS band,
                   md5(string_agg(CAST(i AS VARCHAR) || '@' || mh, '|'
                                  ORDER BY CAST(i AS VARCHAR) || '@' || mh)) AS bh
            FROM sigs GROUP BY doc_id, CAST(i//4 AS INT)
        )
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b ON a.band=b.band AND a.bh=b.bh
                                  AND a.doc_id<b.doc_id
    """,
    "text_token_stats": """
        WITH toks AS (
            SELECT doc_id, t.tok
            FROM documents, UNNEST(string_split(text,' ')) AS t(tok)
        )
        SELECT doc_id, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_uniq,
               CAST(ROUND(100.0*SUM(LENGTH(tok))/COUNT(*)) AS BIGINT) AS avg_len_x100
        FROM toks GROUP BY doc_id
    """,
    "text_langid": """
        WITH toks AS (
            SELECT doc_id, t.tok
            FROM documents, UNNEST(string_split(text,' ')) AS t(tok)
        ),
        agg AS (
            SELECT doc_id, COUNT(*) AS n,
                   CAST(SUM(CASE WHEN tok IN
                                 ('the','a','of','and','to','in','is')
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_stop
            FROM toks GROUP BY doc_id
        )
        SELECT doc_id, n_stop,
               CASE WHEN n_stop*20 >= n THEN 'en' ELSE 'other' END AS lang_guess
        FROM agg
    """,
    "text_fingerprint": """
        SELECT doc_id,
               md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        FROM documents
    """,
    "ann_cosine_topk": """
        WITH q AS (SELECT embedding AS q_emb FROM embeddings WHERE vec_id=0),
        sims AS (
            SELECT vec_id,
                   list_dot_product(CAST(embedding AS DOUBLE[]),
                                    CAST(q_emb AS DOUBLE[]))
                   / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                            CAST(embedding AS DOUBLE[])))
                      * sqrt(list_dot_product(CAST(q_emb AS DOUBLE[]),
                                              CAST(q_emb AS DOUBLE[])))) AS sim
            FROM embeddings, q WHERE vec_id<>0
        )
        SELECT ROW_NUMBER() OVER (ORDER BY sim DESC, vec_id) AS rank, vec_id
        FROM sims
        QUALIFY rank <= 8
    """,
    "text_quality_score": """
        WITH base AS (
            SELECT doc_id, text, length(text) AS n_chars,
                   list_filter(regexp_split_to_array(text, '\\s+'),
                               t -> t <> '') AS toks
            FROM documents
        ),
        c AS (
            SELECT doc_id, n_chars, len(toks) AS n,
                   GREATEST(len(toks), 1) AS n1,
                   len(list_filter(toks, t -> list_contains(
                       ['the','a','an','of','and','to','in','is','it','that',
                        'for','on','with','as','was','at','by','this'],
                       lower(t)))) AS n_stop,
                   len(list_distinct(toks)) AS n_uniq,
                   n_chars - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
                     AS n_punct,
                   n_chars - len(toks) + 1 AS sum_wordlen
            FROM base
        )
        SELECT doc_id, n AS n_tokens, n_stop AS n_stopwords,
               CAST(FLOOR(100*sum_wordlen/n1) AS BIGINT) AS mean_wordlen_x100,
               CAST(FLOOR(1000*n_uniq/n1) AS BIGINT) AS uniq_ratio_x1000,
               CAST((CASE WHEN n < 5 THEN 0 ELSE 25 END)
                  + (CASE WHEN sum_wordlen >= 3*n1 AND sum_wordlen <= 12*n1
                          THEN 25 ELSE 0 END)
                  + (CASE WHEN n_punct*5 < n_chars THEN 25 ELSE 0 END)
                  + (CASE WHEN 10*n_uniq >= 3*n1 THEN 25 ELSE 0 END) AS INT)
                 AS quality_score
        FROM c
    """,
    "events_sessionize": """
        WITH g AS (
            SELECT user_id,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id
                                           ORDER BY ts, event_id) IS NULL
                             OR date_diff('second',
                                          lag(ts) OVER (PARTITION BY user_id
                                                        ORDER BY ts, event_id),
                                          ts) > 1800
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
        )
        SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
        FROM g GROUP BY user_id
    """,
    "w1_tumbling_window": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
               event_type, COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS v_cents
        FROM events GROUP BY 1, 2
    """,
    "dedup_embedding_neardup": """
        WITH base AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        ),
        planted AS (
            SELECT vec_id + 1000000 AS vec_id,
                   list_transform(embedding,
                                  x -> CAST(CAST(x * 1.5 AS FLOAT) AS DOUBLE))
                     AS v
            FROM embeddings WHERE vec_id < 20
        ),
        allv AS (SELECT * FROM base UNION ALL SELECT * FROM planted)
        SELECT a.vec_id AS d1, b.vec_id AS d2
        FROM allv a JOIN allv b ON a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))) >= 0.98
    """,
    # Closed-form twin of the REAL decode path: the Spark side decodes
    # actual BMP/PPM/WAV containers; DuckDB derives the identical
    # integers from the generative pixel/sample formulas plus the
    # containers' documented layout arithmetic (BMP 54-byte header +
    # 4-byte row padding, netpbm text header, RIFF 44-byte framing) —
    # an independent derivation, not a pin.
    "multimodal_features": """
        WITH img AS (
            SELECT CAST(t.i AS BIGINT) AS media_id,
                   CASE WHEN t.i % 2 = 0 THEN 'bmp' ELSE 'ppm' END AS format,
                   16 + t.i AS w, 8 + t.i AS h, t.i AS i
            FROM range(8) t(i)
        ), px AS (
            SELECT img.media_id,
                   SUM((x.x*7 + y.y*13 + c.c*31 + img.i) % 256) AS px_sum
            FROM img, range(23) x(x), range(15) y(y), range(3) c(c)
            WHERE x.x < img.w AND y.y < img.h
            GROUP BY img.media_id
        ), irows AS (
            SELECT img.media_id, img.format,
                   CAST(CASE WHEN img.format = 'bmp'
                        THEN 54 + ((img.w*3 + 3) // 4) * 4 * img.h
                        ELSE 3 + length(CAST(img.w AS VARCHAR)) + 1
                             + length(CAST(img.h AS VARCHAR)) + 1 + 4
                             + 3 * img.w * img.h END AS INT) AS n_bytes,
                   CAST(img.w AS BIGINT) AS d0, CAST(img.h AS BIGINT) AS d1,
                   CAST(3 AS BIGINT) AS d2, CAST(px.px_sum AS BIGINT) AS d3
            FROM img JOIN px USING (media_id)
        ), wav AS (
            SELECT 8 + t.i AS i, 520 + t.i AS n, 8008 + t.i AS rate
            FROM range(8) t(i)
        ), samp AS (
            SELECT wav.i, s.t,
                   ((s.t * 2654435761 + wav.i * 7919) % 65536) - 32768 AS v
            FROM wav, range(528) s(t)
            WHERE s.t < wav.n
        ), zc AS (
            SELECT i, SUM(CASE WHEN (v < 0) <> (pv < 0) THEN 1 ELSE 0 END) AS zc
            FROM (SELECT i, v,
                         lag(v) OVER (PARTITION BY i ORDER BY t) AS pv
                  FROM samp)
            WHERE pv IS NOT NULL
            GROUP BY i
        ), arows AS (
            SELECT CAST(w.i AS BIGINT) AS media_id, 'wav' AS format,
                   CAST(44 + 2 * w.n AS INT) AS n_bytes,
                   CAST(w.n AS BIGINT) AS d0, CAST(1 AS BIGINT) AS d1,
                   CAST(w.rate AS BIGINT) AS d2, CAST(zc.zc AS BIGINT) AS d3
            FROM wav w JOIN zc ON zc.i = w.i
        )
        SELECT * FROM irows UNION ALL SELECT * FROM arows
    """,
    # simhash md5 mode: per token t, bit b of the fingerprint input is
    # bit (b%4) of hex nibble b//4 of md5(t) — reproduced here verbatim;
    # hamming distance is permutation-invariant so the bit->position
    # mapping only has to agree per (token, b), which it does by
    # construction. Brute-force all pairs (the banded Spark plan is
    # exactly equal by the pigeonhole guarantee: 4 bands > 3 flips).
    "dedup_simhash_pairs": """
        WITH toks AS (
            SELECT DISTINCT doc_id, t.tok
            FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS t(tok)
            WHERE t.tok <> ''
        ),
        bits AS (
            SELECT doc_id, bb.b,
                   SUM(CASE WHEN (((strpos('0123456789abcdef',
                                           substr(md5(tok), CAST(bb.b//4 + 1 AS INT), 1)) - 1)
                                   >> (bb.b % 4)) & 1) = 1
                            THEN 1 ELSE -1 END) AS s
            FROM toks CROSS JOIN (SELECT unnest(range(64)) AS b) bb
            GROUP BY doc_id, bb.b
        ),
        fp AS (
            SELECT doc_id,
                   string_agg(CASE WHEN s > 0 THEN '1' ELSE '0' END,
                              '' ORDER BY b) AS f
            FROM bits GROUP BY doc_id
        ),
        pr AS (
            SELECT a.doc_id AS d1, b.doc_id AS d2,
                   len(list_filter(range(64),
                                   i -> a.f[CAST(i+1 AS INT)] <> b.f[CAST(i+1 AS INT)]))
                     AS hamming
            FROM fp a JOIN fp b ON a.doc_id < b.doc_id
        )
        SELECT d1, d2, CAST(hamming AS INT) AS hamming
        FROM pr WHERE hamming <= 3
    """,
    "text_winnow_fingerprint": """
        WITH n AS (
            SELECT doc_id,
                   regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS nt
            FROM documents
        ),
        t AS (SELECT doc_id, md5(nt) AS content_fp,
                     string_split(nt, ' ') AS ts FROM n),
        sh AS (
            SELECT doc_id, content_fp,
                   list_transform(
                       range(0, greatest(len(ts) - 3, 0) + 1),
                       i -> md5(array_to_string(ts[i+1:i+3], ' '))) AS shs
            FROM t
        ),
        w AS (
            SELECT doc_id, content_fp,
                   list_sort(list_distinct(list_transform(
                       range(0, greatest(len(shs) - 4, 0) + 1),
                       i -> list_aggregate(shs[i+1:i+4], 'min')))) AS wn
            FROM sh
        )
        SELECT doc_id, content_fp, CAST(len(wn) AS INT) AS n_winnowed,
               md5(array_to_string(wn, ',')) AS winnow_fp
        FROM w
    """,
}

# UUID5 seeds are known a priori (the 25 fixed nation names), so the k1
# oracle is a VALUES table of uuid.uuid5 ground truth computed by the
# CPython stdlib — DuckDB has no sha1, but it doesn't need one.
from rdf_generator_spark.ids import uuid5_kb as _uuid5_kb  # noqa: E402

_K1_SEEDS = [f"NATION_{i}" for i in range(25)]
ORACLES["k1_uuid5_mint"] = (
    "SELECT n_name, iri FROM (VALUES "
    + ", ".join(f"('{s}', '{_uuid5_kb('doc', s)}')" for s in _K1_SEEDS)
    + ") AS t(n_name, iri)"
)

# IVF is approximate by design, but its seeded init (smallest xxhash64
# ids) + fixed Lloyd rounds make the output a deterministic function of
# the input — pinned from a verified run at sf0.01 (stable across
# re-runs; any change to the algorithm is a deliberate semantic change
# and should re-pin). Same for the per-repo triple counts of the
# synthetic KG corpus, which golden-equality tests derive independently.
_IVF_PINNED = [
    (0, 1, 365), (0, 2, 387), (0, 3, 73), (0, 4, 190), (0, 5, 388),
    (1, 1, 386), (1, 2, 407), (1, 3, 195), (1, 4, 64), (1, 5, 472),
    (2, 1, 117), (2, 2, 450), (2, 3, 188), (2, 4, 320), (2, 5, 418),
]
ORACLES["ann_ivf_topk"] = (
    "SELECT q_id, rank, vec_id FROM (VALUES "
    + ", ".join(f"({q}, {r}, {v})" for q, r, v in _IVF_PINNED)
    + ") AS t(q_id, rank, vec_id)"
)

_KG_SYNTH_PINNED = [("synth/dataset-0000", 2182), ("synth/dataset-0001", 2123)]
ORACLES["kg_pipeline_synth"] = (
    "SELECT repo, n_triples FROM (VALUES "
    + ", ".join(f"('{r}', {n})" for r, n in _KG_SYNTH_PINNED)
    + ") AS t(repo, n_triples)"
)


def text_pii_redact(spark, sf_dir):
    """PII scrub over documents with planted emails/IPs/phones (the
    synthetic corpus has none, so five docs get deterministic PII
    appended on BOTH sides of the compare)."""
    from rdf_generator_spark.textops.analysis import redact_pii

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    planted = F.when(
        F.col("doc_id") < 5,
        F.concat(F.col("text"),
                 F.lit(" contact a.b-c_1@ex-ample.org or +4915112345678 "
                       "at 10.0.0.1 now")),
    ).otherwise(F.col("text"))
    return redact_pii(d.select("doc_id", planted.alias("text")))


ORACLES["text_pii_redact"] = """
    WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id < 5
                    THEN text || ' contact a.b-c_1@ex-ample.org or '
                         || '+4915112345678 at 10.0.0.1 now'
                    ELSE text END AS text
        FROM documents WHERE doc_id < 50
    )
    SELECT doc_id,
        CAST(len(regexp_extract_all(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS INT)
          AS n_email,
        CAST(len(regexp_extract_all(text,
            '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')) AS INT)
          AS n_ipv4,
        CAST(len(regexp_extract_all(text, '\\+[0-9]{7,15}\\b')) AS INT)
          AS n_phone,
        regexp_replace(regexp_replace(regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
            '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
            '[IPV4]', 'g'),
            '\\+[0-9]{7,15}\\b', '[PHONE]', 'g') AS redacted_text
    FROM d
"""


def text_decontaminate(spark, sf_dir):
    """Benchmark decontamination: docs 0 and 1 are the 'benchmark'
    (full 13-gram overlap with themselves), so the survivor set is
    exactly the other doc_ids < 100 that share no 13-gram."""
    from rdf_generator_spark.textops.analysis import decontaminate

    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100).select(
        "doc_id", "text"
    )
    bench = d.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    return decontaminate(d, bench, n=13).select("doc_id")


ORACLES["text_decontaminate"] = """
    WITH d AS (
        SELECT doc_id, string_split_regex(text, '\\s+') AS ts
        FROM documents WHERE doc_id < 100
    ),
    sh AS (
        SELECT DISTINCT doc_id, unnest(list_transform(
            range(0, greatest(len(ts) - 13, 0) + 1),
            i -> array_to_string(ts[i+1:i+13], ' '))) AS tok
        FROM d WHERE len(ts) >= 13
    ),
    bad AS (
        SELECT DISTINCT a.doc_id
        FROM sh a JOIN sh b ON a.tok = b.tok AND b.doc_id < 2
    )
    SELECT doc_id FROM d
    WHERE doc_id NOT IN (SELECT doc_id FROM bad)
"""

QUERIES["text_pii_redact"] = text_pii_redact
QUERIES["text_decontaminate"] = text_decontaminate


def dedup_near_groups(spark, sf_dir):
    """The canonical corpus-dedup composition end-to-end — MinHash-LSH
    candidates -> exact-Jaccard verify on candidates only -> connected
    components -> keeper per group — against a full DuckDB twin that
    replays every stage (md5 minhash signatures, banded buckets,
    candidate-only verify, recursive-CTE components). Ten planted
    near-copies (doc_id+500000, one appended token) guarantee
    deterministic groups; every stage is deterministic on both engines
    so even LSH recall behavior is twinned exactly."""
    from rdf_generator_spark.textops.dedupe import near_dup_groups

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz_planted_tail")).alias("text"),
    )
    return near_dup_groups(
        d.unionByName(planted), threshold=0.8, shingle_k=3,
        num_hashes=16, bands=4,
    )


ORACLES["dedup_near_groups"] = """
    WITH RECURSIVE d0 AS (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + 500000, text || ' zz_planted_tail'
        FROM documents WHERE doc_id < 10
    ),
    tk AS (SELECT doc_id, string_split_regex(text, '\\s+') AS ts FROM d0),
    sh AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(ts) - 3, 0) + 1),
                   i -> array_to_string(ts[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ')))
                 AS tok
        FROM tk WHERE len(ts) >= 3
    ),
    hashed AS (
        SELECT doc_id, i.i, md5(CAST(i.i AS VARCHAR) || ':' || tok) AS h
        FROM sh CROSS JOIN (SELECT unnest(range(16)) AS i) i
    ),
    sigs AS (SELECT doc_id, i, MIN(h) AS mh FROM hashed GROUP BY doc_id, i),
    bands AS (
        SELECT doc_id, CAST(i//4 AS INT) AS band,
               md5(string_agg(CAST(i AS VARCHAR) || '@' || mh, '|'
                              ORDER BY CAST(i AS VARCHAR) || '@' || mh)) AS bh
        FROM sigs GROUP BY doc_id, CAST(i//4 AS INT)
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bands a JOIN bands b
          ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    inter AS (
        SELECT c.d1, c.d2, COUNT(*) AS ic
        FROM cand c
        JOIN sh s1 ON s1.doc_id = c.d1
        JOIN sh s2 ON s2.doc_id = c.d2 AND s2.tok = s1.tok
        GROUP BY c.d1, c.d2
    ),
    ver AS (
        SELECT CAST(i.d1 AS VARCHAR) AS a, CAST(i.d2 AS VARCHAR) AS b
        FROM inter i
        JOIN sz z1 ON z1.doc_id = i.d1
        JOIN sz z2 ON z2.doc_id = i.d2
        WHERE i.ic >= CAST(0.8 AS DOUBLE) * (z1.sz + z2.sz - i.ic)
    ),
    sym AS (SELECT a, b FROM ver UNION SELECT b, a FROM ver),
    reach(node, r) AS (
        SELECT a, a FROM sym
        UNION
        SELECT s.a, r.r FROM sym s JOIN reach r ON s.b = r.node
    ),
    mapping AS (SELECT node, MIN(r) AS canon FROM reach GROUP BY node),
    gsz AS (SELECT canon, COUNT(*) AS group_size FROM mapping GROUP BY canon)
    SELECT m.node AS doc_id, m.canon AS keeper, g.group_size
    FROM mapping m JOIN gsz g ON g.canon = m.canon
"""

QUERIES["dedup_near_groups"] = dedup_near_groups


def dedup_incremental(spark, sf_dir):
    """Cross-corpus incremental dedup (the "new crawl vs existing
    training set" step): band signatures per side, candidates ONLY from
    the between-sides (band, bh) equi-join — ref-vs-ref pairs are never
    generated — then exact-Jaccard verify on candidates. New batch =
    ten planted near-copies (doc_id+900000, one appended token; must
    match their source) + ten two-token uniques (below the 3-shingle
    floor; must survive). Integer-only output columns so the DuckDB
    twin is engine-exact."""
    from rdf_generator_spark.textops.dedupe import incremental_dedup_matches

    ref = _t(spark, sf_dir, "documents").select("doc_id", "text")
    planted = ref.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 900000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" zz_planted_tail")).alias("text"),
    )
    uniques = ref.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 910000).alias("doc_id"),
        F.concat(F.lit("uniq_"), F.col("doc_id"), F.lit(" zz")).alias("text"),
    )
    return incremental_dedup_matches(
        planted.unionByName(uniques), ref,
        threshold=0.8, shingle_k=3, num_hashes=16, bands=4,
    )


ORACLES["dedup_incremental"] = """
    WITH ref0 AS (SELECT doc_id, text FROM documents),
    new0 AS (
        SELECT doc_id + 900000 AS doc_id, text || ' zz_planted_tail' AS text
        FROM documents WHERE doc_id < 10
        UNION ALL
        SELECT doc_id + 910000, 'uniq_' || CAST(doc_id AS VARCHAR) || ' zz'
        FROM documents WHERE doc_id < 10
    ),
    sh_ref AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(ts) - 3, 0) + 1),
                   i -> array_to_string(ts[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ')))
                 AS tok
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ts FROM ref0)
        WHERE len(ts) >= 3
    ),
    sh_new AS (
        SELECT DISTINCT doc_id,
               unnest(list_transform(
                   range(0, greatest(len(ts) - 3, 0) + 1),
                   i -> array_to_string(ts[CAST(i+1 AS INT):CAST(i+3 AS INT)], ' ')))
                 AS tok
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS ts FROM new0)
        WHERE len(ts) >= 3
    ),
    bands_ref AS (
        SELECT doc_id, CAST(i//4 AS INT) AS band,
               md5(string_agg(CAST(i AS VARCHAR) || '@' || mh, '|'
                              ORDER BY CAST(i AS VARCHAR) || '@' || mh)) AS bh
        FROM (
            SELECT doc_id, i.i AS i,
                   MIN(md5(CAST(i.i AS VARCHAR) || ':' || tok)) AS mh
            FROM sh_ref CROSS JOIN (SELECT unnest(range(16)) AS i) i
            GROUP BY doc_id, i.i
        ) GROUP BY doc_id, CAST(i//4 AS INT)
    ),
    bands_new AS (
        SELECT doc_id, CAST(i//4 AS INT) AS band,
               md5(string_agg(CAST(i AS VARCHAR) || '@' || mh, '|'
                              ORDER BY CAST(i AS VARCHAR) || '@' || mh)) AS bh
        FROM (
            SELECT doc_id, i.i AS i,
                   MIN(md5(CAST(i.i AS VARCHAR) || ':' || tok)) AS mh
            FROM sh_new CROSS JOIN (SELECT unnest(range(16)) AS i) i
            GROUP BY doc_id, i.i
        ) GROUP BY doc_id, CAST(i//4 AS INT)
    ),
    cand AS (
        SELECT DISTINCT n.doc_id AS new_id, r.doc_id AS ref_id
        FROM bands_new n JOIN bands_ref r
          ON n.band = r.band AND n.bh = r.bh
    ),
    zn AS (SELECT doc_id, COUNT(*) AS sz_new FROM sh_new GROUP BY doc_id),
    zr AS (SELECT doc_id, COUNT(*) AS sz_ref FROM sh_ref GROUP BY doc_id),
    inter AS (
        SELECT c.new_id, c.ref_id, COUNT(*) AS inter_cnt
        FROM cand c
        JOIN sh_new sn ON sn.doc_id = c.new_id
        JOIN sh_ref sr ON sr.doc_id = c.ref_id AND sr.tok = sn.tok
        GROUP BY c.new_id, c.ref_id
    )
    SELECT i.new_id, i.ref_id, i.inter_cnt, zn.sz_new, zr.sz_ref
    FROM inter i
    JOIN zn ON zn.doc_id = i.new_id
    JOIN zr ON zr.doc_id = i.ref_id
    WHERE i.inter_cnt
          >= CAST(0.8 AS DOUBLE) * (zn.sz_new + zr.sz_ref - i.inter_cnt)
"""

QUERIES["dedup_incremental"] = dedup_incremental


def text_sample_deterministic(spark, sf_dir):
    """Seeded hash-threshold Bernoulli sample (retry/repartition-stable,
    unlike df.sample) — membership is a pure function of (seed, key),
    twinned bit-for-bit in DuckDB via the same md5 32-bit prefix."""
    from rdf_generator_spark.textops.sampling import deterministic_sample

    d = _t(spark, sf_dir, "documents")
    return deterministic_sample(d, fraction=0.25, seed=7).select("doc_id")


ORACLES["text_sample_deterministic"] = """
    SELECT doc_id FROM documents
    WHERE ('0x' || substr(md5('7:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
          < 1073741824
"""


def text_pack_sequences(spark, sf_dir):
    """Token-budget sequence packing (context-window shards) via
    bucketed distributed prefix-sum — no global window."""
    from rdf_generator_spark.textops.sampling import pack_sequences

    d = _t(spark, sf_dir, "documents")
    return pack_sequences(d, max_tokens=2000, buckets=8)


ORACLES["text_pack_sequences"] = """
    WITH base AS (
        SELECT doc_id,
               CAST(('0x' || substr(md5('0:' || CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT
                    % 8 AS INT) AS bucket,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        FROM documents
    )
    SELECT doc_id, bucket,
           CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
                    PARTITION BY bucket ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                / 2000) AS BIGINT) AS pack_id,
           n_tokens
    FROM base
"""

QUERIES["text_sample_deterministic"] = text_sample_deterministic
QUERIES["text_pack_sequences"] = text_pack_sequences


def embedding_quantize_int8(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding column —
    integer-only output, exact DuckDB twin (floor(x+0.5) rounding on
    both engines, no HALF_UP ambiguity)."""
    from rdf_generator_spark.textops.similarity import quantize_embeddings

    e = _t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    return quantize_embeddings(e)


ORACLES["embedding_quantize_int8"] = """
    WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings WHERE vec_id < 200
    ),
    s AS (
        SELECT vec_id, v,
               list_max(list_transform(v, x -> abs(x))) / CAST(127 AS DOUBLE)
                 AS scale
        FROM e
    )
    SELECT vec_id,
           CAST(FLOOR(scale * 1000000000) AS BIGINT) AS scale_ppb,
           CAST(t.i AS INT) AS dim,
           CAST(CASE WHEN scale = 0 THEN 0
                     ELSE GREATEST(-127, LEAST(127,
                          FLOOR(v[CAST(t.i + 1 AS INT)] / scale + 0.5)))
                END AS INT) AS q
    FROM s, UNNEST(range(len(v))) AS t(i)
"""

QUERIES["embedding_quantize_int8"] = embedding_quantize_int8


def multimodal_frame_sampling(spark, sf_dir):
    """REAL video frame sampling (round 5): Y4M (YUV4MPEG2 C420)
    payloads with closed-form luma planes are decoded by the pure-numpy
    codec inside the mapInPandas stage; the sampled frame index and its
    count-scaled mean luma re-quantize to the exact integers DuckDB
    derives from the same formulas without touching the container."""
    import numpy as np

    from rdf_generator_spark.textops.codecs import encode_y4m
    from rdf_generator_spark.textops.multimodal import (
        MEDIA_SCHEMA,
        sample_frames,
    )

    ensure_workers_can_import(spark)
    w, h = 16, 8
    rows = []
    for i in range(6):
        nf = 3 + i
        f = np.arange(nf)[:, None, None]
        y = np.arange(h)[None, :, None]
        x = np.arange(w)[None, None, :]
        luma = ((f * 17 + y * 5 + x * 3 + i) % 256).astype(np.uint8)
        # 5 fps -> 200 ms per frame; duration_ms drives the fan-out
        rows.append(
            (i, "video", bytearray(encode_y4m(luma, (5, 1))),
             ("video/x-yuv4mpeg", w, h, nf * 200))
        )
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    return sample_frames(media, every_ms=300, fake=False).select(
        "media_id", "ts_ms", "frame_index",
        # mean_luma is an exact ratio of integers; scaling by the plane
        # size recovers the integer luma sum on both engines
        F.round(F.col("mean_luma") * w * h).cast("bigint").alias("luma_sum"),
    )


ORACLES["multimodal_frame_sampling"] = """
    WITH m AS (
        SELECT t.i AS i, 3 + t.i AS nf, (3 + t.i) * 200 AS dur
        FROM range(6) t(i)
    ), ts AS (
        SELECT i, nf,
               CAST(unnest(range(0, greatest(dur, 1), 300)) AS INT) AS ts_ms
        FROM m
    ), fr AS (
        SELECT i, ts_ms,
               least(nf - 1, ts_ms * 5 // 1000) AS idx
        FROM ts
    )
    SELECT CAST(fr.i AS BIGINT) AS media_id, fr.ts_ms,
           CAST(fr.idx AS INT) AS frame_index,
           CAST(SUM((fr.idx*17 + y.y*5 + x.x*3 + fr.i) % 256) AS BIGINT)
             AS luma_sum
    FROM fr, range(8) y(y), range(16) x(x)
    GROUP BY fr.i, fr.ts_ms, fr.idx
"""

QUERIES["multimodal_frame_sampling"] = multimodal_frame_sampling


# --------------------------------------------------------------------------
# Canonical-vs-extra split (VERDICT r2 item 1): the driver checks only the
# first 50 entries of the merged queries() dict, so the canonical registry
# must stay <= 50 with every SURVEY §2 operator inside the window. Entries
# whose §2 coverage duplicates a canonical KG-native entry move to the
# EXTRA registry: still run against their DuckDB oracles by pytest
# (tests/test_queries_oracle.py iterates canonical + extra), invisible to
# the driver.
# --------------------------------------------------------------------------

QUERIES_EXTRA: Dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES_EXTRA: Dict[str, str] = {}
for _retired in [
    "q1_pricing_summary",      # TPC-H analogue; q3_shipping_topk keeps the slot
    "q5_local_volume",         # 6-way join analogue; a4_distinct_rollup covers A4
    "f2_variant_fanout",       # F2 canonical: kg_family_digests (f2_phe_statements)
    "f3_statement_typing",     # F3 canonical: kg_family_digests (f3_statement_types_kg)
    "a2_sequential_counters",  # A2 canonical: kg_family_digests (a2_counter_labels_kg)
]:
    QUERIES_EXTRA[_retired] = QUERIES.pop(_retired)
    ORACLES_EXTRA[_retired] = ORACLES.pop(_retired)


# --------------------------------------------------------------------------
# Round-4 consolidation (VERDICT r3 item 2): fold the streaming pair and
# the five text-analysis entries into two suites (same escaped-stringify
# mechanism as the KG-side suites) to restore driver-window headroom.
# The granular members stay pytest-oracled in QUERIES_EXTRA.
# --------------------------------------------------------------------------

_SUITES_REL = {
    "stream_suite": [
        (events_sessionize, ["user_id", "n_sessions"]),
        (w1_tumbling_window, ["hour", "event_type", "n", "v_cents"]),
    ],
    "text_analysis_suite": [
        (text_token_stats, ["doc_id", "n_tokens", "n_uniq", "avg_len_x100"]),
        (text_langid, ["doc_id", "n_stop", "lang_guess"]),
        (text_quality_score, ["doc_id", "n_tokens", "n_stopwords",
                              "mean_wordlen_x100", "uniq_ratio_x1000",
                              "quality_score"]),
        (text_fingerprint, ["doc_id", "fp"]),
        (text_winnow_fingerprint, ["doc_id", "content_fp", "n_winnowed",
                                   "winnow_fp"]),
    ],
}

for _sname, _specs in _SUITES_REL.items():
    _sq = make_suite_query(_specs)
    _sq.__name__ = _sname
    QUERIES[_sname] = _sq
    ORACLES[_sname] = make_suite_oracle(_specs, ORACLES)

for _g in [fn.__name__ for specs in _SUITES_REL.values() for (fn, _c) in specs]:
    QUERIES_EXTRA[_g] = QUERIES.pop(_g)
    ORACLES_EXTRA[_g] = ORACLES.pop(_g)


def j1_fuzzy_fill(spark, sf_dir):
    """J1 similarity tier, driver-visible (the north-star generalization
    of the reference's exact-match-only vocabulary fill,
    main.py:296-343; operators/linking.py::fuzzy_match_labels):
    character-3-gram Dice matching of perturbed mention labels (each
    nation name + a trailing 'x') against the nation-name vocabulary.
    The exact tier stays first in the pipeline (reference parity); this
    entry exercises the similarity tier itself against a full DuckDB
    twin of the n-gram/Dice algebra. Score ships as x1e4 integer via
    floor(round(score,4)*1e4 + 0.5) so the value hash is float-free."""
    from rdf_generator_spark.operators.linking import fuzzy_match_labels

    n = _t(spark, sf_dir, "nation")
    mentions = n.select(F.concat(F.col("n_name"), F.lit("x")).alias("label"))
    vocab = n.select(
        F.lower(F.col("n_name")).alias("norm_label"),
        F.concat(F.lit("uri:"), F.col("n_name")).alias("uri"),
    )
    fz = fuzzy_match_labels(mentions, vocab, threshold=0.7)
    return fz.select(
        "label", "uri",
        F.floor(F.col("score") * 10000 + F.lit(0.5)).cast("bigint")
        .alias("score_x1e4"),
    )


# Full algebra twin: same padding, 3-gram windows, distinct gram sets,
# Dice = 2*overlap/(n_m+n_v) (double division on both engines), same
# >=0.7 filter on the raw score, same (score DESC, uri) best-match
# window, and the same round(.,4) -> floor(x*1e4+0.5) integerization.
ORACLES["j1_fuzzy_fill"] = """
    WITH m AS (
        SELECT DISTINCT n_name || 'x' AS label,
               ' ' || lower(n_name || 'x') || ' ' AS padded
        FROM nation
    ),
    mg0 AS (
        SELECT label,
               list_distinct(list_transform(
                   range(1, GREATEST(length(padded) - 2, 1) + 1),
                   i -> substr(padded, CAST(i AS INT), 3))) AS gs
        FROM m
    ),
    mg AS (SELECT label, unnest(gs) AS g, len(gs) AS n_m FROM mg0),
    v AS (
        SELECT lower(n_name) AS v_label, 'uri:' || n_name AS uri,
               ' ' || lower(n_name) || ' ' AS padded
        FROM nation
    ),
    vg0 AS (
        SELECT v_label, uri,
               list_distinct(list_transform(
                   range(1, GREATEST(length(padded) - 2, 1) + 1),
                   i -> substr(padded, CAST(i AS INT), 3))) AS gs
        FROM v
    ),
    vg AS (SELECT v_label, uri, unnest(gs) AS g, len(gs) AS n_v FROM vg0),
    scored AS (
        SELECT label, v_label, uri, n_m, n_v, COUNT(*) AS overlap,
               2 * COUNT(*) / (n_m + n_v) AS score
        FROM mg JOIN vg USING (g)
        GROUP BY label, v_label, uri, n_m, n_v
    ),
    best AS (
        SELECT label, uri, score,
               ROW_NUMBER() OVER (PARTITION BY label
                                  ORDER BY score DESC, uri) AS rn
        FROM scored WHERE score >= 0.7
    )
    SELECT label, uri,
           CAST(FLOOR(ROUND(score, 4) * 10000 + 0.5) AS BIGINT) AS score_x1e4
    FROM best WHERE rn = 1
"""

QUERIES["j1_fuzzy_fill"] = j1_fuzzy_fill


def text_vocab_top(spark, sf_dir):
    """Corpus vocabulary build (tokenizer shape): global token counts,
    min_count floor, deterministic top-N (textops/analysis.py::
    build_vocab; TakeOrderedAndProject top-N, single bounded shuffle)."""
    from rdf_generator_spark.textops.analysis import build_vocab

    return build_vocab(
        _t(spark, sf_dir, "documents"), min_count=2, top_n=200
    )


ORACLES["text_vocab_top"] = """
    WITH toks AS (
        SELECT lower(t.tok) AS tok
        FROM documents, UNNEST(string_split_regex(text, '\\s+')) AS t(tok)
        WHERE t.tok <> ''
    ),
    c AS (
        SELECT tok, COUNT(*) AS cnt FROM toks
        GROUP BY tok HAVING COUNT(*) >= 2
    )
    SELECT ROW_NUMBER() OVER (ORDER BY cnt DESC, tok) AS rank, tok, cnt
    FROM c
    QUALIFY rank <= 200
"""

QUERIES["text_vocab_top"] = text_vocab_top


def text_repetition_score(spark, sf_dir):
    """Intra-document 3-gram repetition quality signal
    (textops/analysis.py::repetition_score) — integer-exact per-row
    array algebra, no shuffle."""
    from rdf_generator_spark.textops.analysis import repetition_score

    return repetition_score(_t(spark, sf_dir, "documents"), n=3)


ORACLES["text_repetition_score"] = """
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\\s+'),
                           t -> t <> '') AS ts
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               list_transform(
                   range(0, GREATEST(len(ts) - 3, 0) + 1),
                   i -> array_to_string(
                       ts[CAST(i + 1 AS INT):CAST(i + 3 AS INT)], ' '))
                 AS gs
        FROM d
    )
    SELECT doc_id,
           CAST(len(gs) AS INT) AS n_ngrams,
           CAST(len(list_distinct(gs)) AS INT) AS n_uniq_ngrams,
           CAST(FLOOR(1000 * (len(gs) - len(list_distinct(gs)))
                      / GREATEST(len(gs), 1)) AS BIGINT) AS dup_ratio_x1000
    FROM g
"""

QUERIES["text_repetition_score"] = text_repetition_score


def text_stratified_sample(spark, sf_dir):
    """Per-stratum quota sampling (training-mix shape): at most 30 docs
    per source, selected by smallest md5(seed:doc_id) — deterministic
    and retry-stable (textops/sampling.py::stratified_sample).
    Registered as an EXTRA entry (pytest-oracled) to preserve
    driver-window headroom."""
    from rdf_generator_spark.textops.sampling import stratified_sample

    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    return stratified_sample(d, "source", cap=30, seed=7)


ORACLES["text_stratified_sample"] = """
    SELECT doc_id, source FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (
                   PARTITION BY source
                   ORDER BY md5('7:' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS rk
        FROM documents
    ) t WHERE rk <= 30
"""

QUERIES["text_stratified_sample"] = text_stratified_sample


# --------------------------------------------------------------------------
# Round-5 consolidation (VERDICT r4 item 4): fold the three sampling
# operators — deterministic Bernoulli, sequence packing, stratified
# quota — into one driver-visible `sampling_suite` via the same
# escaped-stringify suite mechanism. This promotes the round-4
# stratified-sample operator into the driver window while NETTING a
# slot back (3 granular entries -> 1 suite row, registry 48 -> 47).
# The granular members stay pytest-oracled in QUERIES_EXTRA.
# --------------------------------------------------------------------------

_SAMPLING_SUITE = [
    (text_sample_deterministic, ["doc_id"]),
    (text_pack_sequences, ["doc_id", "bucket", "pack_id", "n_tokens"]),
    (text_stratified_sample, ["doc_id", "source"]),
]
_samp_q = make_suite_query(_SAMPLING_SUITE)
_samp_q.__name__ = "sampling_suite"
QUERIES["sampling_suite"] = _samp_q
ORACLES["sampling_suite"] = make_suite_oracle(_SAMPLING_SUITE, ORACLES)

for _g in ("text_sample_deterministic", "text_pack_sequences",
           "text_stratified_sample"):
    QUERIES_EXTRA[_g] = QUERIES.pop(_g)
    ORACLES_EXTRA[_g] = ORACLES.pop(_g)
