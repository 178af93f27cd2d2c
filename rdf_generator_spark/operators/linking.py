"""Entity linking: ontology-label URI fill (J1) and negation resolution (J2).

The reference does O(1) dict lookups against a label index
(/root/reference/rdf_generator/main.py:296-343, 566-572, 1018-1021).
Spark-first equivalent: the vocabulary is a broadcast dimension table and
every lookup is a broadcast hash join — no shuffle on the fact side except
the array-reassembly groupBy, which runs on the (small) characters table,
never on the cells fan-out.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rdf_generator_spark.normalize import norm_term_label, strip_col

DOC_KEYS = ("repo", "commit")


def missing_uri(c: Column) -> Column:
    """Fill condition (main.py:313-314): null, blank, or the string 'null'."""
    s = F.lower(strip_col(c))
    return c.isNull() | (s == "") | (s == "null")


def fill_scalar_uri(
    df: DataFrame, label_col: str, uri_col: str, vocab: DataFrame, enabled: Column = None
) -> DataFrame:
    """Broadcast-left-join fill of one (label, uri) slot."""
    v = F.broadcast(vocab.withColumnRenamed("uri", "__resolved"))
    cond = missing_uri(F.col(uri_col)) & (norm_term_label(F.col(label_col)) != "")
    if enabled is not None:
        cond = cond & enabled
    out = df.join(v, cond & (norm_term_label(F.col(label_col)) == v.norm_label), "left")
    return out.withColumn(
        uri_col,
        F.when(cond & F.col("__resolved").isNotNull(), F.col("__resolved")).otherwise(
            F.col(uri_col)
        ),
    ).drop("norm_label", "__resolved")


def fill_array_uris(
    df: DataFrame,
    array_col: str,
    vocab: DataFrame,
    id_cols: Sequence[str],
    extra_fields: Sequence[str] = (),
) -> DataFrame:
    """Fill `uri` inside an array<struct<label,uri[,...]>> column.

    posexplode -> broadcast join -> ordered re-assembly. The groupBy is
    keyed by the row identity (document + char_pos) so re-assembly is a
    narrow-ish shuffle on the dimension-sized characters table.
    """
    keys = list(id_cols)
    ex = df.select(*keys, F.posexplode_outer(array_col).alias("__pos", "__item"))
    item = F.col("__item")
    cond = missing_uri(item["uri"]) & (norm_term_label(item["label"]) != "")
    v = F.broadcast(vocab.withColumnRenamed("uri", "__resolved"))
    ex = ex.join(v, cond & (norm_term_label(item["label"]) == v.norm_label), "left")
    fields = [item["label"].alias("label"),
              F.when(cond & F.col("__resolved").isNotNull(), F.col("__resolved"))
               .otherwise(item["uri"]).alias("uri")]
    for f in extra_fields:
        fields.append(item[f].alias(f))
    new_item = F.struct(*fields)
    packed = F.when(F.col("__pos").isNotNull(), F.struct(F.col("__pos").alias("p"), new_item.alias("i")))
    regrouped = (
        ex.groupBy(*keys)
        .agg(F.sort_array(F.collect_list(packed)).alias("__packed"))
        .withColumn(array_col, F.expr("transform(__packed, x -> x.i)"))
        .drop("__packed")
    )
    return df.drop(array_col).join(regrouped, keys, "left")


def _missing_mention_labels(chars: DataFrame) -> DataFrame:
    """Distinct normalized labels of mentions whose URI slot is still
    missing after the exact tier — the fuzzy tier's candidate set."""
    org = chars.select(F.col("org_label").alias("label"), F.col("org_uri").alias("uri"))
    var = chars.filter(F.col("has_variable")).select(
        F.col("var_label").alias("label"), F.col("var_uri").alias("uri")
    )
    loc = chars.select(F.explode("locators").alias("m")).select(
        F.col("m.label").alias("label"), F.col("m.uri").alias("uri")
    )
    st = chars.select(F.explode("states").alias("m")).select(
        F.col("m.label").alias("label"), F.col("m.uri").alias("uri")
    )
    mentions = org.unionByName(var).unionByName(loc).unionByName(st)
    return (
        mentions.filter(
            missing_uri(F.col("uri")) & (norm_term_label(F.col("label")) != "")
            # negation-form state labels are J2's job (resolve to the
            # complement scaffold, F7) — fuzzy-matching "not pointed" to
            # "pointed" would silently flip the negation semantics
            & ~norm_term_label(F.col("label")).startswith("not ")
        )
        .select(norm_term_label(F.col("label")).alias("label"))
        .distinct()
    )


def fill_both_arrays_uris(
    df: DataFrame, vocab: DataFrame, id_cols: Sequence[str]
) -> DataFrame:
    """Fused fill of the `locators` and `states` array slots (round 6).

    `fill_array_uris` per column costs one explode + one groupBy
    exchange + one join-back each; tagging both arrays' elements with a
    kind and exploding them TOGETHER halves that machinery (one explode
    pass, one vocabulary join, one re-assembly aggregation, one
    join-back) while producing byte-identical arrays: positions are
    assigned within the concatenated (locators ++ states) array, so
    per-kind sort order equals the original element order."""
    keys = list(id_cols)
    loc_tagged = F.transform(
        F.col("locators"),
        lambda l: F.struct(
            F.lit("L").alias("kind"), l["label"].alias("label"),
            l["uri"].alias("uri"), F.lit(None).cast("string").alias("token"),
        ),
    )
    st_tagged = F.transform(
        F.col("states"),
        lambda s: F.struct(
            F.lit("S").alias("kind"), s["label"].alias("label"),
            s["uri"].alias("uri"), s["token"].alias("token"),
        ),
    )
    ex = df.select(
        *keys, F.posexplode_outer(F.concat(loc_tagged, st_tagged)).alias("__pos", "__item")
    )
    item = F.col("__item")
    cond = missing_uri(item["uri"]) & (norm_term_label(item["label"]) != "")
    v = F.broadcast(vocab.withColumnRenamed("uri", "__resolved"))
    ex = ex.join(v, cond & (norm_term_label(item["label"]) == v.norm_label), "left")
    filled_uri = (
        F.when(cond & F.col("__resolved").isNotNull(), F.col("__resolved"))
        .otherwise(item["uri"])
    )
    packed = lambda want, inner: F.when(  # noqa: E731
        F.col("__pos").isNotNull() & (item["kind"] == want),
        F.struct(F.col("__pos").alias("p"), inner.alias("i")),
    )
    loc_inner = F.struct(item["label"].alias("label"), filled_uri.alias("uri"))
    st_inner = F.struct(item["label"].alias("label"), filled_uri.alias("uri"),
                        item["token"].alias("token"))
    regrouped = (
        ex.groupBy(*keys)
        .agg(
            F.sort_array(F.collect_list(packed("L", loc_inner))).alias("__pl"),
            F.sort_array(F.collect_list(packed("S", st_inner))).alias("__ps"),
        )
        .withColumn("locators", F.expr("transform(__pl, x -> x.i)"))
        .withColumn("states", F.expr("transform(__ps, x -> x.i)"))
        .drop("__pl", "__ps")
    )
    return df.drop("locators", "states").join(regrouped, keys, "left")


def fill_character_uris(
    chars: DataFrame, vocab: DataFrame, fuzzy_threshold: float = None
) -> DataFrame:
    """apply_pmck_uri_fallbacks (main.py:296-343) over the parsed shape:
    Organism / Locators / Variable / States slots.

    Default is the reference's exact-match tier only (golden parity).
    With ``fuzzy_threshold`` set, exact-tier misses are routed through
    `fuzzy_match_labels` (character-n-gram Dice similarity >= threshold)
    as an opt-in second pass — a north-star generalization the exact
    reference cannot do. The fuzzy map is distinct-labels-sized (bounded
    by the vocabulary fan-in), so the second pass reuses the same
    broadcast-join fills."""
    keys = [*DOC_KEYS, "path", "char_pos"]

    def _fill_all(df, v):
        out = fill_scalar_uri(df, "org_label", "org_uri", v)
        out = fill_scalar_uri(out, "var_label", "var_uri", v,
                              enabled=F.col("has_variable"))
        out = fill_both_arrays_uris(out, v, keys)
        return out

    out = _fill_all(chars, vocab)
    if fuzzy_threshold is None:
        return out

    misses = _missing_mention_labels(out)
    fz = fuzzy_match_labels(misses, vocab, threshold=fuzzy_threshold)
    # inputs were pre-normalized, so the fuzzy output label IS the
    # norm_label key the fill joins expect
    fz_vocab = fz.select(F.col("label").alias("norm_label"), "uri")
    return _fill_all(out, fz_vocab)


def fuzzy_match_labels(
    mentions: DataFrame,
    vocab: DataFrame,
    label_col: str = "label",
    threshold: float = 0.7,
    ngram: int = 3,
) -> DataFrame:
    """Similarity tier of entity linking (north-star generalization of
    the reference's exact-match-only J1): batched candidate generation
    via character-n-gram overlap against the broadcast vocabulary,
    scored with Dice similarity, best-above-threshold per mention.

    Input: distinct mention labels. Output: (label, uri, score) for
    mentions resolvable at >= threshold. Keep the exact tier first;
    route only its misses here."""
    from pyspark.sql.window import Window

    def grams(c: Column) -> Column:
        padded = F.concat(F.lit(" "), norm_term_label(c), F.lit(" "))
        n = F.greatest(F.length(padded) - (ngram - 1), F.lit(1))
        return F.array_distinct(
            F.transform(F.sequence(F.lit(1), n), lambda i: padded.substr(i, F.lit(ngram)))
        )

    m = mentions.select(F.col(label_col).alias("label")).distinct().select(
        "label", F.explode(grams(F.col("label"))).alias("g"),
        F.size(grams(F.col("label"))).alias("n_m"),
    )
    v = vocab.select(
        F.col("norm_label").alias("v_label"), "uri",
        F.explode(grams(F.col("norm_label"))).alias("g"),
        F.size(grams(F.col("norm_label"))).alias("n_v"),
    )
    scored = (
        m.join(F.broadcast(v), "g")
        .groupBy("label", "v_label", "uri", "n_m", "n_v")
        .agg(F.count(F.lit(1)).alias("overlap"))
        .withColumn("score", 2 * F.col("overlap") / (F.col("n_m") + F.col("n_v")))
        .filter(F.col("score") >= threshold)
    )
    w = Window.partitionBy("label").orderBy(F.desc("score"), "uri")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("label", "uri", F.round("score", 4).alias("score"))
    )


def fill_stats(
    chars: DataFrame, vocab: DataFrame, fuzzy_threshold: float = None
) -> DataFrame:
    """J1 bookkeeping (main.py:302, 330-343): per document, how many
    missing-URI mentions were filled from the vocabulary vs left
    unresolved. One exploded mention table + one broadcast join.

    With ``fuzzy_threshold`` set the result distinguishes the resolution
    tier: (filled, filled_fuzzy, unresolved), where `filled` is the
    exact tier and exact-tier misses that the similarity tier resolves
    count as `filled_fuzzy`."""
    org = chars.select(
        *DOC_KEYS, F.col("org_label").alias("label"), F.col("org_uri").alias("uri")
    )
    var = chars.filter(F.col("has_variable")).select(
        *DOC_KEYS, F.col("var_label").alias("label"), F.col("var_uri").alias("uri")
    )
    loc = chars.select(*DOC_KEYS, F.explode("locators").alias("m")).select(
        *DOC_KEYS, F.col("m.label").alias("label"), F.col("m.uri").alias("uri")
    )
    st = chars.select(*DOC_KEYS, F.explode("states").alias("m")).select(
        *DOC_KEYS, F.col("m.label").alias("label"), F.col("m.uri").alias("uri")
    )
    mentions = org.unionByName(var).unionByName(loc).unionByName(st)
    cand = mentions.filter(
        missing_uri(F.col("uri")) & (norm_term_label(F.col("label")) != "")
    )
    v = F.broadcast(vocab.withColumnRenamed("uri", "__resolved"))
    joined = cand.join(
        v, norm_term_label(F.col("label")) == v.norm_label, "left"
    )
    if fuzzy_threshold is None:
        return joined.groupBy(*DOC_KEYS).agg(
            F.sum(F.when(F.col("__resolved").isNotNull(), 1).otherwise(0)).alias("filled"),
            F.sum(F.when(F.col("__resolved").isNull(), 1).otherwise(0)).alias("unresolved"),
        )
    misses = joined.filter(
        F.col("__resolved").isNull()
        & ~norm_term_label(F.col("label")).startswith("not ")
    ).select(norm_term_label(F.col("label")).alias("label")).distinct()
    fz = fuzzy_match_labels(misses, vocab, threshold=fuzzy_threshold).select(
        F.col("label").alias("__fz_label"), F.col("uri").alias("__fz_uri")
    )
    joined = joined.join(
        fz,
        F.col("__resolved").isNull()
        & (norm_term_label(F.col("label")) == F.col("__fz_label")),
        "left",
    )
    return joined.groupBy(*DOC_KEYS).agg(
        F.sum(F.when(F.col("__resolved").isNotNull(), 1).otherwise(0)).alias("filled"),
        F.sum(F.when(F.col("__resolved").isNull()
                     & F.col("__fz_uri").isNotNull(), 1).otherwise(0)).alias("filled_fuzzy"),
        F.sum(F.when(F.col("__resolved").isNull()
                     & F.col("__fz_uri").isNull(), 1).otherwise(0)).alias("unresolved"),
    )


def state_label_index(states_long: DataFrame) -> DataFrame:
    """J2 (main.py:566-572): dataset-wide raw-label -> first truthy URI,
    first-wins in (char order, state order).

    Input: long states table with doc keys + char_pos + state_idx +
    label + uri. Output: (doc keys, base_key, pos_uri).
    """
    from pyspark.sql.window import Window

    cand = states_long.filter(
        (F.coalesce(strip_col(F.col("label")), F.lit("")) != "")
        & F.col("uri").isNotNull()
        & (F.col("uri") != "")
    ).select(
        *DOC_KEYS,
        F.lower(strip_col(F.col("label"))).alias("base_key"),
        F.col("uri").alias("pos_uri"),
        "char_pos",
        "state_idx",
    )
    w = Window.partitionBy(*DOC_KEYS, "base_key").orderBy("char_pos", "state_idx")
    return (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(*DOC_KEYS, "base_key", "pos_uri")
    )
