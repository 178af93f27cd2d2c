from __future__ import annotations

from rdf_generator_spark.sources import parsers
from rdf_generator_spark.sources.corpus import build_label_index, vocab_df_from_corpus

from tests.fixtures import golden_corpus_df, golden_corpus_rows


def test_parse_chars(spark):
    chars = parsers.parse_char_docs(golden_corpus_df(spark)).orderBy("char_pos").collect()
    assert len(chars) == 10
    c1 = chars[0]
    assert c1["char_id"] == "C1"
    assert c1["org_label"] == "adult organism"
    assert c1["org_uri"].endswith("UBERON_0007023")
    assert [l["label"] for l in c1["locators"]] == ["labrum"]
    assert c1["has_variable"] and c1["var_label"] == "width"
    assert c1["var_comment"] == "relative to length"
    assert [s["label"] for s in c1["states"]] == ["broader", "narrower"]
    assert c1["states"][0]["uri"] is None
    c5 = chars[4]
    assert not c5["has_variable"] and c5["tag"] == "neomorphic"
    c6 = chars[5]
    assert len(c6["locators"]) == 4
    assert c6["locators"][1]["uri"] is None


def test_parse_nexus(spark):
    cells = parsers.parse_nexus_docs(golden_corpus_df(spark)).collect()
    assert len(cells) == 100
    by = {(c["taxon"], c["char_index"]): c for c in cells}
    assert by[("Arhysoceble_picta", 0)]["symbol"] == "0"
    assert by[("Arhysoceble_picta", 0)]["taxon_pos"] == 0
    assert by[("Anthidium_porterae", 0)]["symbol"] == "1"
    assert by[("Meganomia_gigas", 8)]["symbol"] == "-"
    assert by[("Augochlora_pura", 9)]["taxon_pos"] == 9
    gaps = [c for c in cells if c["symbol"] == "-"]
    assert len(gaps) == 3


def test_parse_species(spark):
    sp = parsers.parse_species_docs(golden_corpus_df(spark)).orderBy("sp_pos").collect()
    assert len(sp) == 10
    assert sp[0]["input_name"] == "Ancyloscelis_apiformis"
    assert sp[0]["valid_name"] == "Ancyloscelis_apiformis_(Fabricius,_1793)"
    assert sp[0]["gbif_id"] == "5039694"
    assert sp[0]["zoobank_id"] is None


def test_parse_metadata(spark):
    meta = parsers.parse_metadata_docs(golden_corpus_df(spark)).collect()
    assert len(meta) == 10
    m = {r["char_id"]: r["source_text"] for r in meta}
    assert m["C1"] == "character 7 of Roig-Alsina and Michener (1993)"


def test_owl_label_index(spark):
    owl = next(r for r in golden_corpus_rows() if r[3] == "owl")
    index = build_label_index(owl[4])
    assert len(index) == 320
    assert index["about the same"].endswith("pmck.owl#PMCK_0000005")
    assert "glossal rod" in index
    vocab = vocab_df_from_corpus(spark, golden_corpus_df(spark))
    assert vocab.count() == 320


def test_fill_stats_matches_reference_counts(spark):
    """The reference logs filled=17 unresolved=3 on the example corpus
    (J1 summary, main.py:531-535 — 3 misses are the negation labels)."""
    from rdf_generator_spark.operators.linking import fill_stats
    from rdf_generator_spark.sources import parsers
    from rdf_generator_spark.sources.corpus import vocab_df_from_corpus

    corpus = golden_corpus_df(spark)
    chars = parsers.parse_char_docs(corpus)
    vocab = vocab_df_from_corpus(spark, corpus)
    row = fill_stats(chars, vocab).collect()
    assert len(row) == 1
    assert row[0]["filled"] == 17 and row[0]["unresolved"] == 3


def test_fuzzy_match_labels(spark):
    """Similarity tier: misspelled mentions resolve to the nearest vocab
    label; unrelated mentions stay unresolved."""
    from rdf_generator_spark.operators.linking import fuzzy_match_labels
    from rdf_generator_spark.sources.corpus import vocab_df_from_corpus

    vocab = vocab_df_from_corpus(spark, golden_corpus_df(spark))
    mentions = spark.createDataFrame(
        [("glosal rod",), ("Basal  Area",), ("zzz qqq xxx",)], ["label"]
    )
    got = {r["label"]: r["uri"] for r in
           fuzzy_match_labels(mentions, vocab, threshold=0.6).collect()}
    assert got.get("glosal rod", "").endswith("#SYN_") is False
    assert "glosal rod" in got  # typo resolved
    assert "Basal  Area" in got  # case/whitespace resolved
    assert "zzz qqq xxx" not in got  # garbage stays unresolved
    # the typo resolves to the right concept
    idx = {r["norm_label"]: r["uri"] for r in vocab.collect()}
    assert got["glosal rod"] == idx["glossal rod"]
    assert got["Basal  Area"] == idx["basal area"]


def test_fuzzy_tier_wired_into_fill(spark):
    """Opt-in fuzzy second pass: a misspelled locator label resolves at
    threshold; the default (exact-only) path leaves it missing and the
    fill_stats tiers account for the difference."""
    from pyspark.sql import functions as F

    from rdf_generator_spark.operators.linking import (
        fill_character_uris, fill_stats,
    )
    from rdf_generator_spark.sources import parsers
    from rdf_generator_spark.sources.corpus import vocab_df_from_corpus

    corpus = golden_corpus_df(spark)
    vocab = vocab_df_from_corpus(spark, corpus)
    chars = parsers.parse_char_docs(corpus)
    # plant a typo'd locator with no URI ("glosal rod" ~ "glossal rod")
    chars = chars.withColumn(
        "locators",
        F.concat(
            F.col("locators"),
            F.array(F.struct(F.lit("glosal rod").alias("label"),
                             F.lit(None).cast("string").alias("uri"))),
        ),
    )

    def typo_uris(df):
        return {
            r["u"]
            for r in df.select(F.explode("locators").alias("m"))
            .filter(F.col("m.label") == "glosal rod")
            .select(F.col("m.uri").alias("u")).collect()
        }

    exact = fill_character_uris(chars, vocab)
    assert typo_uris(exact) == {None}

    fuzzy = fill_character_uris(chars, vocab, fuzzy_threshold=0.6)
    got = typo_uris(fuzzy)
    idx = {r["norm_label"]: r["uri"] for r in vocab.collect()}
    assert got == {idx["glossal rod"]}

    stats = fill_stats(chars, vocab, fuzzy_threshold=0.6).collect()[0]
    # 17 exact (reference parity), the planted typo resolves fuzzily,
    # the 3 negation labels stay unresolved
    assert stats["filled"] == 17
    assert stats["filled_fuzzy"] >= 10  # typo'd locator on every char row
    assert stats["unresolved"] == 3
