"""Training-data pipeline operators: dedup, similarity, analysis,
multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rdf_generator_spark.textops import analysis, dedupe, multimodal, similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def embeds(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_exact_dup_groups(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y")], ["doc_id", "text"]
    )
    got = {r["keeper"]: r["n"] for r in dedupe.exact_dup_groups(df).collect()}
    assert got == {1: 2, 3: 1}
    with_m = {r["keeper"]: (r["n"], sorted(r["members"])) for r in
              dedupe.exact_dup_groups(df, max_members=10).collect()}
    assert with_m == {1: (2, [1, 2]), 3: (1, [3])}


def test_quantize_embeddings_randomized_invariants(spark):
    """Seeded random vectors (incl. negatives, tiny and huge magnitudes):
    |q| <= 127 always, and dequantized values reconstruct within
    scale/2 per component."""
    import random

    rng = random.Random(99)
    rows = []
    for i in range(200):
        mag = 10.0 ** rng.randint(-6, 6)
        rows.append((i, [rng.uniform(-mag, mag) for _ in range(16)]))
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = similarity.quantize_embeddings(df).collect()
    assert len(out) == 200 * 16
    import struct

    f32 = lambda x: struct.unpack("f", struct.pack("f", x))[0]  # noqa: E731
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], {})[r["dim"]] = (r["q"], r["scale_ppb"])
    for i, vec in rows:
        scale = max(abs(f32(x)) for x in vec) / 127.0
        for d, x in enumerate(vec):
            q, sppb = by_vec[i][d]
            assert -127 <= q <= 127
            assert sppb == int(scale * 1e9) or abs(sppb - scale * 1e9) <= 1
            assert abs(q * scale - f32(x)) <= scale / 2 + 1e-12


def test_sample_and_pack_randomized_invariants(spark):
    """Seeded random corpus: sampling is a deterministic subset at any
    fraction (0 and 1 edges exact); packing conserves rows and respects
    the streaming budget bound for several (max_tokens, buckets)."""
    import random

    from rdf_generator_spark.textops.sampling import (
        deterministic_sample, pack_sequences,
    )

    rng = random.Random(4242)
    rows = [(i, " ".join(["w"] * rng.randint(1, 300))) for i in range(500)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert deterministic_sample(df, 0.0, seed=3).count() == 0
    assert deterministic_sample(df, 1.0, seed=3).count() == 500
    for mt, b in [(500, 2), (1000, 8), (10_000, 1)]:
        out = pack_sequences(df, max_tokens=mt, buckets=b).collect()
        assert len(out) == 500
        packs = {}
        for r in out:
            assert 0 <= r["bucket"] < b
            packs.setdefault((r["bucket"], r["pack_id"]), []).append(r["n_tokens"])
        for sizes in packs.values():
            assert sum(sizes) <= mt + max(sizes)


def test_quantize_embeddings_roundtrip(spark):
    from rdf_generator_spark.textops.similarity import quantize_embeddings

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> scale 0, all q 0
        (3, [127.0, -127.0, 63.5, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = quantize_embeddings(df).collect()
    by_vec = {}
    for r in out:
        by_vec.setdefault(r["vec_id"], {})[r["dim"]] = (r["q"], r["scale_ppb"])
    assert {d for d in by_vec[1]} == {0, 1, 2, 3}
    # vec 1: scale = 1.0/127; q = round(v * 127)
    assert [by_vec[1][d][0] for d in range(4)] == [64, -127, 32, 0]
    assert all(q == 0 and s == 0 for q, s in by_vec[2].values())
    # reconstruction error bounded by scale/2 per component
    scale3 = by_vec[3][0][1] / 1e9
    recon = [by_vec[3][d][0] * scale3 for d in range(4)]
    for got, want in zip(recon, rows[2][1]):
        assert abs(got - want) <= scale3 / 2 + 1e-9


def test_deterministic_sample_properties(spark):
    from rdf_generator_spark.textops.sampling import deterministic_sample

    df = spark.range(10_000).select(F.col("id").alias("doc_id"))
    s1 = {r["doc_id"] for r in deterministic_sample(df, 0.3, seed=1).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df, 0.3, seed=1).collect()}
    assert s1 == s2  # retry-stable
    # fraction within binomial tolerance
    assert 0.25 < len(s1) / 10_000 < 0.35
    # monotone in fraction: 0.1 sample is a subset of the 0.3 sample
    s_small = {r["doc_id"] for r in deterministic_sample(df, 0.1, seed=1).collect()}
    assert s_small < s1
    # different seed -> different membership
    s3 = {r["doc_id"] for r in deterministic_sample(df, 0.3, seed=2).collect()}
    assert s3 != s1


def test_pack_sequences_budget(spark):
    from rdf_generator_spark.textops.sampling import pack_sequences

    rows = [(i, " ".join(["tok"] * (50 + (i * 37) % 400))) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = pack_sequences(df, max_tokens=1000, buckets=4).collect()
    assert len(out) == 300  # no document dropped or split
    packs = {}
    for r in out:
        packs.setdefault((r["bucket"], r["pack_id"]), []).append(r["n_tokens"])
    for (b, p), sizes in packs.items():
        # streaming-packing bound: a pack may overflow by at most its
        # last (straddling) document
        assert sum(sizes) <= 1000 + max(sizes), (b, p, sizes)
    # pack ids are contiguous from 0 within each bucket
    by_bucket = {}
    for (b, p), _ in packs.items():
        by_bucket.setdefault(b, set()).add(p)
    for b, pids in by_bucket.items():
        assert pids == set(range(len(pids))), (b, pids)


def test_exact_dup_groups_hot_key_bounded(spark):
    """A viral duplicate (10^5 copies of one text) must not blow an
    aggregation buffer: members are capped at max_members, counts stay
    exact."""
    hot = spark.range(100_000).select(
        F.col("id").alias("doc_id"), F.lit("same viral text").alias("text")
    )
    cold = spark.createDataFrame([(200_000, "unique text")], ["doc_id", "text"])
    out = dedupe.exact_dup_groups(
        hot.unionByName(cold), max_members=16
    ).collect()
    by_keeper = {r["keeper"]: r for r in out}
    assert by_keeper[0]["n"] == 100_000
    assert by_keeper[0]["members"] == list(range(16))
    assert by_keeper[200_000]["n"] == 1 and by_keeper[200_000]["members"] == [200_000]


def test_minhash_recovers_exact_dups(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta"),
         (3, "one two three four")],
        ["doc_id", "text"],
    )
    pairs = {(r["d1"], r["d2"]) for r in dedupe.minhash_lsh_pairs(df).collect()}
    assert (1, 2) in pairs and (1, 3) not in pairs


def test_jaccard_pairs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g x"), (3, "p q r s")],
        ["doc_id", "text"],
    )
    got = dedupe.jaccard_pairs(df, threshold=0.5, shingle_k=1).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["d1"], r["d2"]) == (1, 2) and abs(r["jaccard"] - 7 / 9) < 1e-9


def test_simhash_near_pairs(spark, docs):
    small = docs.limit(40)
    dup = small.withColumn("doc_id", F.col("doc_id") + 100000)
    fps = dedupe.simhash(small.unionByName(dup))
    assert fps.count() == 80
    pairs = dedupe.simhash_near_pairs(fps, max_hamming=0)
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    # every doc pairs with its exact copy at hamming 0
    for r in small.select("doc_id").collect():
        assert (r["doc_id"], r["doc_id"] + 100000) in got


def test_embedding_neardup(spark, embeds):
    sub = embeds.limit(60)
    dup = sub.withColumn("vec_id", F.col("vec_id") + 100000)
    pairs = dedupe.embedding_neardup_pairs(sub.unionByName(dup), threshold=0.999)
    got = {(r["d1"], r["d2"]) for r in pairs.collect()}
    ids = [r["vec_id"] for r in sub.select("vec_id").collect()]
    hits = sum((i, i + 100000) in got for i in ids)
    assert hits == len(ids)  # identical vectors always bucket together


def test_brute_force_vs_ivf_recall(spark, embeds):
    vecs = embeds.select("vec_id", "embedding")
    queries = vecs.limit(5).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = similarity.brute_force_topk(vecs, queries, k=5)
    cents, assign = similarity.ivf_build(vecs, n_cells=8, iters=2)
    approx = similarity.ivf_topk(vecs, assign, cents, queries, k=5, n_probe=4)
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.5, recall  # probing half the cells on random data


def test_token_stats_and_langid(spark, docs):
    stats = analysis.token_stats(docs).limit(5).collect()
    for r in stats:
        assert r["n_ws_tokens"] > 0 and r["n_subword_tokens"] >= r["n_ws_tokens"] - 1
    lang = analysis.lang_id(docs)
    assert lang.filter(F.col("lang_guess") == "en").count() > 0


def test_quality_and_fingerprint(spark, docs):
    q = analysis.quality_score(docs).limit(5).collect()
    for r in q:
        assert 0 <= r["quality_score"] <= 100
    fp = analysis.fingerprint(docs, window=4)
    row = fp.first()
    assert len(row["content_fp"]) == 32 and len(row["winnow_fp"]) == 32
    # winnow fingerprint robust to trailing whitespace
    fp2 = analysis.fingerprint(
        docs.withColumn("text", F.concat(F.col("text"), F.lit("   "))), window=4
    )
    a = {r["doc_id"]: r["winnow_fp"] for r in fp.collect()}
    b = {r["doc_id"]: r["winnow_fp"] for r in fp2.collect()}
    assert a == b


def test_multimodal_plumbing(spark):
    rows = [
        (1, "image", bytearray(b"\x89PNGfakebytes"), ("image/png", 64, 64, None)),
        (2, "video", bytearray(b"fakevideobytes"), ("video/mp4", 320, 240, 3500)),
        (3, "audio", None, ("audio/wav", None, None, 1200)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    feats = multimodal.extract_features(media, dim=8).collect()
    assert {r["media_id"] for r in feats} == {1, 2, 3}
    by = {r["media_id"]: r for r in feats}
    assert len(by[1]["feature"]) == 8
    assert by[3]["n_bytes"] == 0
    # determinism
    feats2 = multimodal.extract_features(media, dim=8).collect()
    assert sorted(map(str, feats)) == sorted(map(str, feats2))
    frames = multimodal.sample_frames(media, every_ms=1000).collect()
    assert {r["ts_ms"] for r in frames} == {0, 1000, 2000, 3000}
    # compressed/unknown formats still hit the honest codec boundary
    with pytest.raises(Exception):
        multimodal.extract_features(media, fake=False).collect()


def test_codecs_roundtrip():
    """Pure-numpy codec layer (VERDICT r4 item 3): encode -> decode is
    identity for BMP/PPM/PGM/WAV-PCM/Y4M; malformed input raises
    ValueError; in-family variants needing a real codec raise
    NotImplementedError."""
    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    rng = np.random.RandomState(42)
    img = rng.randint(0, 256, (13, 17, 3), dtype=np.uint8)
    assert (C.decode_bmp(C.encode_bmp(img)) == img).all()
    assert (C.decode_ppm(C.encode_ppm(img)) == img).all()
    gray = rng.randint(0, 256, (9, 11), dtype=np.uint8)
    assert (C.decode_pgm(C.encode_pgm(gray)) == gray[:, :, None]).all()
    s = rng.randint(-32768, 32767, (1000, 2)).astype(np.int16)
    dec, rate = C.decode_wav_pcm(C.encode_wav_pcm(s, 8000))
    assert rate == 8000 and dec.shape == (1000, 2)
    assert np.allclose(dec, s / 32768.0, atol=1e-6)
    luma = rng.randint(0, 256, (5, 12, 16), dtype=np.uint8)
    fr, fps = C.decode_y4m(C.encode_y4m(luma, (30, 1)))
    assert fps == (30, 1) and (fr == luma).all()
    # sniff covers all five + compressed magics
    assert C.sniff(C.encode_bmp(img)) == "bmp"
    assert C.sniff(C.encode_wav_pcm(s, 8000)) == "wav"
    assert C.sniff(C.encode_y4m(luma)) == "y4m"
    assert C.sniff(b"\x89PNG\r\n") == "compressed"
    assert C.sniff(b"\xff\xd8\xff\xe0JFIF") == "compressed"
    with pytest.raises(ValueError):
        C.decode_bmp(b"not a bmp at all")
    with pytest.raises(ValueError):
        C.decode_y4m(C.encode_y4m(luma)[:-10])  # truncated frame
    with pytest.raises(NotImplementedError):
        # flip audio_format 1 -> 3 (IEEE float): needs a real codec
        C.decode_wav_pcm(
            C.encode_wav_pcm(s, 8000).replace(
                b"\x01\x00\x02\x00", b"\x03\x00\x02\x00", 1
            )
        )


def test_multimodal_real_decode(spark):
    """fake=False now decodes uncompressed containers for real through
    the mapInPandas stage — features carry the decoded geometry/stats,
    frame sampling hashes genuinely decoded luma planes."""
    import hashlib

    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    img = np.fromfunction(
        lambda y, x, c: (x * 3 + y * 5 + c * 7) % 256, (8, 16, 3)
    ).astype(np.uint8)
    s = (np.arange(400) % 200 - 100).astype(np.int16)
    luma = np.fromfunction(
        lambda f, y, x: (f * 11 + y * 2 + x) % 256, (4, 8, 16)
    ).astype(np.uint8)
    rows = [
        (1, "image", bytearray(C.encode_bmp(img)), ("image/bmp", 16, 8, None)),
        (2, "image", bytearray(C.encode_ppm(img)), ("image/ppm", 16, 8, None)),
        (3, "audio", bytearray(C.encode_wav_pcm(s[:, None], 16000)),
         ("audio/wav", None, None, None)),
        (4, "video", bytearray(C.encode_y4m(luma, (10, 1))),
         ("video/y4m", 16, 8, 400)),
    ]
    media = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    by = {
        r["media_id"]: r
        for r in multimodal.extract_features(media, dim=8, fake=False).collect()
    }
    assert by[1]["format"] == "bmp" and by[2]["format"] == "ppm"
    for mid in (1, 2):  # same pixels through two different containers
        f = by[mid]["feature"]
        assert f[:3] == [16.0, 8.0, 3.0]
        assert abs(f[3] - img.mean()) < 1e-3
    f3 = by[3]["feature"]
    assert by[3]["format"] == "wav"
    assert f3[0] == 400.0 and f3[1] == 1.0 and f3[2] == 16000.0
    assert by[4]["format"] == "y4m"
    assert by[4]["feature"][:4] == [4.0, 16.0, 8.0, 10.0]
    # frame sampling: 400 ms at 10 fps, every 150 ms -> ts 0/150/300 ->
    # frame indices 0/1/3, hashes of the REAL decoded planes
    frames = multimodal.sample_frames(media, every_ms=150, fake=False).collect()
    got = {r["ts_ms"]: r for r in frames}
    assert sorted(got) == [0, 150, 300]
    assert [got[t]["frame_index"] for t in (0, 150, 300)] == [0, 1, 3]
    for t in (0, 150, 300):
        idx = got[t]["frame_index"]
        assert got[t]["frame_sha256"] == hashlib.sha256(
            luma[idx].tobytes()
        ).hexdigest()
        assert abs(got[t]["mean_luma"] - luma[idx].mean()) < 1e-9


def test_near_dup_groups_end_to_end(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup
        (3, "the quick brown fox jumps over the lazy cat today"),  # near dup
        (4, "completely different content about spark pipelines here"),
        (5, "another unrelated document with its own words entirely"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    groups = dedupe.near_dup_groups(df, threshold=0.5, shingle_k=2,
                                    num_hashes=16, bands=8)
    got = {(r["doc_id"], r["keeper"], r["group_size"]) for r in groups.collect()}
    # docs 1,2,3 form one group with keeper "1"; 4 and 5 are not grouped
    assert got == {("1", "1", 3), ("2", "1", 3), ("3", "1", 3)}


def test_near_dup_groups_strict_on_truncated_cc(spark):
    """VERDICT r4 item 5: production paths must fail loudly when the
    connected-components budget is exhausted, never ship partially
    merged keeper groups. cc_max_iters=0 models a truncated run."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    with pytest.raises(RuntimeError, match="did not reach a verified fixpoint"):
        dedupe.near_dup_groups(
            df, threshold=0.5, shingle_k=2, num_hashes=16, bands=8,
            cc_max_iters=0,
        ).collect()
    # strict=False restores the old warn-and-continue behavior
    with pytest.warns(RuntimeWarning, match="did not reach a verified fixpoint"):
        dedupe.near_dup_groups(
            df, threshold=0.5, shingle_k=2, num_hashes=16, bands=8,
            cc_max_iters=0, strict=False,
        ).collect()


def test_jaccard_max_doc_freq_cap(spark):
    """Standalone-safe Jaccard: a corpus-wide hot shingle is dropped
    before the self-join; a genuine near-dup pair still verifies."""
    common = "the quick brown"  # one 3-shingle shared by EVERY doc
    rows = [(i, f"{common} filler{i} pad{i} end{i}") for i in range(1, 9)]
    rows += [(100, common + " same same same same"),
             (101, common + " same same same same")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = {
        (r["d1"], r["d2"])
        for r in dedupe.jaccard_pairs(
            df, threshold=0.5, shingle_k=3, max_doc_freq=5
        ).collect()
    }
    assert (100, 101) in capped            # near-dup survives the cap
    assert all(d1 >= 100 for d1, _ in capped)  # hot shingle created no pairs


def test_embedding_neardup_multiband_recall(spark):
    """Planted scaled copies (cosine exactly 1.0) are recovered with
    deterministic recall: sign(p.v) is scale-invariant so every band
    matches; nothing below threshold sneaks in (exact verify)."""
    import hashlib as _h
    import struct as _s

    def vec(seed, dim=16):
        out = []
        for i in range(dim):
            b = _h.md5(f"{seed}:{i}".encode()).digest()[:4]
            out.append(_s.unpack(">i", b)[0] / 2 ** 31)
        return out

    rows = [(i, vec(i)) for i in range(30)]
    rows += [(1000 + i, [2.0 * x for x in vec(i)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {
        (r["d1"], r["d2"])
        for r in dedupe.embedding_neardup_pairs(df, threshold=0.98).collect()
    }
    assert pairs == {(i, 1000 + i) for i in range(10)}


def test_redact_pii(spark):
    df = spark.createDataFrame(
        [(1, "mail me at jo.doe+x@corp.example.com or +4915112345678"),
         (2, "server at 10.0.0.1 and 192.168.1.255, version 1.2"),
         (3, "clean text, no pii")],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: r for r in analysis.redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "[EMAIL]" in got[1]["redacted_text"]
    assert "[PHONE]" in got[1]["redacted_text"]
    assert "jo.doe" not in got[1]["redacted_text"]
    assert got[2]["n_ipv4"] == 2
    assert got[2]["redacted_text"].count("[IPV4]") == 2
    assert "version 1.2" in got[2]["redacted_text"]  # not an IPv4
    assert got[3]["redacted_text"] == "clean text, no pii"


def test_decontaminate(spark):
    words = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [(1, words + " tail one"),            # contains the benchmark 13-gram
         (2, "totally different words " * 5),
         # w9 sits inside every 13-token window of a 20-token text,
         # so changing it breaks every shared shingle
         (3, words.replace("w9", "q9"))],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, words)], ["bench_id", "text"])
    pairs = {(r["doc_id"], r["bench_id"])
             for r in analysis.contamination_pairs(docs, bench, n=13).collect()}
    assert (1, 100) in pairs and all(d != 2 for d, _ in pairs)
    kept = {r["doc_id"] for r in analysis.decontaminate(docs, bench, n=13).collect()}
    assert kept == {2, 3}


def test_build_vocab(spark):
    docs = spark.createDataFrame(
        [(1, "b a a B c"), (2, "a b rare"), (3, "  a  ")],
        ["doc_id", "text"],
    )
    got = [tuple(r) for r in analysis.build_vocab(docs, min_count=2, top_n=10).collect()]
    # counts: a=4 (lowercased), b=3, c/rare=1 (dropped by min_count)
    assert got == [(1, "a", 4), (2, "b", 3)]
    # top_n cuts deterministically on (count desc, token asc)
    got1 = [r["tok"] for r in analysis.build_vocab(docs, min_count=1, top_n=3).collect()]
    assert got1 == ["a", "b", "c"]  # c before rare on the count-1 tie


def test_repetition_score(spark):
    docs = spark.createDataFrame(
        [(1, "x x x x x x"),       # all 3-grams identical -> 4 total, 1 uniq
         (2, "a b c d e"),         # all distinct
         (3, "a b"),               # shorter than n -> one truncated gram
         (4, "")],                 # empty -> one "" gram (house convention)
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_ngrams"], r["n_uniq_ngrams"], r["dup_ratio_x1000"])
           for r in analysis.repetition_score(docs, n=3).collect()}
    assert got[1] == (4, 1, 750)
    assert got[2] == (3, 3, 0)
    assert got[3] == (1, 1, 0)
    assert got[4] == (1, 1, 0)


def test_stratified_sample(spark):
    from rdf_generator_spark.textops.sampling import stratified_sample

    rows = [(i, "s%d" % (i % 3)) for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = stratified_sample(df, "source", cap=5, seed=1).collect()
    by_src = {}
    for r in got:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert all(len(v) == 5 for v in by_src.values()) and len(by_src) == 3
    # deterministic: same selection on re-run and after repartition
    again = stratified_sample(df.repartition(7), "source", cap=5, seed=1).collect()
    assert {(r["doc_id"], r["source"]) for r in again} == {
        (r["doc_id"], r["source"]) for r in got
    }
    # growing a stratum only displaces at the quota boundary
    bigger = spark.createDataFrame(rows + [(100, "s0")], ["doc_id", "source"])
    g2 = {r["doc_id"] for r in
          stratified_sample(bigger, "source", cap=5, seed=1).collect()
          if r["source"] == "s0"}
    assert len(g2) == 5 and len(g2 - by_src["s0"]) <= 1


def test_incremental_dedup(spark):
    """Cross-corpus incremental dedup: near-copy and exact copy of ref
    docs match (exact => jaccard 1), unrelated and sub-shingle-floor
    docs survive; ref-vs-ref near-dups never produce pairs."""
    ref = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "pack my box with five dozen liquor jugs right now"),
            # 3 is a near-dup of 1 INSIDE ref — must not appear in output
            (3, "the quick brown fox jumps over the lazy dog tonight"),
        ],
        ["doc_id", "text"],
    )
    new = spark.createDataFrame(
        [
            # near-copy of ref 1 (one token appended)
            (101, "the quick brown fox jumps over the lazy dog today extra"),
            # exact copy of ref 2
            (102, "pack my box with five dozen liquor jugs right now"),
            # unrelated
            (103, "completely different content with no shared trigrams at all"),
            # below the 3-shingle floor
            (104, "tiny doc"),
        ],
        ["doc_id", "text"],
    )
    m = dedupe.incremental_dedup_matches(new, ref, threshold=0.8, shingle_k=3)
    got = {(r["new_id"], r["ref_id"]): r["inter_cnt"] for r in m.collect()}
    assert set(got) == {(101, 1), (102, 2)}
    # exact copy: intersection == both sizes
    row = [r for r in m.collect() if r["new_id"] == 102][0]
    assert row["inter_cnt"] == row["sz_new"] == row["sz_ref"]
    surv = sorted(
        r["doc_id"]
        for r in dedupe.incremental_dedup_survivors(new, ref).collect()
    )
    assert surv == [103, 104]
