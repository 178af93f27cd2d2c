"""Property-based tests (hypothesis): the JVM Column normalizers must
agree with their Python twins on arbitrary inputs, UUID5 minting must
match the stdlib, and the two-phase counter must match the global
window — beyond the hand-picked fixtures."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# keep examples bounded: every example runs a (warm) Spark job
_SETTINGS = dict(
    max_examples=12, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# printable-ish text plus the whitespace family (incl. Unicode spaces
# and NEL, which exercised the (?U) regex fix) — excludes non-BMP
# surrogates that Arrow round-trips poorly
_TEXT = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=32, max_codepoint=0x2FF),
        st.sampled_from(list(" \t\n\r\x0b\x0c   ")),
    ),
    max_size=40,
)


@given(st.lists(st.one_of(st.none(), _TEXT), min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_normalizers_match_python_twins(spark, xs):
    from pyspark.sql import functions as F

    from rdf_generator_spark import normalize as N

    df = spark.createDataFrame(list(enumerate(xs)), "i int, x string")
    got = {
        r["i"]: (r["t"], r["m"])
        for r in df.select(
            "i",
            N.norm_taxon_label(F.col("x")).alias("t"),
            N.norm_term_label(F.col("x")).alias("m"),
        ).collect()
    }
    for i, x in enumerate(xs):
        assert got[i][0] == N.py_norm_taxon_label(x), (i, repr(x))
        assert got[i][1] == N.py_norm_term_label(x), (i, repr(x))


# ASCII-only domain: Char_IDs are 'C<digits>' by the data model; for
# non-ASCII Unicode numerals the reference's isdigit()/int() fallback is
# itself inconsistent (documented deviation in parse_char_num_col)
_CHARID_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=20
)


@given(st.lists(st.one_of(st.none(), _CHARID_TEXT,
                          st.from_regex(r"[Cc]?[0-9]{1,6}", fullmatch=True)),
                min_size=1, max_size=20))
@settings(**_SETTINGS)
def test_char_num_matches_python_twin(spark, xs):
    from pyspark.sql import functions as F

    from rdf_generator_spark import normalize as N

    df = spark.createDataFrame(list(enumerate(xs)), "i int, x string")
    got = {r["i"]: r["n"] for r in df.select(
        "i", N.parse_char_num_col(F.col("x")).alias("n")).collect()}
    for i, x in enumerate(xs):
        want = N.py_parse_char_num(x if x is not None else "")
        # Column path treats out-of-int-range digit strings as overflow
        # (try_cast null -> default), matching the guarded py twin
        assert got[i] == want, (i, repr(x), got[i], want)


@given(st.lists(_TEXT, min_size=1, max_size=15))
@settings(**_SETTINGS)
def test_uuid5_matches_stdlib(spark, seeds):
    import uuid as _uuid

    from pyspark.sql import functions as F

    from rdf_generator_spark.ids import _UUID_NAMESPACE, uuid5_col

    df = spark.createDataFrame(list(enumerate(seeds)), "i int, s string")
    got = {r["i"]: r["u"] for r in
           df.select("i", uuid5_col(F.col("s")).alias("u")).collect()}
    for i, s in enumerate(seeds):
        assert got[i] == str(_uuid.uuid5(_UUID_NAMESPACE, s)), repr(s)


@given(
    st.lists(
        st.tuples(st.sampled_from(["d1", "d2"]), st.integers(0, 30),
                  st.integers(0, 5)),
        min_size=1, max_size=60,
    ),
    st.integers(1, 7),
)
@settings(**_SETTINGS)
def test_seq_number_property(spark, rows, width):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from rdf_generator_spark.operators.windows import seq_number

    data = [(d, a, b, i) for i, (d, a, b) in enumerate(rows)]
    df = spark.createDataFrame(data, "doc string, a int, b int, uid int")
    want = {
        (r["doc"], r["uid"]): r["rn"]
        for r in df.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("a", "b", "uid")
            ),
        ).collect()
    }
    got = {
        (r["doc"], r["uid"]): r["rn"]
        for r in seq_number(
            df, ["doc"], ["a", "b", "uid"], F.floor(F.col("a") / width)
        ).collect()
    }
    assert got == want


def test_nexus_roundtrip_property():
    """Pure-Python NEXUS parser: random grids render -> parse -> same
    cells, including quoted taxa, interleaved blocks and polymorphic
    tokens."""
    import random

    from rdf_generator_spark.sources.parsers import _parse_nexus_matrix

    rnd = random.Random(42)
    for _ in range(25):
        ntax = rnd.randint(1, 6)
        nchar = rnd.randint(1, 8)
        taxa = [f"Taxon_{i} sp" if rnd.random() < 0.5 else f"T{i}"
                for i in range(ntax)]
        grid = [
            [rnd.choice(["0", "1", "2", "-", "?", "(01)", "{12}"])
             for _ in range(nchar)]
            for _ in range(ntax)
        ]
        interleave = rnd.random() < 0.5
        lines = ["#NEXUS", "BEGIN DATA;", "MATRIX"]
        if interleave and nchar > 1:
            half = nchar // 2
            for t, row in zip(taxa, grid):
                lines.append(f"  '{t}'  {''.join(row[:half])}")
            for t, row in zip(taxa, grid):
                lines.append(f"  '{t}'  {''.join(row[half:])}")
        else:
            for t, row in zip(taxa, grid):
                lines.append(f"  '{t}'  {''.join(row)}")
        lines += [";", "END;"]
        cells = _parse_nexus_matrix("\n".join(lines))
        want = [
            (ti, t, ci, grid[ti][ci])
            for ti, t in enumerate(taxa)
            for ci in range(nchar)
        ]
        assert cells == want, (taxa, grid, interleave)


# ------------------------------------------------------------- codecs
# Pure-numpy media codecs (textops/codecs.py): encode -> decode must be
# the identity for every shape the encoders accept, not just the
# hand-picked fixtures in test_textops.py. No Spark involved, so these
# run with full hypothesis budgets. The interesting edges: BMP row
# stride padding when width*3 is not a multiple of 4, odd Y4M
# dimensions (chroma plane arithmetic uses floor division), and WAV
# channel counts that don't divide the sample count evenly.


@given(
    st.integers(min_value=1, max_value=23),  # height
    st.integers(min_value=1, max_value=23),  # width — hits all 4 strides
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_bmp_ppm_roundtrip_any_shape(h, w, seed):
    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    img = np.random.RandomState(seed % 2**31).randint(
        0, 256, (h, w, 3), dtype=np.uint8
    )
    assert (C.decode_bmp(C.encode_bmp(img)) == img).all()
    assert (C.decode_ppm(C.encode_ppm(img)) == img).all()
    assert (C.decode_pgm(C.encode_pgm(img[:, :, 0])) == img[:, :, :1]).all()


@given(
    st.integers(min_value=1, max_value=500),  # sample count
    st.integers(min_value=1, max_value=4),    # channels
    st.sampled_from([8000, 16000, 44100]),
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_wav_pcm16_roundtrip_any_shape(n, ch, rate, seed):
    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    s = np.random.RandomState(seed % 2**31).randint(
        -32768, 32768, (n, ch)
    ).astype(np.int16)
    dec, got_rate = C.decode_wav_pcm(C.encode_wav_pcm(s, rate))
    assert got_rate == rate and dec.shape == (n, ch)
    assert np.allclose(dec, s / 32768.0, atol=1e-6)


def test_wav_pcm8_decode_branch():
    """The encoder always writes 16-bit, so the 8-bit decode branch
    needs a hand-assembled fixture: unsigned 8-bit PCM maps 128 -> 0.0,
    0 -> -1.0, 255 -> +127/128."""
    import struct

    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    data = bytes([0, 128, 255, 64])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    raw = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body
    dec, rate = C.decode_wav_pcm(raw)
    assert rate == 8000 and dec.shape == (4, 1)
    assert np.allclose(
        dec[:, 0], [(b - 128) / 128.0 for b in (0, 128, 255, 64)]
    )


@given(
    st.integers(min_value=1, max_value=4),   # frames
    st.integers(min_value=1, max_value=17),  # height (odd exercises h//2)
    st.integers(min_value=1, max_value=17),  # width
    st.integers(min_value=0, max_value=2**31),
)
@settings(max_examples=40, deadline=None)
def test_y4m_roundtrip_any_shape(n, h, w, seed):
    import numpy as np

    from rdf_generator_spark.textops import codecs as C

    luma = np.random.RandomState(seed % 2**31).randint(
        0, 256, (n, h, w), dtype=np.uint8
    )
    fr, fps = C.decode_y4m(C.encode_y4m(luma, (24, 1)))
    assert fps == (24, 1) and (fr == luma).all()
