"""End-to-end KG construction: corpus table -> canonical triples.

Dataflow (SURVEY.md §3 "Spark lifecycle"):

    corpus(repo,path,commit,lang,content)
      ├─ parse (Arrow mapInPandas)  -> chars / cells / species / meta
      ├─ vocab broadcast join (J1)  -> URI-filled chars
      ├─ per-state derivation (J2, K1) -> states_x   [long table]
      ├─ cells ⋈ chars (J4/J5) × sex variants (F2)   -> visits
      │    locator-chain UUID5 fold (F4) in a built-in `aggregate`
      ├─ per-document windows (A1/A2) -> sequential :id-N labels
      ├─ select/explode triple structs (F1..F12) per part
      └─ union -> dedup (A3) -> prune (A5) -> label priority (J6) -> final

Everything between parse and the final union is built-in Column algebra
(uuid5 == sha1, see ids.py) — no Python in the fan-out path. All windows
are partitioned by document, so corpora parallelize across documents and
no operator needs a global shuffle. The cells⋈chars join broadcasts the
character side (dimension-sized per corpus design).

Scoping note (SURVEY.md §7): the reference's global sequential counters
are scoped per document here — the one semantic the single-process
reference cannot keep at corpus scale.

Input contract: one character-JSON and one NEXUS document per
`(repo, commit)` group (the reference's config points at exactly one of
each). Multiple JSON files in one group would make character order —
and thus the matrix column mapping — ambiguous. `build_graph` fails
loudly on offending groups (check_input_contract=True, default; the
check rides the materialized characters table, so it is skipped in
materialize=False diagnostic mode); `sources.corpus.
shard_multi_matrix_groups` rewrites such corpora into one group per
matrix automatically (json/nexus paired by path stem).
"""

from __future__ import annotations

from typing import Dict, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rdf_generator_spark import terms as T
from rdf_generator_spark.ids import kb_iri
from rdf_generator_spark.normalize import (
    norm_seed_component,
    norm_taxon_label,
    parse_char_num_col,
    strip_col,
)
from rdf_generator_spark.operators import linking
from rdf_generator_spark.operators.graph_ops import (
    apply_label_priority,
    dedup_triples,
    prune_unreferenced,  # noqa: F401 — re-exported for external callers
    prune_unreferenced_scoped,
)
from rdf_generator_spark.operators.windows import seq_number
from rdf_generator_spark.plans.base_scaffold import base_triples
from rdf_generator_spark.plans.emit import emit, t, tl, union_emissions, when_t
from rdf_generator_spark.sources import parsers
from rdf_generator_spark.sources.corpus import vocab_df_from_corpus

DOC = ["repo", "commit"]

_LOC_CHAIN_TYPE = (
    "array<struct<iri:string,label:string,uri:string,prev:string>>"
)

# Above this many corpus FILES the dimension-side broadcast hints are
# dropped and the joins fall back to AQE's runtime choice: the per-
# document dimension tables (characters, states, species keys, J2 index)
# are tiny per document, but the broadcast is of their union across ALL
# documents, which grows linearly with the corpus and would exceed the
# 8 GB broadcast ceiling long before 100 TB. All of these joins carry
# (repo, commit) in the key, so the shuffle fallback co-locates by
# document and stays skew-free.
_DIM_BROADCAST_FILE_LIMIT = 2000

# Giant-document auto-gate (VERDICT r3 item 1): the sequential :id-N
# counters default to one window per document — correct everywhere, but
# a single million-cell matrix then sorts in ONE task. When the probe
# below sees a document at least this large, build_graph switches to
# the two-phase bucketed numbering (operators/windows.py::seq_number,
# golden-equal) with this bucket width (characters per bucket). Two
# thresholds, matched to the two signals the probe can produce:
#
# - _GIANT_DOC_CONTENT_BYTES gates the PER-ROW-GROUP MEAN (the footer
#   statistic available without touching data pages): measured means
#   are ~16 KB for the bench-shaped corpus vs ~198-479 KB for the
#   straggler corpus (one 500x2000 NEXUS, 1.6 MB content). A mean this
#   high means large docs dominate the group — gate on, zero jobs.
# - _GIANT_DOC_EXACT_BYTES gates the EXACT max(octet_length(content))
#   when the footer signal is ambiguous (VERDICT r4 item 2: a writer
#   that packs one giant among thousands of small rows keeps the mean
#   tiny, but the group's TOTAL content bytes >= the giant's size, so
#   ambiguity is detectable from the footer alone). Calibration: the
#   largest normal bench doc is 98.8 KB (a 120x120 matrix, ~0.7 M
#   triples — one window task handles it; bucketing costs ~15% at that
#   mix), the straggler is 1.6 MB (~50 M triples in one task, 2.7-7x
#   slower without bucketing); 192 KiB sits 2x above the former and
#   8x below the latter.
_GIANT_DOC_CONTENT_BYTES = 96 * 1024
_GIANT_DOC_EXACT_BYTES = 192 * 1024
_AUTO_COUNTER_BUCKET_WIDTH = 64
_PROBE_FILE_CAP = 4096
# exact-probe memo: file lists are immutable identities for parquet /
# Iceberg data (part filenames are unique per write), so the one
# fallback job per corpus is paid once per file set, not per build.
# Keyed by the sorted file tuple itself (ADVICE r5: a 64-bit hash()
# collision between two different file lists would silently alias).
_PROBE_EXACT_CACHE: Dict[tuple, int] = {}
_PROBE_EXACT_CACHE_MAX = 64


def probe_max_doc_bytes(corpus: DataFrame, allow_job: bool = True):
    """Estimate (or exactly measure) the largest document's content size.

    Returns ``(bytes, exact)`` or ``None``. File-backed corpora
    (parquet/Iceberg — every real deployment) expose their file list
    from the already-built file index (``inputFiles()``, no job);
    parquet footers then give per-row-group uncompressed byte totals
    for the ``content`` column, read driver-side with pyarrow
    (metadata-only — no data pages touched, no Spark job, no re-ship of
    an in-memory relation through Python workers). Three footer-only
    outcomes:

    - max per-row-group MEAN >= ``_GIANT_DOC_CONTENT_BYTES``: large
      docs dominate some group — return ``(mean, exact=False)``,
      zero jobs (the gate turns on upstream).
    - every row group's TOTAL content bytes <
      ``_GIANT_DOC_EXACT_BYTES``: no single document can reach the
      exact threshold (a parquet row never spans row groups), so the
      footer alone PROVES the gate can stay off — zero jobs.
    - otherwise the footer is ambiguous (a packed row group could hide
      a giant behind a small mean — VERDICT r4 item 2); run ONE
      column-pruned ``max(octet_length(content))`` job (memoized per
      file list) and return ``(exact_max, exact=True)``. At any scale
      this is one scan of the one column the pipeline reads anyway.

    Returns ``None`` for in-memory corpora (createDataFrame —
    tests/golden scale, small by construction; a probe job there would
    re-ship the whole pickled relation) and on any probe failure;
    callers treat ``None`` as "keep the default plan". File count is
    capped (footer reads are cheap but not free); an explicit
    ``counter_buckets=`` always overrides.
    """
    try:
        files = corpus.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    try:
        import pyarrow.parquet as pq
        from urllib.parse import unquote, urlparse
    except Exception:
        return None
    best_mean = 0
    best_total = 0
    # deterministic capped scan: inputFiles() order is arbitrary, so an
    # over-cap corpus would otherwise probe a different file subset per
    # run; sorting pins which footers are read
    for f in sorted(files)[:_PROBE_FILE_CAP]:
        try:
            p = f
            if f.startswith("file:"):
                p = unquote(urlparse(f).path)
            md = pq.ParquetFile(p).metadata
        except Exception:
            # non-parquet source or a filesystem pyarrow can't reach
            # driver-side (e.g. an hdfs:// URI without a configured
            # pyarrow fs) — stay conservative
            return None
        for rg in range(md.num_row_groups):
            g = md.row_group(rg)
            if not g.num_rows:
                continue
            for ci in range(g.num_columns):
                col = g.column(ci)
                if col.path_in_schema == "content":
                    best_mean = max(
                        best_mean, col.total_uncompressed_size // g.num_rows
                    )
                    best_total = max(best_total, col.total_uncompressed_size)
    if not best_total:
        # no `content` chunk in any footer — not a corpus-shaped table
        return None
    if best_mean >= _GIANT_DOC_CONTENT_BYTES:
        return (best_mean, False)
    if best_total < _GIANT_DOC_EXACT_BYTES and len(files) <= _PROBE_FILE_CAP:
        # no row group could hold a gate-worthy document (a parquet row
        # never spans row groups) — proven off, zero jobs. The proof
        # only holds when EVERY file's footer was read: past the file
        # cap a tail giant would be invisible (VERDICT r5 item 1), so
        # an over-cap corpus falls through to the exact job instead of
        # claiming proof it doesn't have.
        return (max(best_mean, 1), False)
    if not allow_job:
        return (max(best_mean, 1), False)
    key = tuple(sorted(files))
    exact = _PROBE_EXACT_CACHE.get(key)
    if exact is None:
        try:
            exact = corpus.select(
                F.max(F.octet_length(F.col("content"))).alias("m")
            ).first()[0]
        except Exception:
            # fallback job failed (column renamed, source gone) — the
            # footer mean is still a usable conservative estimate
            return (max(best_mean, 1), False)
        if exact is None:
            return None
        if len(_PROBE_EXACT_CACHE) >= _PROBE_EXACT_CACHE_MAX:
            _PROBE_EXACT_CACHE.clear()
        _PROBE_EXACT_CACHE[key] = int(exact)
    return (int(exact), True)


def _nonempty(c) -> F.Column:
    return F.coalesce(strip_col(c), F.lit("")) != ""


def _truthy_uri(c) -> F.Column:
    """Python truthiness for URI slots: None/'' falsy, whitespace truthy."""
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("string")).otherwise(c)


_CONFIG_SCAN_LIMIT = 64


def dataset_id_from_config(corpus: DataFrame) -> Optional[str]:
    """SRC1: a lang='yaml' config row may carry `dataset_id` — the
    highest-priority salt source (main.py:31-36, 232-235). Config rows
    are tiny dimension docs, collected driver-side.

    The collect is bounded (`limit(64)`) so the tiny-by-contract
    assumption is structural rather than hoped-for, and ordered by
    (repo, path, commit) so that when a corpus carries several yaml
    docs the winning `dataset_id` is deterministic (the reference
    reads exactly one config file; lexicographically-first is the
    documented precedence here), not partition-order-dependent."""
    rows = (
        corpus.filter(F.col("lang") == "yaml")
        .select("repo", "path", "commit", "content")
        .orderBy("repo", "path", "commit")
        .limit(_CONFIG_SCAN_LIMIT)
        .collect()
    )
    return _dataset_id_from_yaml_rows(rows)


def _dataset_id_from_yaml_rows(rows) -> Optional[str]:
    """Driver-side tail of SRC1: pick `dataset_id` from already-collected
    yaml rows (sorted by repo/path/commit, bounded by the scan limit)."""
    try:
        import yaml
    except ImportError:
        return None
    if len(rows) >= _CONFIG_SCAN_LIMIT:
        # ADVICE r5: the limit plausibly truncated the scan — a
        # dataset_id-bearing config sorting after the window would be
        # missed silently, changing the salt with no signal
        import warnings

        warnings.warn(
            f"dataset_id config scan hit its {_CONFIG_SCAN_LIMIT}-row "
            "bound; a dataset_id in a yaml doc sorting past the bound "
            "would be ignored (pass dataset_id= explicitly to override)",
            stacklevel=2,
        )
    for r in rows:
        try:
            cfg = yaml.safe_load(r["content"]) or {}
        except yaml.YAMLError:
            continue
        if isinstance(cfg, dict) and cfg.get("dataset_id"):
            return str(cfg["dataset_id"])
    return None


def build_salts(
    meta: DataFrame,
    dataset_id: Optional[str],
    json_names: Optional[DataFrame] = None,
) -> DataFrame:
    """build_dataset_seed_salt (main.py:227-249), per document.

    Tier 2: sha256 fingerprint of the sorted non-empty normalized
    metadata values; skipped entirely when every value normalizes to ''
    (matching the reference's `if provenance_values:` guard). Tier 3
    (main.py:245-247): `input::<normalized json basename>` from
    `json_names(repo, commit, json_base)`. Tier 1 (dataset_id) and tier
    4 ('dataset::default') are handled by the caller's coalesce."""
    norm = norm_seed_component(F.col("source_text"))
    vals = F.array_sort(F.collect_list(F.when(norm != "", norm)))
    fp = F.sha2(F.array_join(vals, "||"), 256).substr(1, 16)
    m = meta.groupBy(*DOC).agg(
        F.when(F.size(vals) > 0,
               F.concat(F.lit("metadata::"), fp)).alias("salt")
    )
    if json_names is None:
        return m
    jb = json_names.groupBy(*DOC).agg(F.min("json_base").alias("__jb"))
    jbn = norm_seed_component(F.col("__jb"))
    return (
        jb.join(m, DOC, "full")
        .select(
            *DOC,
            F.coalesce(
                F.col("salt"),
                F.when(jbn != "", F.concat(F.lit("input::"), jbn)),
            ).alias("salt"),
        )
    )


def resolve_counter_buckets(corpus: DataFrame, counter_buckets):
    """Resolve build_graph's counter strategy: "auto" gates the
    two-phase bucketed numbering on the giant-document probe (footer
    statistics when they decide, one memoized column-pruned job when
    they are ambiguous — see probe_max_doc_bytes); int forces a bucket
    width; None forces the per-document window."""
    if counter_buckets != "auto":
        return counter_buckets
    probed = probe_max_doc_bytes(corpus)
    if probed is None:
        return None
    mx, exact = probed
    threshold = _GIANT_DOC_EXACT_BYTES if exact else _GIANT_DOC_CONTENT_BYTES
    if mx >= threshold:
        return _AUTO_COUNTER_BUCKET_WIDTH
    return None


def build_graph(
    spark: SparkSession,
    corpus: DataFrame,
    dataset_id: Optional[str] = None,
    vocab: Optional[DataFrame] = None,
    materialize: bool = True,
    assemble: bool = True,
    dim_broadcast: Optional[bool] = None,
    staging_dir: Optional[str] = None,
    fuzzy_link_threshold: Optional[float] = None,
    check_input_contract: bool = True,
    counter_buckets="auto",
) -> Dict[str, DataFrame]:
    """Run the full pipeline; returns named DataFrames.

    With ``materialize`` (default) the hub tables (chars/states/visits and
    the emitted triple union) are materialized: every downstream branch
    (per-part outputs, prune, label priority, validation) reuses one
    materialized dataset instead of replaying the parse+join lineage.

    Materialization mechanism: ``localCheckpoint`` by default (fastest on
    a single box, but the blocks live on executors — a lost executor
    kills the job instead of recomputing). Pass ``staging_dir`` to stage
    the hub tables to parquet there instead: cluster-durable, survives
    executor loss, and the natural mount point for an Iceberg staging
    table (swap the write/read pair for a table identifier — a config
    change, not a code change). `run_resumable` stages under its output
    directory automatically.

    ``counter_buckets``: sequential :id-N counter execution strategy.
    ``"auto"`` (default) gates on the zero-job `probe_max_doc_bytes`
    probe: when the largest document's content reaches
    ``_GIANT_DOC_CONTENT_BYTES`` the counters switch to the two-phase
    bucketed numbering in operators/windows.py (identical output —
    golden-tested — but a giant matrix numbers across
    nchar/``_AUTO_COUNTER_BUCKET_WIDTH`` tasks instead of sorting in
    one); otherwise the plain per-document window runs (cheapest at
    normal document sizes — the two-phase variant's extra
    aggregation+join rounds cost ~15% at bench scale). Pass an int
    bucket width to force two-phase, or ``None`` to force the single
    window.
    """
    counter_buckets = resolve_counter_buckets(corpus, counter_buckets)
    if dim_broadcast is None:
        # Zero-job probe: file-backed corpora (parquet/Iceberg — every
        # real deployment) expose their file list from the already-built
        # file index, and file count bounds document count. An in-memory
        # corpus (tests/bench createDataFrame) is by construction small
        # enough to broadcast — and scanning it would re-ship the whole
        # pickled relation through Python workers, which measurably
        # dominates the bench (extra ~25 s/job at 24 giant datasets).
        try:
            files = corpus.inputFiles()
        except Exception:
            files = []
        dim_broadcast = (
            len(files) <= _DIM_BROADCAST_FILE_LIMIT if files else True
        )
    bhint = F.broadcast if dim_broadcast else (lambda d: d)

    def _seq(df, order_cols, out):
        """Per-document sequential numbering; two-phase when
        counter_buckets is set (giant-document parallelism)."""
        if counter_buckets:
            return seq_number(
                df, DOC, order_cols,
                F.floor(F.col(order_cols[0]) / counter_buckets), out=out,
            )
        w = Window.partitionBy(*DOC).orderBy(*order_cols)
        return df.withColumn(out, F.row_number().over(w))

    # Hub-table materialization happens TOP-DOWN: each hub is
    # checkpointed as soon as its plan is complete, and every downstream
    # plan is then built FROM the checkpointed DataFrame. (Round-6 fix:
    # the mats used to happen at the end, after all downstream plans had
    # captured the un-truncated lineage — so the states_x job re-ran the
    # whole charsx parse+fill chain and the visits job re-ran both; the
    # visits physical plan carried 24 MapInPandas subtrees and 86
    # exchanges. Checkpoint-then-build collapses each hub job to its own
    # stage chain — guide §2.4: remove repeated subtree shuffles.)
    mat = _materializer(spark, staging_dir)
    do_mat = materialize and assemble

    def hub(df, name):
        return mat(df, name) if do_mat else df

    chars_raw = parsers.parse_char_docs(corpus)
    cells = parsers.parse_nexus_docs(corpus)
    species = parsers.parse_species_docs(corpus)
    # Last-row-wins per Char_ID, replaying the reference's dict overwrite
    # (main.py:214-221): a repeated Char_ID must update, not fan out the
    # char join below (which would duplicate every downstream visit row
    # and shift the sequential :id-N counters). Keys are per-document so
    # the aggregation shuffles on (repo, commit, char_id) — no skew risk.
    meta = (
        parsers.parse_metadata_docs(corpus)
        .groupBy(*DOC, "char_id")
        .agg(
            F.max_by(
                "source_text", F.struct(F.col("path"), F.col("meta_pos"))
            ).alias("source_text")
        )
    )
    if vocab is None and dataset_id is None:
        # one combined dimension collect (round 6): the OWL vocabulary
        # rows and the (bounded, ordered — see dataset_id_from_config)
        # yaml config window used to be two separate driver jobs per
        # build; one filtered scan fetches both. Bounds are preserved:
        # yaml rows ride a per-lang rank capped at the config-scan
        # limit, owl rows are dimension docs by contract.
        w_yaml = Window.partitionBy("lang").orderBy("repo", "path", "commit")
        dim_rows = (
            corpus.filter(F.col("lang").isin("owl", "yaml"))
            .select("repo", "path", "commit", "lang", "content")
            .withColumn("__rn", F.row_number().over(w_yaml))
            .filter((F.col("lang") == "owl")
                    | (F.col("__rn") <= _CONFIG_SCAN_LIMIT))
            .collect()
        )
        from rdf_generator_spark.sources.corpus import (
            VOCAB_SCHEMA,
            build_label_index,
        )

        index: Dict[str, str] = {}
        owl_rows = sorted(
            (r for r in dim_rows if r["lang"] == "owl"),
            key=lambda r: (r["repo"], r["path"], r["commit"]),
        )
        for r in owl_rows:
            for k, v in build_label_index(r["content"]).items():
                index.setdefault(k, v)
        vocab = spark.createDataFrame(sorted(index.items()), VOCAB_SCHEMA)
        dataset_id = _dataset_id_from_yaml_rows(
            sorted(
                (r for r in dim_rows if r["lang"] == "yaml"),
                key=lambda r: (r["repo"], r["path"], r["commit"]),
            )
        )
    else:
        if vocab is None:
            vocab = vocab_df_from_corpus(spark, corpus)
        if dataset_id is None:
            dataset_id = dataset_id_from_config(corpus)

    # --- J1 vocab fill + per-char derived columns ------------------------
    # fuzzy_link_threshold routes exact-tier misses through the
    # similarity tier (opt-in; default preserves reference parity)
    chars_f = linking.fill_character_uris(
        chars_raw, vocab, fuzzy_threshold=fuzzy_link_threshold
    )

    if dataset_id is not None:
        did = norm_seed_component(F.lit(dataset_id))
        salts = chars_f.select(*DOC).distinct().withColumn(
            "salt", F.concat(F.lit("dataset::"), did)
        )
    else:
        json_names = corpus.filter(F.col("lang") == "json").select(
            *DOC, F.element_at(F.split(F.col("path"), "/"), -1).alias("json_base")
        )
        salts = build_salts(meta, dataset_id, json_names)

    charsx = (
        chars_f.join(salts, DOC, "left")
        .withColumn("salt", F.coalesce(F.col("salt"), F.lit("dataset::default")))
        .join(
            meta.select(*DOC, "char_id", "source_text"),
            DOC + ["char_id"],
            "left",
        )
        .withColumn("char_iri", kb_iri("char", F.concat(F.lit("char_"), F.col("char_id"))))
        .withColumn(
            "char_label_eff",
            F.coalesce(F.col("char_label"), F.concat(F.lit("Character "), F.col("char_id"))),
        )
        .withColumn(
            "src_iri",
            F.when(
                F.col("source_text").isNotNull(),
                kb_iri(
                    "src",
                    F.concat(
                        F.lit("revision-source::"),
                        F.col("char_id"),
                        F.lit("::"),
                        F.lower(F.col("source_text")),
                    ),
                ),
            ),
        )
        .withColumn(
            "stmt_type",
            F.when(~F.col("has_variable"), F.lit(T.PHB_NEOMORPHIC))
            .when(_nonempty(F.col("var_comment")), F.lit(T.PHB_TRANSF_COMPLEX))
            .otherwise(F.lit(T.PHB_TRANSF_SIMPLE)),
        )
        .withColumn(
            "dup_for_sex",
            F.col("org_label").isNotNull()
            & (F.lower(strip_col(F.col("org_label"))) == "adult organism"),
        )
        .withColumn("char_sort_num", parse_char_num_col(F.col("char_id")))
        .withColumn(
            "org_uri_eff",
            F.coalesce(
                _truthy_uri(F.col("org_uri")),
                F.concat(F.lit(T.KB), F.replace(F.col("org_label"), F.lit(" "), F.lit("_"))),
            ),
        )
        .withColumn("var_label_eff", F.coalesce(F.col("var_label"), F.lit("Unnamed Variable")))
        .withColumn(
            "mx_iri",
            kb_iri("mx", F.coalesce(F.col("doc_matrix_label"), F.lit("default_matrix"))),
        )
    )

    # Variable locator-chain seed (main.py:929-953; 'None' stringification
    # quirk replicated).
    uri_comps = F.transform(
        F.col("locators"),
        lambda l: F.when(l["uri"].isNull(), F.lit("None")).otherwise(strip_col(l["uri"])),
    )
    label_comps = F.transform(
        F.col("locators"),
        lambda l: F.when(l["label"].isNull(), F.lit("None")).otherwise(strip_col(l["label"])),
    )
    has_locs = F.size(F.col("locators")) > 0
    all_of = lambda comps: F.forall(comps, lambda c: c != "")  # noqa: E731
    charsx = charsx.withColumn(
        "chain_seed",
        F.when(has_locs & all_of(uri_comps), F.array_join(uri_comps, "::"))
        .when(has_locs & all_of(label_comps), F.array_join(label_comps, "::"))
        .when(has_locs, F.concat(F.lit("__malformed__::"), F.col("char_id"))),
    )
    charsx = hub(charsx, "charsx")
    if do_mat and check_input_contract:
        # Contract check rides the (cheap, already-materialized) parsed
        # characters table instead of re-scanning the raw corpus: a
        # second char-JSON in a group shows up as a second distinct
        # `path` here. Raises before any result is returned.
        bad = (
            charsx.select(*DOC, "path").distinct()
            .groupBy(*DOC).count().filter(F.col("count") > 1)
            .limit(10).collect()
        )
        if bad:
            groups = ", ".join(
                f"{r['repo']}@{r['commit'][:8]} ({r['count']} JSONs)"
                for r in bad
            )
            raise ValueError(
                "input contract violated — multiple character-JSON "
                f"files in one (repo, commit) group: {groups}. "
                "Pre-process the corpus with "
                "sources.corpus.shard_multi_matrix_groups (pairs "
                "json/nexus by path stem, one group per matrix) or "
                "split the groups yourself."
            )

    # --- states_x: long per-state table with J2 + counters (K1/A2) -------
    st = charsx.select(
        *DOC,
        "char_pos",
        "char_id",
        "char_iri",
        _truthy_uri(F.col("var_uri")).alias("char_var_uri"),
        F.posexplode_outer("states").alias("state_idx", "st"),
    ).filter(F.col("state_idx").isNotNull())
    label0 = F.when(F.col("st.label").isNull(), F.lit("unknown")).otherwise(
        strip_col(F.col("st.label"))
    )
    st = (
        st.withColumn("label0", label0)
        .withColumn("is_neg", F.lower(F.col("label0")).startswith("not "))
        .withColumn(
            "base_label", strip_col(F.substring(F.col("label0"), 5, 2 ** 30))
        )
        .withColumn(
            "labelN",
            F.when(F.col("is_neg"), F.concat(F.lit("not "), F.col("base_label"))).otherwise(
                F.col("label0")
            ),
        )
        .withColumn("uri_t", _truthy_uri(F.col("st.uri")))
        .withColumn(
            "seed",
            F.concat(
                F.col("char_id"),
                F.lit("_"),
                F.coalesce(F.col("uri_t"), F.lower(F.col("labelN"))),
            ),
        )
        .withColumn("sta_iri", kb_iri("sta", F.col("seed")))
        .withColumn("qua_iri", kb_iri("qua", F.col("seed")))
    )
    j2 = linking.state_label_index(
        st.select(*DOC, "char_pos", "state_idx", F.col("st.label").alias("label"),
                  F.col("uri_t").alias("uri"))
    )
    j2r = j2.select(
        F.col("repo").alias("__j2_repo"),
        F.col("commit").alias("__j2_commit"),
        F.col("base_key").alias("__j2_key"),
        F.col("pos_uri").alias("__j2uri"),
    )
    st = st.join(
        bhint(j2r),
        (F.col("repo") == F.col("__j2_repo"))
        & (F.col("commit") == F.col("__j2_commit"))
        & (F.lower(F.col("base_label")) == F.col("__j2_key"))
        & F.col("is_neg")
        & F.col("uri_t").isNull(),
        "left",
    ).drop("__j2_repo", "__j2_commit", "__j2_key")
    st = st.withColumn("resolved_uri", F.coalesce(F.col("uri_t"), F.col("__j2uri"))).drop(
        "__j2uri"
    )
    st = (
        st.withColumn("neg_resolved", F.col("is_neg") & F.col("resolved_uri").isNotNull())
        .withColumn(
            "restr_iri",
            F.when(F.col("neg_resolved"), kb_iri("restr", F.col("resolved_uri"))),
        )
        .withColumn(
            "comp_iri",
            F.when(F.col("neg_resolved"), kb_iri("comp", F.col("resolved_uri"))),
        )
    )
    # A2 counters (single per-document window by default; two-phase via
    # counter_buckets — see build_graph docstring)
    st = _seq(st, ["char_pos", "state_idx"], "__rn")
    if counter_buckets:
        st = st.join(
            st.groupBy(*DOC).agg(F.count(F.lit(1)).alias("__n_states")), DOC
        )
    else:
        st = st.withColumn(
            "__n_states", F.count(F.lit(1)).over(Window.partitionBy(*DOC))
        )
    st = (
        st.withColumn(
            "sta_prefix",
            F.when(F.col("labelN") == "", F.lit("state")).otherwise(F.col("labelN")),
        )
        .withColumn(
            "qua_prefix",
            F.when(F.col("labelN") == "", F.lit("quality")).otherwise(F.col("labelN")),
        )
        .withColumn(
            "sta_label",
            F.concat(F.col("sta_prefix"), F.lit(":id-"),
                     F.col("__n_states") + F.col("__rn")),
        )
        .withColumn(
            # phase-b label (build_character_graphs round): visible only
            # in per-character graphs; label priority replaces it with
            # the matrix-round label in every written output
            "sta_label_phase_b",
            F.concat(F.col("sta_prefix"), F.lit(":id-"), F.col("__rn")),
        )
        .withColumn(
            "qua_label",
            F.concat(F.col("qua_prefix"), F.lit(":id-"), F.col("__rn")),
        )
    )
    if do_mat:
        # checkpoint only what downstream consumers read (RDD scans
        # cannot column-prune — see the visits projection note)
        st = st.select(
            *DOC, "char_pos", "state_idx", "char_id", "char_iri",
            "char_var_uri", "base_label", "labelN", "uri_t", "sta_iri",
            "qua_iri", "resolved_uri", "neg_resolved", "restr_iri",
            "comp_iri", "sta_label", "sta_label_phase_b", "qua_label",
        )
    states_x = hub(st, "states_x")

    # --- cells ⋈ chars (J4): broadcast the dimension-sized character
    # table keyed on the matrix column index (char_ids_in_order semantics,
    # main.py:1731-1733) --------------------------------------------------
    chars_b = charsx.drop("path").withColumn("char_index", F.col("char_pos"))
    cells_j = cells.select(
        *DOC, "taxon_pos", "taxon", "char_index", "symbol"
    ).join(bhint(chars_b), DOC + ["char_index"], "inner")

    cells_j = (
        cells_j.withColumn("cell_iri",
                           kb_iri("cell", F.concat(F.col("taxon"), F.lit("_"), F.col("char_index"))))
        .withColumn("norm_taxon", norm_taxon_label(F.col("taxon")))
        .withColumn("state_index", strip_col(F.col("symbol")).try_cast("int"))
    )
    cells_j = _seq(cells_j, ["char_pos", "taxon_pos"], "cell_n")

    variants = F.when(
        F.col("dup_for_sex"),
        F.array(
            F.struct(
                F.lit(0).alias("vord"),
                F.lit("female organism").alias("v_org_label"),
                F.lit(T.UBERON_FEMALE).alias("v_org_uri"),
                F.lit("::female").alias("suffix"),
            ),
            F.struct(
                F.lit(1).alias("vord"),
                F.lit("male organism").alias("v_org_label"),
                F.lit(T.UBERON_MALE).alias("v_org_uri"),
                F.lit("::male").alias("suffix"),
            ),
        ),
    ).otherwise(
        F.array(
            F.struct(
                F.lit(0).alias("vord"),
                F.col("org_label").alias("v_org_label"),
                F.col("org_uri_eff").alias("v_org_uri"),
                F.lit("").alias("suffix"),
            )
        )
    )

    visits = (
        cells_j.filter(F.col("state_index").isNotNull())
        .withColumn("__v", F.explode(variants))
        .select("*", "__v.vord", "__v.v_org_label", "__v.v_org_uri", "__v.suffix")
        .drop("__v")
    )

    # state/quality join (J5) — the broadcast join and the phe_n window
    # run FIRST, on the narrow pre-mint rows. Both are keyed by document,
    # so this whole sub-plan executes doc-partitioned (max parallelism =
    # document count, with giant documents hot — guide §2.5 skew).
    stj = states_x.select(
        F.col("repo").alias("__st_repo"),
        F.col("commit").alias("__st_commit"),
        F.col("char_pos").alias("st_char_pos"),
        F.col("state_idx").alias("st_idx"),
        F.col("sta_iri").alias("st_sta_iri"),
        F.col("qua_iri").alias("st_qua_iri"),
        F.col("qua_label").alias("st_qua_label"),
        F.col("uri_t").alias("st_uri"),
        F.col("neg_resolved").alias("st_neg_resolved"),
        F.col("comp_iri").alias("st_comp_iri"),
        F.col("char_var_uri").alias("st_var_uri"),
    )
    visits = visits.join(
        bhint(stj),
        (F.col("repo") == F.col("__st_repo"))
        & (F.col("commit") == F.col("__st_commit"))
        & (F.col("char_pos") == F.col("st_char_pos"))
        & (F.col("state_index") == F.col("st_idx")),
        "left",
    ).drop("__st_repo", "__st_commit")

    visits = _seq(visits, ["char_pos", "taxon_pos", "vord"], "phe_n")

    # The IRI mints below (5 sha1 forests per row + the locator-chain
    # fold) are the pipeline's heaviest per-row compute. Partitioning at
    # this point is by document (the window above), so one giant matrix
    # would mint in ONE task. Spread the rows over a high-cardinality
    # deterministic composite key first (guide §2.5: deterministic
    # synthetic partitioning — char_pos splits a giant document across
    # tasks); everything after this is per-row column algebra, and every
    # downstream consumer re-shuffles on its own keys anyway. Measured
    # at bench scale: the mint projection fell from ~4.5 s (13 skewed
    # post-AQE partitions) to <1 s.
    visits = visits.repartition("repo", "commit", "char_pos", "taxon_pos")

    # Mint/fold expressions are constant Column trees — built once per
    # JVM (_memo_cols) and applied in three chained projections that
    # respect their data dependencies (org_iri -> loc_chain/var;
    # loc_chain -> last_loc_iri).
    def _build_mint_exprs():
        org_seed = F.concat_ws(
            "::",
            F.col("salt"),
            F.coalesce(
                F.nullif(norm_seed_component(F.col("norm_taxon")), F.lit("")),
                F.lit("unknown-taxon"),
            ),
            F.coalesce(
                F.nullif(norm_seed_component(F.col("v_org_label")), F.lit("")),
                F.lit("organism"),
            ),
        )
        # Locator-chain fold (F4): sequential-in-array,
        # parallel-across-rows.
        loc_filtered = F.filter(
            F.col("locators"), lambda l: F.coalesce(l["label"], F.lit("")) != ""
        )
        seed_base = lambda l: F.coalesce(  # noqa: E731
            _truthy_uri(l["uri"]), F.lower(strip_col(l["label"]))
        )
        var_seed = F.when(
            F.col("chain_seed").isNotNull(),
            F.concat(
                F.col("org_iri"), F.lit("::"), F.col("chain_seed"), F.lit("::"),
                F.lower(strip_col(F.col("var_label_eff"))),
            ),
        ).otherwise(
            F.concat(
                F.lit("__noloc__::"), F.col("char_id"), F.lit("::"),
                F.lower(strip_col(F.col("var_label_eff"))),
            )
        )
        return {
            "org_iri": kb_iri("org", org_seed).alias("org_iri"),
            "phe_iri": kb_iri(
                "phe",
                F.concat(
                    F.lit("pheno-"),
                    F.col("char_id"),
                    F.lit("::"),
                    F.lower(strip_col(F.col("taxon"))),
                    F.col("suffix"),
                ),
            ).alias("phe_iri"),
            "tu_iri": kb_iri(
                "tu", F.lower(strip_col(F.col("norm_taxon")))
            ).alias("tu_iri"),
            "loc_chain": F.aggregate(
                loc_filtered,
                F.struct(
                    F.col("org_iri").alias("prev"),
                    F.array().cast(_LOC_CHAIN_TYPE).alias("acc"),
                ),
                lambda acc, l: F.struct(
                    kb_iri("loc", F.concat(acc["prev"], F.lit("::"), seed_base(l))).alias("prev"),
                    F.concat(
                        acc["acc"],
                        F.array(
                            F.struct(
                                kb_iri(
                                    "loc", F.concat(acc["prev"], F.lit("::"), seed_base(l))
                                ).alias("iri"),
                                l["label"].alias("label"),
                                _truthy_uri(l["uri"]).alias("uri"),
                                acc["prev"].alias("prev"),
                            )
                        ),
                    ).alias("acc"),
                ),
                lambda acc: acc["acc"],
            ).alias("loc_chain"),
            "last_loc_iri": F.when(
                F.size("loc_chain") > 0, F.element_at("loc_chain", -1)["iri"]
            ).alias("last_loc_iri"),
            "var_iri": F.when(
                F.col("has_variable"), kb_iri("var", var_seed)
            ).alias("var_iri"),
            "per_org_qua_iri": F.when(
                F.col("st_qua_iri").isNotNull(),
                kb_iri(
                    "qua",
                    F.concat(
                        F.col("org_iri"), F.lit("::"), F.col("char_id"), F.lit("::"),
                        F.col("st_qua_iri"),
                    ),
                ),
            ).alias("per_org_qua_iri"),
        }

    mints = _memo_cols("visit_mints", _build_mint_exprs)
    visits = visits.select(
        "*", mints["org_iri"], mints["phe_iri"], mints["tu_iri"]
    )
    visits = visits.select("*", mints["loc_chain"])
    visits = visits.select(
        "*", mints["last_loc_iri"], mints["var_iri"], mints["per_org_qua_iri"]
    )
    # Project the checkpoint down to the columns _assemble consumes
    # (guide §2.3 "project before the exchange"): a localCheckpoint scan
    # is an RDD scan with NO column pruning, and the emission + label-
    # order branches scan this table several times — carrying the raw
    # `locators`/`states` arrays and the pre-mint intermediates through
    # every one of those deserializing scans measurably dominated the
    # final job's CPU.
    if do_mat:
        visits = visits.select(
            *DOC, "char_pos", "taxon_pos", "vord", "phe_n",
            "char_sort_num", "norm_taxon", "char_label", "char_id",
            "phe_iri", "stmt_type", "v_org_uri", "v_org_label", "org_iri",
            "tu_iri", "cell_iri", "mx_iri", "var_iri", "var_uri",
            "var_label_eff", "var_comment", "per_org_qua_iri",
            "st_qua_label", "st_uri", "st_neg_resolved", "st_comp_iri",
            "st_var_uri", "last_loc_iri", "st_sta_iri", "loc_chain",
        )
    visits = hub(visits, "visits")
    # cells_j deliberately NOT checkpointed: its two consumers (visits
    # above, cell_triples in _assemble) each sit directly on the
    # materialized charsx hub + the narrow NEXUS parse, so Catalyst can
    # prune columns per consumer and pipeline the parse into them. An
    # interleaved A/B at bench scale (24 datasets, one JVM) measured
    # skipping this checkpoint at 40.4 s vs 73.4 s for the full-mat
    # ladder — the barrier + full-width recompute cost far more than the
    # duplicated parse. charsx/states_x/visits/parts stay materialized:
    # they bound Catalyst plan depth and keep the final-graph plan free
    # of Python stages (test_plans.py).

    if not assemble:
        # diagnostic mode: hub tables with full (un-truncated) lineage,
        # e.g. for .explain plan audits
        return {
            "chars": charsx, "states": states_x, "cells": cells_j,
            "visits": visits, "species": species,
        }

    return _assemble(
        spark, corpus, charsx, states_x, cells_j, visits, species, cells, meta,
        materialize, bhint, mat, _seq,
    )


import weakref

_COL_MEMO: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _memo_cols(key: str, builder):
    """Memoize CONSTANT (context-free) Column expression lists per py4j
    gateway (round 6, driver overhead): Column objects are immutable
    unresolved expression trees, so the same objects can seed emit() in
    every build on this JVM — only plan construction is memoized, every
    job still computes from its inputs. Rebuilding the two biggest
    emission lists cost ~10k py4j round trips (~1 s of driver time) per
    build. Keyed weakly by the gateway so a fresh JVM rebuilds."""
    from pyspark import SparkContext

    gw = SparkContext._gateway
    if gw is None:
        return builder()
    d = _COL_MEMO.get(gw)
    if d is None:
        d = {}
        _COL_MEMO[gw] = d
    if key not in d:
        d[key] = builder()
    return d[key]


def _materializer(spark, staging_dir: Optional[str]):
    """Hub-table materializer: parquet staging when `staging_dir` is
    set (cluster-durable), localCheckpoint otherwise (single-box).

    Eager localCheckpoint: the logical plan is truncated to an RDD scan
    (which is what keeps Catalyst's plan size bounded) and each hub
    materializes as its own job. A lazy variant (eager=False) folds the
    materialization into downstream jobs but measured no improvement on
    this box (fixed cost is Catalyst planning, not job count).
    """
    if staging_dir is None:
        return lambda df, name: df.localCheckpoint(eager=True)

    import os

    def stage(df, name):
        path = os.path.join(staging_dir, name)
        df.write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    return stage


def _assemble(spark, corpus, charsx, states_x, cells_j, visits, species, cells, meta,
              materialize=True, bhint=F.broadcast, mat=None, seq=None):
    """Emit all triple families, tag parts, and build the final graph."""
    if mat is None:
        mat = lambda df, name: df.localCheckpoint(eager=True)  # noqa: E731
    if seq is None:
        def seq(df, order_cols, out):
            w = Window.partitionBy(*DOC).orderBy(*order_cols)
            return df.withColumn(out, F.row_number().over(w))
    NI = T.OWL_NAMED_INDIVIDUAL

    # -- base part (constant scaffold per document) -----------------------
    docs = corpus.select(*DOC).distinct()
    base_df = spark.createDataFrame(
        base_triples(), "s string, p string, o string, lit boolean, dt string"
    )
    base_part = docs.join(F.broadcast(base_df))

    # -- char part: char node + provenance + state typing -----------------
    # (tagged with char_id so validation can rebuild per-character scopes)
    CDOC = ("repo", "commit", "char_id")
    char_nodes = emit(charsx, *_memo_cols("char_nodes", lambda: [
        t("char_iri", T.RDF_TYPE, T.CDAO_CHARACTER),
        tl("char_iri", T.RDFS_LABEL, F.col("char_label_eff")),
        t("char_iri", T.RDF_TYPE, NI),
        when_t(F.col("src_iri").isNotNull(), t("src_iri", T.RDF_TYPE, T.PROV_ENTITY)),
        when_t(F.col("src_iri").isNotNull(), tl("src_iri", T.RDFS_LABEL, F.col("source_text"))),
        when_t(F.col("src_iri").isNotNull(), t("char_iri", T.PROV_HAD_PRIMARY_SOURCE, F.col("src_iri"))),
    ]), doc_cols=CDOC)
    # F9 second sp- mint site (SpeciesLabel+SpeciesID rows)
    sp2 = charsx.filter(
        (norm_taxon_label(F.col("species_label")) != "") & F.col("species_id").isNotNull()
    ).withColumn("sp2_label", norm_taxon_label(F.col("species_label"))).withColumn(
        "sp2_iri", kb_iri("sp", F.col("sp2_label"))
    )
    sp2_triples = emit(
        sp2,
        t("sp2_iri", T.RDF_TYPE, T.TXR_SPECIES),
        tl("sp2_iri", T.RDFS_LABEL, F.col("sp2_label")),
        t("sp2_iri", T.DWC_PARENT_NAME_USAGE_ID,
          F.concat(F.lit("https://www.gbif.org/species/"), F.col("species_id"))),
        doc_cols=CDOC,
    )
    char_states = emit(
        states_x,
        t("sta_iri", T.RDF_TYPE, T.CDAO_STATE),
        t("sta_iri", T.RDF_TYPE, T.OWL_NAMED_INDIVIDUAL),
        tl("sta_iri", T.RDFS_LABEL, F.col("sta_label_phase_b")),
        t("char_iri", T.PHB_MAY_HAVE_STATE, "sta_iri"),
        doc_cols=CDOC,
    )
    char_part_tagged = union_emissions(char_nodes, sp2_triples, char_states)
    char_part = char_part_tagged.drop("char_id")

    # -- matrix part ------------------------------------------------------
    mx = charsx.select(*DOC, "mx_iri").distinct()
    mx_triples = emit(
        mx,
        t("mx_iri", T.RDF_TYPE, T.CDAO_MATRIX),
        tl("mx_iri", T.RDFS_LABEL, F.lit("matrix:id-1")),
        tl("mx_iri", T.DC_DESCRIPTION, F.lit("matrix description")),
        t("mx_iri", T.RDF_TYPE, NI),
    )
    mx_char_links = emit(charsx, t("mx_iri", T.CDAO_HAS_CHARACTER, "char_iri"))

    sta_qua_triples = emit(states_x, *_memo_cols("sta_qua", lambda: [
        # quality class typing (handle_quality, main.py:1026-1035)
        when_t(F.col("uri_t").isNotNull(), t("uri_t", T.RDF_TYPE, T.OWL_CLASS)),
        when_t(F.col("uri_t").isNotNull(), tl("uri_t", T.RDFS_LABEL, F.col("labelN"))),
        when_t(F.col("uri_t").isNotNull(), t("qua_iri", T.RDF_TYPE, "uri_t")),
        t("qua_iri", T.RDF_TYPE, NI),
        tl("qua_iri", T.RDFS_LABEL, F.col("qua_label")),
        # negation restriction/complement (F7, main.py:1037-1076)
        when_t(F.col("neg_resolved"),
               tl("restr_iri", T.RDFS_LABEL,
                  F.concat(F.lit("has_characteristic some "), F.col("base_label")))),
        when_t(F.col("neg_resolved"), t("restr_iri", T.RDF_TYPE, T.OWL_RESTRICTION)),
        when_t(F.col("neg_resolved"), t("restr_iri", T.OWL_ON_PROPERTY, T.RO_HAS_CHARACTERISTIC)),
        when_t(F.col("neg_resolved"), t("restr_iri", T.OWL_SOME_VALUES_FROM, "resolved_uri")),
        when_t(F.col("neg_resolved"), t("comp_iri", T.RDF_TYPE, T.OWL_CLASS)),
        when_t(F.col("neg_resolved"), t("comp_iri", T.OWL_COMPLEMENT_OF, "restr_iri")),
        when_t(F.col("neg_resolved"),
               tl("comp_iri", T.RDFS_LABEL,
                  F.concat(F.lit("NOT (has_characteristic some "), F.col("base_label"), F.lit(")")))),
        when_t(F.col("neg_resolved"), t("qua_iri", T.RDF_TYPE, "comp_iri")),
        when_t(F.col("neg_resolved") & F.col("char_var_uri").isNotNull(),
               t("char_var_uri", T.RDF_TYPE, T.OWL_CLASS)),
        when_t(F.col("neg_resolved") & F.col("char_var_uri").isNotNull(),
               t("qua_iri", T.RDF_TYPE, "char_var_uri")),
        # matrix-phase state labels (A2 with phase-b offset)
        t("sta_iri", T.RDF_TYPE, T.CDAO_STATE),
        t("sta_iri", T.RDF_TYPE, NI),
        tl("sta_iri", T.RDFS_LABEL, F.col("sta_label")),
        t("char_iri", T.PHB_MAY_HAVE_STATE, "sta_iri"),
    ]))

    cell_triples = emit(cells_j, *_memo_cols("cell_triples", lambda: [
        tl("cell_iri", T.RDFS_LABEL, F.concat(F.lit("cell:id-"), F.col("cell_n"))),
        tl("cell_iri", T.DC_DESCRIPTION,
           F.concat(F.lit("Cell for taxon "), F.col("taxon"),
                    F.lit(", character "), F.col("char_id"))),
        t("cell_iri", T.RDF_TYPE, NI),
        t("cell_iri", T.RDF_TYPE, T.CDAO_CELL),
        t("cell_iri", T.CDAO_BELONGS_TO_CHARACTER, "char_iri"),
    ]))

    visit_triples = emit(visits, *_memo_cols("visit_triples", lambda: [
        tl("phe_iri", T.KB_SORT_CHAR_NUM, F.col("char_sort_num"), dt=T.XSD_INTEGER),
        tl("phe_iri", T.KB_SORT_SPECIES, F.col("norm_taxon")),
        tl("phe_iri", T.DC_DESCRIPTION,
           F.concat(F.lit("Phenotype statement for "),
                    F.coalesce(F.col("char_label"), F.col("char_id")),
                    F.lit(" in "), F.col("norm_taxon"))),
        t("phe_iri", T.RDF_TYPE, NI),
        tl("phe_iri", T.RDFS_LABEL, F.concat(F.lit("phenotype:id-"), F.col("phe_n"))),
        t("phe_iri", T.RDF_TYPE, "stmt_type"),
        # organism class + instance typing (handle_organism)
        t("v_org_uri", T.RDF_TYPE, T.OWL_CLASS),
        tl("v_org_uri", T.RDFS_LABEL, F.col("v_org_label")),
        t("org_iri", T.RDF_TYPE, "v_org_uri"),
        t("org_iri", T.RDF_TYPE, NI),
        # TU scaffolding in the cell loop (main.py:1833-1842)
        t("tu_iri", T.RDF_TYPE, NI),
        t("tu_iri", T.RDF_TYPE, T.CDAO_TU),
        t("org_iri", T.RO_HAS_ROLE_IN_MODELLING, "tu_iri"),
        t("cell_iri", T.CDAO_BELONGS_TO_TU, "tu_iri"),
        t("mx_iri", T.CDAO_HAS_TU, "tu_iri"),
        t("phe_iri", T.PHB_HAS_ORGANISM, "org_iri"),
        # variable (handle_variable_component)
        when_t(F.col("var_iri").isNotNull() & F.col("var_uri").isNotNull() & (F.col("var_uri") != ""),
               t("var_uri", T.RDF_TYPE, T.OWL_CLASS)),
        when_t(F.col("var_iri").isNotNull() & F.col("var_uri").isNotNull() & (F.col("var_uri") != ""),
               tl("var_uri", T.RDFS_LABEL, F.col("var_label_eff"))),
        when_t(F.col("var_iri").isNotNull() & F.col("var_uri").isNotNull() & (F.col("var_uri") != ""),
               t("var_iri", T.RDF_TYPE, "var_uri")),
        when_t(F.col("var_iri").isNotNull() & F.col("var_comment").isNotNull()
               & (F.col("var_comment") != ""),
               tl("var_iri", T.RDFS_COMMENT, F.col("var_comment"))),
        when_t(F.col("var_iri").isNotNull(), t("phe_iri", T.PHB_HAS_VARIABLE, "var_iri")),
        # per-organism quality clone (F6, main.py:1864-1883)
        when_t(F.col("per_org_qua_iri").isNotNull(), t("per_org_qua_iri", T.RDF_TYPE, NI)),
        when_t(F.col("per_org_qua_iri").isNotNull(),
               tl("per_org_qua_iri", T.RDFS_LABEL, F.coalesce(F.col("st_qua_label"), F.lit("quality")))),
        when_t(F.col("per_org_qua_iri").isNotNull() & F.col("st_uri").isNotNull(),
               t("per_org_qua_iri", T.RDF_TYPE, "st_uri")),
        when_t(F.col("per_org_qua_iri").isNotNull() & F.col("st_neg_resolved"),
               t("per_org_qua_iri", T.RDF_TYPE, "st_comp_iri")),
        when_t(F.col("per_org_qua_iri").isNotNull() & F.col("st_neg_resolved")
               & F.col("st_var_uri").isNotNull(),
               t("per_org_qua_iri", T.RDF_TYPE, "st_var_uri")),
        when_t(F.col("per_org_qua_iri").isNotNull() & F.col("last_loc_iri").isNotNull(),
               t("last_loc_iri", T.RO_HAS_CHARACTERISTIC, "per_org_qua_iri")),
        when_t(F.col("per_org_qua_iri").isNotNull(),
               t("phe_iri", T.PHB_HAS_QUALITY, "per_org_qua_iri")),
        # cell -> state / phenotype links
        when_t(F.col("st_sta_iri").isNotNull(), t("cell_iri", T.CDAO_HAS_STATE, "st_sta_iri")),
        t("cell_iri", T.PHB_REFERS_TO_STATEMENT, "phe_iri"),
    ]))

    # locator triples per visit (F4 chain links + classes + phe links)
    loc_x = visits.select(
        *DOC, "char_pos", "taxon_pos", "vord", "phe_iri",
        F.posexplode("loc_chain").alias("lpos", "lc"),
    )
    loc_triples = emit(loc_x, *_memo_cols("loc_triples", lambda: [
        when_t(F.col("lc.uri").isNotNull(), tl(F.col("lc.uri"), T.RDFS_LABEL, F.col("lc.label"))),
        when_t(F.col("lc.uri").isNotNull(), t(F.col("lc.uri"), T.RDF_TYPE, T.OWL_CLASS)),
        when_t(F.col("lc.uri").isNotNull(), t(F.col("lc.iri"), T.RDF_TYPE, F.col("lc.uri"))),
        t(F.col("lc.prev"), T.BFO_HAS_PART, F.col("lc.iri")),
        t("phe_iri", T.PHB_HAS_ENTITY, F.col("lc.iri")),
    ]))

    # first-visit sequential labels (A1/A2) for org / loc / var entities,
    # all three families in ONE tagged pass over the visits checkpoint
    # (round 6): previously each family scanned the checkpoint and
    # shuffled separately (three full deserializing scans — RDD scans
    # cannot column-prune). One explode emits a row's org candidate, its
    # conditional var candidate, and one candidate per locator-chain
    # element; one (doc, kind, iri) min_by aggregation picks each
    # entity's first visit (order keys are unique per row within a
    # document, so min_by picks exactly the old rn=1 row); the per-kind
    # filters then feed the same per-document `seq` numbering as before
    # over identical row sets. The per-document rank goes through `seq`
    # (two-phase when counter_buckets is set).
    _FC = lambda kind, iri, lpos, pfx: F.struct(  # noqa: E731
        F.lit(kind).alias("kind"), iri.alias("iri"),
        F.col("char_pos").alias("char_pos"),
        F.col("taxon_pos").alias("taxon_pos"), F.col("vord").alias("vord"),
        lpos.alias("lpos"), pfx.alias("pfx"),
    )
    first_cands = visits.select(
        *DOC,
        _memo_cols("first_cands_expr", lambda: F.explode(F.concat(
            F.array(
                _FC("org", F.col("org_iri"), F.lit(0), F.col("v_org_label")),
                F.when(
                    F.col("var_iri").isNotNull(),
                    _FC("var", F.col("var_iri"), F.lit(0), F.col("var_label_eff")),
                ),
            ),
            F.transform(
                F.coalesce(F.col("loc_chain"), F.array().cast(_LOC_CHAIN_TYPE)),
                lambda lc, i: _FC("loc", lc["iri"], i, lc["label"]),
            ),
        )).alias("c")),
    ).filter(F.col("c").isNotNull() & F.col("c.iri").isNotNull()).select(*DOC, "c.*")
    firsts_all = (
        first_cands.groupBy(*DOC, "kind", "iri")
        .agg(
            F.min_by(
                F.struct("char_pos", "taxon_pos", "vord", "lpos", "pfx"),
                F.struct("char_pos", "taxon_pos", "vord", "lpos"),
            ).alias("__f")
        )
        .select(*DOC, "kind", "iri", "__f.*")
    )

    def first_visit_labels(kind, order_cols, fallback):
        firsts = firsts_all.filter(F.col("kind") == kind).drop("kind")
        firsts = seq(firsts, list(order_cols), "__n")
        prefix = F.when(
            F.col("pfx").isNull(), F.lit(fallback)
        ).otherwise(strip_col(F.col("pfx")))
        return emit(
            firsts,
            t("iri", T.RDF_TYPE, NI),
            tl("iri", T.RDFS_LABEL, F.concat(prefix, F.lit(":id-"), F.col("__n"))),
        )

    org_labels = first_visit_labels("org", ["char_pos", "taxon_pos", "vord"], "organism")
    loc_labels = first_visit_labels(
        "loc", ["char_pos", "taxon_pos", "vord", "lpos"], "locator")
    var_labels = first_visit_labels("var", ["char_pos", "taxon_pos", "vord"], "variable")

    matrix_part = union_emissions(
        mx_triples, mx_char_links, char_nodes.drop("char_id"),
        sp2_triples.drop("char_id"), sta_qua_triples,
        cell_triples, visit_triples, loc_triples, org_labels, loc_labels, var_labels,
    )

    # -- species + TU parts ----------------------------------------------
    taxa = (
        cells.select(*DOC, "taxon_pos", "taxon").distinct()
        .withColumn("taxon_label", norm_taxon_label(F.col("taxon")))
    )
    skeys = species.select(
        *DOC, "sp_pos", "input_name", "valid_name", "gbif_id", "zoobank_id", "uri",
        F.col("valid_name").alias("__key"),
    ).unionByName(
        species.select(
            *DOC, "sp_pos", "input_name", "valid_name", "gbif_id", "zoobank_id", "uri",
            F.col("input_name").alias("__key"),
        )
    ).filter(F.col("__key").isNotNull())
    taxa_sp = (
        taxa.alias("t").join(
            bhint(skeys.alias("k")),
            (F.col("t.repo") == F.col("k.repo"))
            & (F.col("t.commit") == F.col("k.commit"))
            & (F.col("t.taxon_label") == F.col("k.__key")),
            "left",
        )
        .groupBy("t.repo", "t.commit", "t.taxon_pos", "t.taxon", "t.taxon_label")
        .agg(
            F.min_by(
                F.struct("k.valid_name", "k.input_name", "k.gbif_id", "k.zoobank_id", "k.uri"),
                F.col("k.sp_pos"),
            ).alias("sp")
        )
        .select(
            F.col("repo"), F.col("commit"), F.col("taxon_pos"), F.col("taxon"),
            F.col("taxon_label"), F.col("sp.*"),
        )
    )
    # normalize_species_uri(info.URI, taxon_label) — input uri is already
    # load-normalized; renormalization is idempotent (main.py:146-167,627).
    # Constant trees, built once per JVM, applied in one projection.
    def _build_taxa_exprs():
        sp_uri = F.when(
            F.col("uri").isNull() | (F.col("uri") == ""),
            F.concat(F.lit(T.KB), F.col("taxon_label")),
        ).when(
            strip_col(F.col("uri")).startswith("kb:"),
            F.concat(F.lit(T.KB),
                     norm_taxon_label(F.substring(strip_col(F.col("uri")), 4, 2 ** 30))),
        ).when(
            strip_col(F.col("uri")).startswith(T.KB),
            F.concat(F.lit(T.KB),
                     norm_taxon_label(F.substring(strip_col(F.col("uri")), len(T.KB) + 1, 2 ** 30))),
        ).otherwise(strip_col(F.col("uri")))
        return [
            sp_uri.alias("sp_uri"),
            norm_taxon_label(
                F.coalesce(F.nullif(F.col("valid_name"), F.lit("")), F.col("taxon_label"))
            ).alias("concept_label"),
            kb_iri("sp", F.lower(strip_col(F.col("taxon_label")))).alias("sp_inst"),
            kb_iri("tu", F.lower(strip_col(F.col("taxon_label")))).alias("tu_iri"),
        ]

    taxa_sp = taxa_sp.select("*", *_memo_cols("taxa_exprs", _build_taxa_exprs))
    if materialize:
        # taxa_sp is a per-taxon dimension table (rows = distinct taxa)
        # consumed by TWO emission branches (species_part and tu_part) —
        # without pinning, each branch re-ran the NEXUS parse, distinct,
        # species-key join and min_by aggregation inside the dedup job.
        taxa_sp = mat(taxa_sp, "taxa_sp")
    species_part = emit(taxa_sp, *_memo_cols("species_part", lambda: [
        t("sp_uri", T.RDF_TYPE, T.OWL_CLASS),
        tl("sp_uri", T.RDFS_LABEL, F.col("concept_label")),
        t("sp_uri", T.RDF_TYPE, T.TXR_SPECIES),
        t("sp_inst", T.RDF_TYPE, "sp_uri"),
        t("sp_inst", T.RDF_TYPE, NI),
        tl("sp_inst", T.RDFS_LABEL, F.col("taxon_label")),
        when_t(F.col("gbif_id").isNotNull(),
               tl("sp_inst", T.DWC_PARENT_NAME_USAGE_ID,
                  F.concat(F.lit("GBIF:"), F.col("gbif_id")))),
        when_t(F.col("gbif_id").isNotNull(),
               t("sp_inst", T.RDFS_SEEALSO,
                 F.concat(F.lit("https://www.gbif.org/species/"), F.col("gbif_id")))),
        when_t(F.col("zoobank_id").isNotNull(),
               tl("sp_inst", T.DWC_TAXON_ID, F.col("zoobank_id"))),
    ]))

    # TU enrichment (F10): default organism from the first char row that
    # carries both Organism and SpeciesLabel (main.py:871-890), else a
    # per-taxon deterministic fallback (main.py:2033-2037).
    default_org = (
        charsx.filter(F.col("org_label").isNotNull() & F.col("species_label").isNotNull())
        .groupBy(*DOC)
        .agg(
            F.min_by(
                F.struct("org_label", "species_label", "salt"), F.col("char_pos")
            ).alias("d")
        )
        .select(
            *DOC,
            kb_iri(
                "org",
                F.concat_ws(
                    "::",
                    F.col("d.salt"),
                    F.coalesce(F.nullif(norm_seed_component(F.col("d.species_label")), F.lit("")),
                               F.lit("unknown-taxon")),
                    F.coalesce(F.nullif(norm_seed_component(F.col("d.org_label")), F.lit("")),
                               F.lit("organism")),
                ),
            ).alias("default_org_iri"),
        )
    )
    # tu enrichment columns are constant trees (built once per JVM) and
    # apply in three dependency-ordered projections
    def _build_tu_exprs():
        return {
            "a": [
                F.coalesce(
                    F.col("default_org_iri"),
                    kb_iri("org", F.concat(F.lower(strip_col(F.col("taxon_label"))),
                                           F.lit("::organism"))),
                ).alias("org_eff"),
                strip_col(
                    F.coalesce(
                        F.nullif(F.col("valid_name"), F.lit("")),
                        F.nullif(F.col("input_name"), F.lit("")),
                        F.nullif(F.col("taxon_label"), F.lit("")),
                        F.lit("Unknown species"),
                    )
                ).alias("valid_label"),
            ],
            "b": [F.split(F.col("valid_label"), " ", 3).alias("__parts")],
            "c": [
                F.when(
                    F.size("__parts") >= 2,
                    F.concat(F.col("__parts")[0], F.lit(" "), F.col("__parts")[1]),
                ).otherwise(F.col("valid_label")).alias("binomial"),
                F.when(F.size("__parts") == 3, F.col("__parts")[2])
                .otherwise(F.lit("")).alias("author"),
            ],
            "d": [
                strip_col(F.concat(F.lit("<i>"), F.col("binomial"),
                                   F.lit("</i> "), F.col("author"))).alias("tu_comment"),
            ],
        }

    tue = _memo_cols("tu_exprs", _build_tu_exprs)
    tu_rows = taxa_sp.join(bhint(default_org), DOC, "left")
    for stage_key in ("a", "b", "c", "d"):
        tu_rows = tu_rows.select("*", *tue[stage_key])
    tu_part = emit(tu_rows, *_memo_cols("tu_part", lambda: [
        t("tu_iri", T.RDF_TYPE, NI),
        tl("tu_iri", T.RDFS_LABEL, F.col("taxon_label")),
        tl("tu_iri", T.RDFS_COMMENT, F.col("tu_comment")),
        t("org_eff", T.RDF_TYPE, NI),
        t("tu_iri", T.RDF_TYPE, T.CDAO_TU),
        t("tu_iri", T.IAO_DENOTES, "sp_inst"),
    ]))

    # -- final assembly ---------------------------------------------------
    def with_part(df, name):
        return df.withColumn("part", F.lit(name))

    parts = union_emissions(
        with_part(base_part, "base"),
        with_part(char_part, "char"),
        with_part(matrix_part, "matrix"),
        with_part(species_part, "species"),
        with_part(tu_part, "tu"),
    )
    # Single-shuffle dedup (round 6, guide §2.3/§2.4): the old shape
    # checkpointed `parts` (a full ~2x-triple-count materialization of
    # wide string rows) and then ran TWO independent dedup shuffles over
    # it — dedup(all) and dedup(matrix subset) — before pruning each.
    # One groupBy over the emission union computes both at once: the
    # grouped key IS the triple identity, and max(part=='matrix') marks
    # matrix membership, so dedup(matrix) is a post-shuffle filter
    # instead of a second full exchange. The deduped table (the smaller,
    # already-combined set) is what gets checkpointed; `parts` itself
    # stays a lazy plan over the checkpointed hubs (consumed exactly
    # once here — its other consumer, char_combined, is a lazy output).
    dd = (
        parts.withColumn("__mx", F.col("part") == "matrix")
        .groupBy("repo", "commit", "s", "p", "o", "lit", "dt")
        .agg(F.max("__mx").alias("__mx"))
    )
    if materialize:
        dd = mat(dd, "dedup")

    # both prune scopes share one victim scan over dd (see
    # prune_unreferenced_scoped); the small per-node flag table is
    # pinned so the four broadcast victim builds don't re-run the scan
    pruned, matrix_pruned = prune_unreferenced_scoped(
        dd, "__mx", hint=bhint,
        materialize_flags=(
            (lambda f: mat(f, "victim_flags")) if materialize else None
        ),
    )
    # Emission-order key for matrix labels: the reference's label-priority
    # pass takes the FIRST label in graph insertion order (main.py:1243-1270
    # pref_labels[0]), which only diverges from lexicographic min when one
    # subject carries two distinct matrix labels — class URIs labeled from
    # several states/visits, or colliding sta-/restr-/comp- seeds. Replay
    # the reference loop order (handle_quality per state -> char/state
    # nodes -> per-cell visit loop: organism, locator chain, variable) as a
    # sortable struct. Unmapped labels sort last (see apply_label_priority).
    def _ord(k1, k2, k3, k4, k5):
        return F.struct(
            k1.cast("long").alias("k1"), F.lit(k2).cast("long").alias("k2"),
            k3.cast("long").alias("k3"), k4.cast("long").alias("k4"),
            k5.cast("long").alias("k5"),
        )

    # One tagged explode per source table (round 6): the direct form ran
    # eight separate subtrees — five full scans of the states_x
    # checkpoint and three of visits (checkpoint scans cannot column-
    # prune) — unioned before the aggregation. Emitting all of a row's
    # candidate (s, o, ord) entries in a single pass per table yields
    # the identical union with one scan each; conditional entries become
    # null structs and are filtered after the explode, exactly like
    # emit(). The locator entries ride the visits pass via a transform
    # over loc_chain (index i == lpos of the old posexplode).
    def _cand(cond, s_col, o_col, ordc):
        st_ = F.struct(
            s_col.cast("string").alias("s"),
            o_col.cast("string").alias("o"),
            ordc.alias("ord"),
        )
        return F.when(cond, st_) if cond is not None else st_

    Z = F.lit(0)
    CP, SI = F.col("char_pos"), F.col("state_idx")
    TP, VO = F.col("taxon_pos"), F.col("vord")
    state_cands = states_x.select(
        *DOC,
        _memo_cols("state_cands_expr", lambda: F.explode(F.array(
            _cand(F.col("uri_t").isNotNull(),
                  F.col("uri_t"), F.col("labelN"), _ord(CP, 0, SI, Z, Z)),
            _cand(None, F.col("qua_iri"), F.col("qua_label"),
                  _ord(CP, 0, SI, F.lit(1), Z)),
            _cand(F.col("neg_resolved"), F.col("restr_iri"),
                  F.concat(F.lit("has_characteristic some "), F.col("base_label")),
                  _ord(CP, 0, SI, F.lit(2), Z)),
            _cand(F.col("neg_resolved"), F.col("comp_iri"),
                  F.concat(F.lit("NOT (has_characteristic some "),
                           F.col("base_label"), F.lit(")")),
                  _ord(CP, 0, SI, F.lit(3), Z)),
            _cand(None, F.col("sta_iri"), F.col("sta_label"),
                  _ord(CP, 1, SI, Z, Z)),
        )).alias("c")),
    )
    visit_cands = visits.select(
        *DOC,
        _memo_cols("visit_cands_expr", lambda: F.explode(F.concat(
            F.array(
                _cand(None, F.col("v_org_uri"), F.col("v_org_label"),
                      _ord(CP, 2, TP, VO, Z)),
                _cand(F.col("var_iri").isNotNull()
                      & F.col("var_uri").isNotNull()
                      & (F.col("var_uri") != ""),
                      F.col("var_uri"), F.col("var_label_eff"),
                      _ord(CP, 2, TP, VO, F.lit(1_000_000))),
            ),
            F.transform(
                F.coalesce(F.col("loc_chain"),
                           F.array().cast(_LOC_CHAIN_TYPE)),
                lambda lc, i: F.when(
                    lc["uri"].isNotNull(),
                    F.struct(
                        lc["uri"].cast("string").alias("s"),
                        lc["label"].cast("string").alias("o"),
                        _ord(CP, 2, TP, VO, F.lit(1) + i).alias("ord"),
                    ),
                ),
            ),
        )).alias("c")),
    )
    label_order = (
        state_cands.unionByName(visit_cands)
        .filter(F.col("c").isNotNull()
                & F.col("c.s").isNotNull() & F.col("c.o").isNotNull())
        .select(*DOC, "c.s", "c.o", "c.ord")
        .groupBy(*DOC, "s", "o").agg(F.min("ord").alias("ord"))
    )

    matrix_labels = (
        matrix_pruned.filter(F.col("p") == T.RDFS_LABEL)
        .select(*DOC, "s", "o")
        # corpus-gated broadcast of the (aggregated, per-doc small)
        # emission-order map — past the document gate this joins by
        # shuffle like every other dimension join
        .join(bhint(label_order), DOC + ["s", "o"], "left")
    )
    # label_subjects_only is PROVEN for this call (see the operator's
    # docstring): ml subjects always keep their label row in the pruned
    # full graph, so the replaced-subject set derives from label rows
    final = apply_label_priority(matrix_labels, pruned, hint=bhint,
                                 label_subjects_only=True)

    # characters_combined output (S3): base + char graphs, with matrix
    # labels made authoritative before writing (main.py:2129-2137)
    char_combined = apply_label_priority(
        matrix_labels,
        dedup_triples(
            parts.filter(F.col("part").isin("base", "char")).drop("part")
        ),
        hint=bhint,
    )

    return {
        "chars": charsx,
        "states": states_x,
        "cells": cells_j,
        "visits": visits,
        "species": species,
        "taxa": taxa_sp,
        "parts": parts,
        "char_part_tagged": char_part_tagged,
        "matrix_part": matrix_part,
        "char_part": char_part,
        "species_part": species_part,
        "tu_part": tu_part,
        "base_part": base_part,
        "matrix_pruned": matrix_pruned,
        "char_combined": char_combined,
        "triples": final,
    }
