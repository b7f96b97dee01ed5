"""Training-data pipeline queries (beyond-reference; SURVEY §7.1 M7) over
``documents`` and ``embeddings``: text analysis, dedup (exact / n-gram
Jaccard / MinHash+LSH / SimHash), similarity search, and multimodal
(mapInPandas) plumbing.

Every DuckDB oracle below is generated from the SAME module constants
(regexes, stopword lists, minhash permutations, moduli) as the Spark
implementation — the two engines recompute the algorithm independently and
must hash-match. Float-bearing queries (cosine) use sequential left-fold
accumulation on BOTH sides (Spark ``aggregate``, DuckDB ``list_reduce`` with
a prepended 0.0) so doubles are bit-identical before the integer flooring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .entry_queries import register
from .functions import P31, P_FP, h60_sql
from .operators import dedup as D
from .operators import embedding as E
from .operators import multimodal as M
from .operators import scrub as SC
from .operators import similarity as S
from .operators import text as T
from .sources.tpch import load_table

NEARDUP_COS_BP = 4000
KNN_K = 5
KNN_QUERY_MOD = 50  # vec_id % 50 == 0 → the evaluation query subset


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _embs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --------------------------------------------------------------------------
# Shared DuckDB fragments (kept adjacent to the constants they mirror)
# --------------------------------------------------------------------------

_TOKS_CTE = f"""toks AS (
    SELECT doc_id, text, regexp_extract_all(lower(text), '{T.TOKEN_RE}') AS toks
    FROM documents)"""

_NGRAMS_CTE = f"""{_TOKS_CTE},
shingles AS (
    SELECT doc_id,
           list_distinct(list_transform(range(len(toks) - {D.NGRAM_N - 1}),
               i -> {h60_sql(f"array_to_string(list_slice(toks, i + 1, i + {D.NGRAM_N}), ' ')")})) AS gh
    FROM toks)
, ngr AS (SELECT doc_id, gh FROM shingles WHERE len(gh) > 0)"""


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def _fold_sum(list_expr: str, init: str = "0.0") -> str:
    """Sequential left-fold sum — mirrors Spark's F.aggregate exactly."""
    return f"list_reduce(list_prepend({init}, {list_expr}), (a, b) -> a + b)"


_EMB_NORM_CTE = f"""base AS (
    SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings),
vecs AS (
    SELECT vec_id, emb,
           sqrt({_fold_sum("list_transform(emb, x -> x * x)")}) AS nrm
    FROM base)"""

_DOT = _fold_sum("list_transform(list_zip({a}, {b}), p -> p[1] * p[2])")


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_hits_exprs = ",\n           ".join(
    f"CAST(len(list_filter(toks, t -> t IN ({_in_list(T.STOPWORDS[lang])}))) AS BIGINT)"
    f" AS hits_{lang}"
    for lang in T.LANG_ORDER
)
_best = "greatest(" + ", ".join(f"hits_{lang}" for lang in T.LANG_ORDER) + ")"
_pred_chain = " ".join(
    f"WHEN hits_{lang} = {_best} THEN '{lang}'" for lang in T.LANG_ORDER
)


@register(
    "language_id",
    f"""WITH {_TOKS_CTE},
    hits AS (SELECT doc_id, {_hits_exprs} FROM toks)
    SELECT doc_id, {", ".join(f"hits_{lang}" for lang in T.LANG_ORDER)},
           CASE {_pred_chain} END AS lang_pred
    FROM hits""",
)
def language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-hit language ID (argmax, LANG_ORDER tie-break); no shuffle."""
    return T.language_id(_docs(spark, sf_dir))


@register(
    "text_stats",
    f"""WITH ws AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS ws_toks
        FROM documents)
    SELECT doc_id,
           CAST(len(ws_toks) AS BIGINT) AS n_tokens_ws,
           CAST(len(regexp_extract_all(text, '{T.BPE_RE}')) AS BIGINT) AS n_tokens_bpe,
           CAST(len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS BIGINT) AS n_punct,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(CASE WHEN len(ws_toks) > 0
                     THEN floor({_fold_sum("list_transform(ws_toks, x -> length(x))", "CAST(0 AS BIGINT)")} * 100 / len(ws_toks))
                     ELSE 0 END AS BIGINT) AS mean_tok_len_x100
    FROM ws""",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace + BPE-ish regex) and byte/char stats."""
    return T.text_stats(_docs(spark, sf_dir))


@register(
    "quality_score",
    f"""WITH {_TOKS_CTE},
    m AS (SELECT doc_id,
                 len(toks) AS n_tok,
                 len(list_filter(toks, t -> t IN ({_in_list(T.STOPWORDS["en"])}))) AS stop,
                 len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS punct,
                 length(text) AS n_chars
          FROM toks),
    r AS (SELECT doc_id, n_tok,
                 CASE WHEN n_tok > 0 THEN CAST(floor(stop * 10000 / n_tok) AS BIGINT) ELSE 0 END AS stop_bp,
                 CASE WHEN n_chars > 0 THEN CAST(floor(punct * 10000 / n_chars) AS BIGINT) ELSE 0 END AS punct_bp
          FROM m)
    SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tokens, stop_bp, punct_bp,
           (n_tok >= 5 AND n_tok <= 100000 AND stop_bp >= 100 AND stop_bp <= 6000
            AND punct_bp < 2000) AS keep
    FROM r""",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: stopword/punctuation basis-point ratios."""
    return T.quality_score(_docs(spark, sf_dir))


@register(
    "doc_fingerprint",
    f"""WITH {_TOKS_CTE}
    SELECT doc_id,
           CAST(list_reduce(
                 list_prepend(CAST(0 AS BIGINT),
                              list_transform(toks, t -> {h60_sql('t')} % {P_FP})),
                 (a, b) -> (a * {T.FP_BASE} + b) % {P_FP}) AS BIGINT) AS fingerprint
    FROM toks""",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling polynomial hash over the token stream."""
    return T.fingerprint(_docs(spark, sf_dir))


@register(
    "tfidf_top_terms",
    f"""WITH {_TOKS_CTE},
    terms AS (SELECT doc_id, unnest(toks) AS term FROM toks),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM terms GROUP BY doc_id, term),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    nd AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
        SELECT doc_id, term, tf, df,
               CAST((num // den) * 1000000 + ((num % den) * 1000000) // den
                    AS BIGINT) AS tfidf_x1e6
        FROM (SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
                     tf.tf * (nd.n_docs + 1) AS num, dfreq.df + 1 AS den
              FROM tf JOIN dfreq ON tf.term = dfreq.term CROSS JOIN nd)),
    ranked AS (
        SELECT doc_id, term, tf, df, tfidf_x1e6,
               row_number() OVER (PARTITION BY doc_id
                                  ORDER BY tfidf_x1e6 DESC, term ASC) AS rank
        FROM scored)
    SELECT doc_id, term, CAST(rank AS INT) AS rank,
           CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df, tfidf_x1e6
    FROM ranked WHERE rank <= 3""",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per doc; corpus-size scalar stays in-plan."""
    return T.tfidf_top_terms(_docs(spark, sf_dir), k=3)


# --------------------------------------------------------------------------
# Deduplication
# --------------------------------------------------------------------------


@register(
    "dedup_exact",
    """WITH keyed AS (
        SELECT doc_id,
               md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_key
        FROM documents)
    SELECT doc_id, content_key,
           min(doc_id) OVER (PARTITION BY content_key) AS canonical_id,
           doc_id <> min(doc_id) OVER (PARTITION BY content_key) AS is_dup
    FROM keyed""",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a normalized 128-bit content key."""
    return D.exact_canonical(_docs(spark, sf_dir))


@register(
    "doc_curation",
    f"""WITH {_TOKS_CTE},
    qm AS (SELECT doc_id, text,
                  len(toks) AS n_tok,
                  len(list_filter(toks, t -> t IN ({_in_list(T.STOPWORDS["en"])}))) AS stop,
                  len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS punct,
                  length(text) AS n_chars
           FROM toks),
    kept AS (SELECT doc_id, text FROM qm
             WHERE n_tok >= 5 AND n_tok <= 100000
               AND floor(stop * 10000 / n_tok) BETWEEN 100 AND 6000
               AND (CASE WHEN n_chars > 0
                         THEN floor(punct * 10000 / n_chars) ELSE 0 END) < 2000),
    keyed AS (SELECT doc_id,
                     md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS content_key
              FROM kept)
    SELECT content_key, min(doc_id) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM keyed GROUP BY content_key""",
)
def doc_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation (quality gate → exact dedup), the batch
    face of ``streaming.doc_stream``: one row per surviving content key."""
    from .streaming import doc_stream

    return doc_stream.curate_canonical(_docs(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    f"""WITH {_NGRAMS_CTE},
    inv AS (SELECT doc_id, unnest(gh) AS g FROM ngr),
    rare AS (SELECT g FROM inv GROUP BY g HAVING count(*) <= {D.MAX_SHINGLE_DF}),
    capped AS (SELECT doc_id, i.g FROM inv i JOIN rare r ON i.g = r.g),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM capped a JOIN capped b ON a.g = b.g AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard_bp FROM (
        SELECT doc_a, doc_b,
               CAST(floor(len(list_intersect(ga.gh, gb.gh)) * 10000
                    / (len(ga.gh) + len(gb.gh)
                       - len(list_intersect(ga.gh, gb.gh)))) AS BIGINT) AS jaccard_bp
        FROM cand
        JOIN ngr ga ON ga.doc_id = doc_a
        JOIN ngr gb ON gb.doc_id = doc_b)
    WHERE jaccard_bp >= {D.JACCARD_MIN_BP}""",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-gram Jaccard pairs: df-capped candidate generation (hot-shingle
    quadratic guard, ``dedup.MAX_SHINGLE_DF``), exact array-intersect
    verification — the oracle mirrors both stages."""
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir))


_PERMS_SQL = "[" + ", ".join(f"{{'a': {a}, 'b': {b}}}" for a, b in D.PERMS) + "]"

#: shared CTE chain ending in verified near-dup `pairs` — the minhash query
#: selects from it directly, dedup_clusters extends it with a recursive
#: transitive closure.
_MINHASH_PAIRS_CTES = f"""{_NGRAMS_CTE},
    sigs AS (SELECT doc_id,
                    list_transform({_PERMS_SQL},
                        p -> list_min(list_transform(gh, g -> (p.a * (g % {P31}) + p.b) % {P31}))) AS sig
             FROM ngr),
    bands AS (SELECT doc_id, band_id,
                     array_to_string(list_slice(sig, band_id * {D.BAND_ROWS} + 1,
                                                band_id * {D.BAND_ROWS} + {D.BAND_ROWS}), '-') AS band_sig
              FROM sigs, range({D.N_BANDS}) t(band_id)),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band_id = b.band_id AND a.band_sig = b.band_sig
              AND a.doc_id < b.doc_id),
    pairs AS (
        SELECT doc_a, doc_b, jaccard_bp FROM (
            SELECT doc_a, doc_b,
                   CAST(floor(len(list_intersect(ga.gh, gb.gh)) * 10000
                        / (len(ga.gh) + len(gb.gh)
                           - len(list_intersect(ga.gh, gb.gh)))) AS BIGINT) AS jaccard_bp
            FROM cand
            JOIN ngr ga ON ga.doc_id = doc_a
            JOIN ngr gb ON gb.doc_id = doc_b)
        WHERE jaccard_bp >= {D.JACCARD_MIN_BP})"""


@register(
    "dedup_minhash_lsh",
    f"WITH {_MINHASH_PAIRS_CTES}\n    SELECT doc_a, doc_b, jaccard_bp FROM pairs",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, Jaccard-verified."""
    return D.minhash_lsh_pairs(_docs(spark, sf_dir))


_DEDUP_CLUSTERS_SQL = f"""WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
    lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY node)
    SELECT doc_id, cluster_id,
           CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size
    FROM lab"""


@register("dedup_clusters", _DEDUP_CLUSTERS_SQL)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters: connected components (min-label propagation) over
    the verified MinHash near-dup pairs — the transitive closure pairwise
    dedup can't see. Oracle recomputes it as a recursive CTE."""
    return D.duplicate_clusters(D.minhash_lsh_pairs(_docs(spark, sf_dir)))


#: sf_dir -> maintained cluster-table path (scripted CDC windows run once
#: per process; every later call — and the oracle compare — reads the
#: SAME final state)
_CLUSTER_SYNC_BUILT: dict[str, str] = {}


def _cluster_sync_path(spark: SparkSession, sf_dir: str) -> str:
    """Stage the documents table into a keyed sink and maintain the
    near-dup band index AND the union-find cluster table through three
    scripted CDC windows (inserts, noise-updates, deletes — then the
    reverts/reinserts that bring the corpus back to exactly the
    ``documents`` table), so the final incrementally-maintained view can
    be hash-checked against the SAME recursive-CTE oracle as the batch
    ``dedup_clusters`` row. The noise suffixes carry per-doc unique
    tokens, so an interim window can only DROP pairs, never invent one —
    the documented conservative-merge semantics therefore cannot leave a
    stale merge the final corpus wouldn't justify."""
    import os
    import tempfile

    built = _CLUSTER_SYNC_BUILT.get(sf_dir)
    if built is not None:
        return built
    from .operators import clusters as C
    from .sinks.upsert import (
        current_version,
        delete_keys,
        read_keyed_table,
        upsert_parquet,
        write_keyed_table,
    )
    from .streaming.index_sync import (
        cdc_stream_id,
        sync_dedup_clusters,
        sync_neardup_index,
    )

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="spark_graft_cluster_sync_")
    table = os.path.join(root, "table")
    idx = os.path.join(root, "idx")
    cl = os.path.join(root, "clusters")
    held = docs.where(F.col("doc_id") % 7 == 3)
    write_keyed_table(
        docs.where(F.col("doc_id") % 7 != 3), table, key="doc_id",
        n_buckets=8,
    )
    v0 = current_version(table)
    D.build_neardup_index(read_keyed_table(spark, table), idx)
    C.build_cluster_table(
        read_keyed_table(spark, table), cl,
        epoch=v0, epoch_stream=cdc_stream_id(table),
    )

    def window(updates=None, deletes=None):
        if updates is not None:
            upsert_parquet(spark, table, updates, key="doc_id")
        if deletes is not None:
            delete_keys(spark, table, deletes, key="doc_id")
        sync_neardup_index(spark, idx, table, from_version=v0)
        sync_dedup_clusters(spark, cl, table, idx, from_version=v0)

    noised = docs.where(F.col("doc_id") % 11 == 5).withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" zzznoise"), F.col("doc_id").cast("string")
        ),
    )
    # w1: half the held-out docs arrive
    window(updates=held.where(F.col("doc_id") % 2 == 0))
    # w2: the rest arrive; some docs mutate away; some are deleted
    # (the noised arm wins for ids in both — one row per key per batch)
    window(
        updates=held.where(
            (F.col("doc_id") % 2 == 1) & (F.col("doc_id") % 11 != 5)
        ).unionByName(noised),
        deletes=docs.where(F.col("doc_id") % 13 == 6).select("doc_id"),
    )
    # w3: mutations revert, deletions reinsert — final state == documents
    window(
        updates=docs.where(
            (F.col("doc_id") % 11 == 5) | (F.col("doc_id") % 13 == 6)
        )
    )
    _CLUSTER_SYNC_BUILT[sf_dir] = cl
    return cl


@register("dedup_clusters_incremental", _DEDUP_CLUSTERS_SQL, extra=True)
def dedup_clusters_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTALLY-MAINTAINED duplicate clusters (round 12b,
    operators/clusters.py): a persisted union-find table follows the
    documents table at O(changes) through the CDC loop — changed docs
    probe the synced near-dup band index, roots resolve via bounded
    point lookups, merges re-point one row, and the cursor rides the
    same sink commit (exactly-once). After three scripted windows of
    inserts, mutations, deletes, and reverts, the served view
    hash-matches the SAME recursive-CTE oracle as the batch
    ``dedup_clusters`` row — path independence for the cluster view."""
    from .operators import clusters as C

    return C.read_dedup_clusters(spark, _cluster_sync_path(spark, sf_dir))


_chunk_w = D.SIMHASH_BITS // D.SIM_CHUNKS
_votes = ",\n               ".join(
    f"sum(((g32 >> {j}) & 1) * 2 - 1) AS v{j}" for j in range(D.SIMHASH_BITS)
)
_sim_terms = " + ".join(
    f"CASE WHEN v{j} > 0 THEN {1 << j} ELSE 0 END" for j in range(D.SIMHASH_BITS)
)


@register(
    "dedup_simhash",
    f"""WITH {_NGRAMS_CTE},
    ex AS (SELECT doc_id, g % {1 << D.SIMHASH_BITS} AS g32
           FROM (SELECT doc_id, unnest(gh) AS g FROM ngr)),
    votes AS (SELECT doc_id, {_votes}
              FROM ex GROUP BY doc_id),
    sims AS (SELECT doc_id, CAST({_sim_terms} AS BIGINT) AS simhash FROM votes),
    chunks AS (SELECT doc_id, simhash, chunk_idx,
                      (simhash >> (chunk_idx * {_chunk_w})) & {(1 << _chunk_w) - 1} AS chunk_val
               FROM sims, range({D.SIM_CHUNKS}) t(chunk_idx)),
    pairs AS (SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sa,
                     b.doc_id AS doc_b, b.simhash AS sb
              FROM chunks a JOIN chunks b
                ON a.chunk_idx = b.chunk_idx AND a.chunk_val = b.chunk_val
               AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, hamming FROM (
        SELECT doc_a, doc_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
        FROM pairs)
    WHERE hamming <= {D.HAMMING_MAX}""",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via banded Hamming join."""
    return D.simhash_pairs(_docs(spark, sf_dir))


@register(
    "corpus_split",
    f"""SELECT doc_id,
               {h60_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS split_pct,
               CASE WHEN {h60_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 90
                    THEN 'train'
                    WHEN {h60_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 < 95
                    THEN 'val' ELSE 'test' END AS split
        FROM documents""",
)
def corpus_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split via the portable content
    hash — stable across runs, machines, and engines (never rand(): a task
    retry would re-split). The salt prefix decorrelates it from every other
    hash-derived quantity."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    pct = h % 100
    return _docs(spark, sf_dir).select(
        "doc_id",
        pct.alias("split_pct"),
        F.when(pct < 90, "train").when(pct < 95, "val").otherwise("test").alias(
            "split"
        ),
    )


@register(
    "stratified_sample",
    f"""WITH ranked AS (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY {h60_sql("'sample:' || CAST(doc_id AS VARCHAR)")}, doc_id
               ) AS rk
        FROM documents)
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 10""",
    # extra since round 10: corpus-balancing demo whose pieces (windowed
    # rank, deterministic hash order) ride driver rows; freed the slot for
    # the round-9 sink surface
    extra=True,
)
def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source capped sample (≤10 docs/source) in deterministic
    pseudo-random hash order — the corpus-balancing primitive (cap a
    dominant crawl, keep rare sources whole). One shuffle on source."""
    from pyspark.sql import Window

    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        _docs(spark, sf_dir)
        .select("doc_id", "source")
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 10)
    )


@register(
    "leakage_safe_split",
    f"""WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
    lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY node),
    rep AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS rep_id
            FROM documents d LEFT JOIN lab l USING (doc_id))
    SELECT doc_id, rep_id,
           {h60_sql("'lsplit:' || CAST(rep_id AS VARCHAR)")} % 100 AS split_pct,
           CASE WHEN {h60_sql("'lsplit:' || CAST(rep_id AS VARCHAR)")} % 100 < 90
                THEN 'train'
                WHEN {h60_sql("'lsplit:' || CAST(rep_id AS VARCHAR)")} % 100 < 95
                THEN 'val' ELSE 'test' END AS split
    FROM rep""",
    extra=True,
)
def leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup-aware train/val/test split (operators/dedup.py::
    leakage_safe_split): the split hashes each doc's duplicate-cluster
    representative, so a near-copy can never land in test while its twin
    trains — corpus_split's eval-integrity upgrade. Oracle recomputes the
    closure as a recursive CTE and the same portable hash."""
    docs = _docs(spark, sf_dir)
    return D.leakage_safe_split(docs, D.minhash_lsh_pairs(docs))


#: upsample_epochs demo: 2.3 epochs over the (tiny, high-quality by fiat)
#: src0 slice — every doc twice, ~30% of docs a third time
UPSAMPLE_X100 = 230


@register(
    "upsample_epochs",
    f"""WITH src AS (SELECT doc_id, source FROM documents WHERE source = 'src0'),
    n AS (SELECT doc_id, source,
                 2 + CASE WHEN {h60_sql("'epoch:' || CAST(doc_id AS VARCHAR)")} % 100 < 30
                          THEN 1 ELSE 0 END AS n_copies
          FROM src)
    SELECT doc_id, source,
           CAST(unnest(generate_series(1, n_copies)) AS INT) AS copy_idx
    FROM n""",
    extra=True,
)
def upsample_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional-epoch repetition (operators/text.py::upsample_epochs):
    2.3 epochs of the src0 slice — floor copies for everyone plus a
    salted-hash Bernoulli extra, deterministic and map-side only (explode
    of a sequence, no shuffle). The upsampling half of the data-mixing
    story; mixture_sample is the downsampling half."""
    docs = _docs(spark, sf_dir).where(F.col("source") == "src0").select(
        "doc_id", "source"
    )
    return T.upsample_epochs(docs, UPSAMPLE_X100)


#: mixture_sample demo parameters: 50/30/20 token split over three sources
#: out of a 2000-token budget (the other 17 sources are dropped — unlisted
#: means weight 0)
MIX_WEIGHTS_BP = {"src0": 5000, "src1": 3000, "src2": 2000}
MIX_TOTAL_TOKENS = 2000

_MIX_CASE = (
    "CASE source "
    + " ".join(f"WHEN '{s}' THEN {bp}" for s, bp in sorted(MIX_WEIGHTS_BP.items()))
    + " END"
)


@register(
    "mixture_sample",
    f"""WITH tk AS (
        SELECT doc_id, source,
               CAST(len(regexp_extract_all(lower(text), '{T.TOKEN_RE}')) AS BIGINT)
                   AS n_tokens
        FROM documents),
    tot AS (SELECT source, SUM(n_tokens) AS src_tokens FROM tk GROUP BY source
            HAVING SUM(n_tokens) > 0),
    j AS (SELECT tk.doc_id, tk.source, tk.n_tokens, tot.src_tokens,
                 CAST({_MIX_CASE} AS BIGINT) AS w_bp
          FROM tk JOIN tot USING (source)
          WHERE {_MIX_CASE} IS NOT NULL),
    thr AS (SELECT doc_id, source, n_tokens,
                   least(CAST(1000000 AS BIGINT),
                         (tgt // src_tokens) * 1000000
                         + ((tgt % src_tokens) * 1000000) // src_tokens)
                       AS thresh_ppm
            FROM (SELECT *, (CAST({MIX_TOTAL_TOKENS} AS BIGINT) * w_bp) // 10000
                              AS tgt FROM j))
    SELECT doc_id, source, n_tokens, thresh_ppm
    FROM thr
    WHERE {h60_sql("'mix:' || CAST(doc_id AS VARCHAR)")} % 1000000 < thresh_ppm""",
    extra=True,
)
def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing (operators/text.py::mixture_sample): sample
    each source down to its share of a target token budget via a salted
    portable-hash Bernoulli threshold — deterministic, windowless (no
    per-source serialization), one tiny broadcast of per-source totals.
    The composition step of a training-data pipeline, exact-hash-checked
    against the DuckDB oracle because every arithmetic step is int64."""
    return T.mixture_sample(_docs(spark, sf_dir), MIX_WEIGHTS_BP, MIX_TOTAL_TOKENS)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------


@register(
    "knn_bruteforce",
    f"""WITH {_EMB_NORM_CTE},
    q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
          FROM vecs WHERE vec_id % {KNN_QUERY_MOD} = 0),
    scored AS (
        SELECT query_id, c.vec_id AS neighbor_id,
               {_DOT.format(a="qemb", b="c.emb")} / (qnrm * c.nrm) AS cos
        FROM vecs c, q WHERE c.vec_id <> query_id),
    ranked AS (
        SELECT query_id, neighbor_id, cos,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id) AS rank
        FROM scored)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(floor(cos * {S.COS_SCALE}) AS BIGINT) AS cos_bp
    FROM ranked WHERE rank <= {KNN_K}""",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for the evaluation query subset."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_bruteforce(embs, queries, k=KNN_K)


_SQ8_CODES_CTE = f"""q8 AS (
    SELECT vec_id,
           CASE WHEN amax > 0
                THEN list_transform(emb,
                     x -> CAST(floor(x * ({float(E.QMAX)!r} / amax) + 0.5) AS BIGINT))
                ELSE list_transform(emb, x -> CAST(0 AS BIGINT)) END AS q
    FROM (SELECT vec_id, emb,
                 list_reduce(list_prepend(0.0,
                     list_transform(emb, x -> abs(x))),
                     (a, b) -> greatest(a, b)) AS amax
          FROM base))"""

_SQ8_DOT = (
    "list_reduce(list_prepend(CAST(0 AS BIGINT), "
    "list_transform(list_zip({a}, {b}), p -> p[1] * p[2])), (a, b) -> a + b)"
)


@register(
    "knn_sq8",
    f"""WITH base AS (
        SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        FROM embeddings),
    {_SQ8_CODES_CTE},
    n8 AS (SELECT vec_id, q, nrm
           FROM (SELECT vec_id, q,
                        sqrt(CAST({_SQ8_DOT.format(a="q", b="q")} AS DOUBLE))
                            AS nrm
                 FROM q8)
           WHERE nrm > 0),
    qv AS (SELECT vec_id AS query_id, q AS qq, nrm AS qnrm
           FROM n8 WHERE vec_id % {KNN_QUERY_MOD} = 0),
    scored AS (SELECT query_id, c.vec_id AS neighbor_id,
                      CAST({_SQ8_DOT.format(a="qq", b="c.q")} AS DOUBLE)
                          / (qnrm * c.nrm) AS cos
               FROM n8 c, qv WHERE c.vec_id <> query_id),
    ranked AS (SELECT query_id, neighbor_id, cos,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY cos DESC, neighbor_id)
                          AS rank
               FROM scored)
    SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
           CAST(floor(cos * {S.COS_SCALE}) AS BIGINT) AS cos_bp
    FROM ranked WHERE rank <= {KNN_K}""",
    extra=True,
)
def knn_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k over SQ8-quantized codes
    (operators/similarity.py::knn_sq8): the memory-bound production
    search over the quantize_int8 store — per-vector scales cancel in
    cosine, so scoring is exact integer dot products and the whole
    ranking hash-matches the DuckDB oracle (which requantizes
    identically). Rank fidelity vs the float-exact top-k is gated in
    tests/test_docs_pipeline.py."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_sq8(embs, queries, k=KNN_K)


@register("knn_ivf", extra=True)  # approximate by design; see knn_ann_eval
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (k-means coarse quantizer + probe re-rank), the
    data-adaptive scale path; recall vs brute force asserted in
    tests/test_docs_pipeline.py."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_ivf(embs, queries, k=KNN_K)


#: sf_dir -> persisted ANN index path for this process (mirrors the text
#: index memo: training runs once per corpus, queries amortize it)
_ANN_INDEX_BUILT: dict[str, str] = {}


def _ann_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    path = _ANN_INDEX_BUILT.get(sf_dir)
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix="spark_graft_ann_index_"), "idx"
        )
        S.build_ann_index(_embs(spark, sf_dir), path)
        _ANN_INDEX_BUILT[sf_dir] = path
    return path


@register("knn_ivf_indexed", extra=True)  # rows-only like knn_ivf: the
# claim is path-independence — byte-equality with the per-call-trained
# knn_ivf is pinned in tests/test_docs_pipeline.py, and knn_ivf's own
# recall gates transfer unchanged.
def knn_ivf_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_ivf served from the persisted vector index
    (operators/similarity.py::build_ann_index): k-means training runs
    once at build (the per-call cost the round-8 fixed-|Q| ladder showed
    dominating) and the probe read prunes to the batch's probe-cell
    partitions — the vector-side twin of bm25_search_indexed."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_ivf_indexed(
        spark, _ann_index_path(spark, sf_dir), queries, k=KNN_K
    )


@register("knn_sq8_indexed", extra=True)  # approximate by design (IVF
# probes bound cell recall; rerank bounds quantization rank noise) — the
# recall-vs-exact evidence is knn_sq8_indexed_eval below, floor-gated in
# tests/test_docs_pipeline.py.
def knn_sq8_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 × IVF composition (operators/similarity.py::knn_sq8_indexed)
    — the actual 100 TB posture for quantized search: integer-scored
    codes read ONLY from the probe-union cells' dictionary-encoded
    ``codes/`` sidecar (probe-pruned AND ~8× fewer bytes than doubles),
    then an exact double-precision re-rank of the top-R from the
    id-pushdown-pruned ``cells/`` rows. Replaces round 8's full-corpus
    ``knn_sq8`` scan as the production path; the full scan stays
    registered as the oracle-hashed scoring ground truth."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_sq8_indexed(
        spark, _ann_index_path(spark, sf_dir), queries, k=KNN_K
    )


@register("knn_ann_auto", extra=True)  # approximate by design, like its
# two endpoints; rows-only with the same recall evidence
# (knn_sq8_indexed_eval / knn_ann_eval cover both routed plans)
def knn_ann_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-routed ANN (operators/similarity.py::knn_ann_auto, round 10):
    routes the batch to the SQ8-composed plan or plain IVF by candidate
    pairs vs probe-union rows, priced from the index manifest's per-cell
    row ledger — the ``bm25_search_auto`` pattern for vectors. Route
    choices per regime are pinned in tests/test_docs_pipeline.py and the
    sq8 ladder shows the auto route matching the measured-cheaper
    endpoint at both batch regimes (SCALING.md round 10)."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_ann_auto(
        spark, _ann_index_path(spark, sf_dir), queries, k=KNN_K
    )


@register("knn_sq8_indexed_eval", extra=True)  # rows-only info row, the
# knn_ann_eval pattern: the recall number IS the evidence.
def knn_sq8_indexed_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the SQ8×IVF composition against the exact
    (oracle-hashed) brute force: one deterministic row
    ``(n_queries, n_hits, recall_bp)`` — approx∩exact via a broadcast
    semi-join on (query, neighbor), integer counts only. Bounds BOTH
    approximation sources at once (probe cell recall and SQ8 rank noise
    surviving the exact re-rank); floor pinned in
    tests/test_docs_pipeline.py."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    from .functions import eager_cache

    exact = eager_cache(
        S.knn_bruteforce(embs, queries, k=KNN_K).select(
            "query_id", "neighbor_id"
        )
    )
    try:
        approx = S.knn_sq8_indexed(
            spark, _ann_index_path(spark, sf_dir), queries, k=KNN_K
        ).select("query_id", "neighbor_id")
        hits = approx.join(
            F.broadcast(exact), ["query_id", "neighbor_id"], "left_semi"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        nq = exact.select("query_id").distinct().agg(
            F.count(F.lit(1)).cast("long").alias("n_queries")
        )
        nx = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        result = (
            hits.crossJoin(F.broadcast(nq))
            .crossJoin(F.broadcast(nx))
            .select(
                "n_queries",
                "n_hits",
                F.floor(F.col("n_hits") * 10000 / F.col("n_exact"))
                .cast("long")
                .alias("recall_bp"),
            )
        )
        rows = result.collect()  # 1 row, while the cache is alive
    finally:
        exact.unpersist()
    return spark.createDataFrame(rows, result.schema)


@register("knn_lsh", extra=True)  # approximate by design; see knn_ann_eval
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate top-k (the 100 TB path); recall vs brute
    force is asserted in tests/test_docs_pipeline.py."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_lsh(embs, queries, k=KNN_K)


@register("knn_ivfpq", extra=True)  # approximate by design; recall
# published in knn_pq_eval and floor-gated in tests/test_docs_pipeline.py
def knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with exact refine (round 11, similarity.knn_ivfpq — the
    FAISS IVFx,PQy+refine shape): coarse cells prune, 4-byte PQ codes
    ADC-rank the probed candidates, only the top-``refine`` pairs per
    query touch full-precision vectors. Knobs sized for the
    near-orthogonal testdata worst case (probe 12/16 cells, refine 200
    → measured recall 0.94 at sf0.01); the clustered-corpus regime the
    tier exists for runs 4/64 probes + refine 96 at measured recall 1.0
    (knn_pq_eval)."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_ivfpq(
        embs, queries, k=KNN_K, n_cells=16, n_probe=12, refine=200
    )


# -- filtered (predicate-scoped) vector search (round 12b) ------------------
# The production retrieval pattern every vector store needs: top-k among
# the rows a metadata predicate admits (one tenant / language / label).
# Exact semantics are fully SQL-expressible, so the scoped search gets the
# HASH oracle; the escalated-probe ANN arm is approximate by design and
# carries a recall gate in tests/test_docs_pipeline.py.

_KNN_FILTERED_SQL = f"""WITH base AS (
    SELECT vec_id, label,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings),
vecs AS (
    SELECT vec_id, label, emb,
           sqrt({_fold_sum("list_transform(emb, x -> x * x)")}) AS nrm
    FROM base),
q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
      FROM vecs WHERE vec_id % {KNN_QUERY_MOD} = 0),
scored AS (
    SELECT query_id, c.vec_id AS neighbor_id,
           {_DOT.format(a="qemb", b="c.emb")} / (qnrm * c.nrm) AS cos
    FROM vecs c, q
    WHERE c.vec_id <> query_id AND c.label IN (0, 1, 2)),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       CAST(floor(cos * {S.COS_SCALE}) AS BIGINT) AS cos_bp
FROM ranked WHERE rank <= {KNN_K}"""


@register("knn_filtered", _KNN_FILTERED_SQL, extra=True)
def knn_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact filtered kNN — top-k cosine among the vectors ``label IN
    (0,1,2)`` admits (~30% of the corpus), queries unrestricted. The
    ground truth the scoped-retrieval family hash-matches; pre-filter
    semantics (the top-k is taken over eligible rows, never a post-hoc
    subset of an unfiltered top-k)."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_bruteforce(
        embs.where(F.col("label").isin(0, 1, 2)), queries, k=KNN_K
    )


@register("knn_filtered_auto", _KNN_FILTERED_SQL)  # driver-gate slot
# (round 13, VERDICT r12 #1): hash-oracled end-to-end through the
# persisted index, the selectivity router, AND the tombstone filter —
# the strongest driver-checkable row in the filtered-search family.
def knn_filtered_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Selectivity-routed filtered search over the PERSISTED index
    (similarity.knn_filtered_auto, round 12b): one count job prices the
    escalated-probe IVF plan against the exact filtered brute force
    (``choose_filtered_route`` — scan-rows cost model, pure function,
    pinned in tests). At this filter's ~30% selectivity the escalation
    hits the probe cap and the route crosses to the brute arm, which is
    EXACT — so this row hash-matches the same SQL as ``knn_filtered``
    THROUGH the index read, the tombstone filter, and the router."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    allowed = embs.where(F.col("label").isin(0, 1, 2)).select("vec_id")
    return S.knn_filtered_auto(
        spark, _ann_index_path(spark, sf_dir), queries, allowed, k=KNN_K
    )


_KNN_FILTERED_LANG_SQL = f"""WITH base AS (
    SELECT vec_id,
           list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
    FROM embeddings),
vecs AS (
    SELECT vec_id, emb,
           sqrt({_fold_sum("list_transform(emb, x -> x * x)")}) AS nrm
    FROM base),
q AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
      FROM vecs WHERE vec_id % {KNN_QUERY_MOD} = 0),
allowed AS (SELECT doc_id FROM documents WHERE lang = 'en'),
scored AS (
    SELECT query_id, c.vec_id AS neighbor_id,
           {_DOT.format(a="qemb", b="c.emb")} / (qnrm * c.nrm) AS cos
    FROM vecs c JOIN allowed a ON a.doc_id = c.vec_id, q
    WHERE c.vec_id <> query_id),
ranked AS (
    SELECT query_id, neighbor_id, cos,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cos DESC, neighbor_id) AS rank
    FROM scored)
SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
       CAST(floor(cos * {S.COS_SCALE}) AS BIGINT) AS cos_bp
FROM ranked WHERE rank <= {KNN_K}"""


@register("knn_filtered_lang", _KNN_FILTERED_LANG_SQL, extra=True)
def knn_filtered_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-TABLE filter predicate: the allowed-id set comes from a
    DIFFERENT table than the vectors (``documents.lang = 'en'`` scoping
    the embeddings index) — the decoupling the allowed-frame design
    buys: any predicate over any table that yields ids, no payload
    columns baked into the index layout. ~44% selectivity escalates to
    the probe cap on this 16-cell index, so the route is the exact
    brute arm and the row hash-matches the joined SQL through the index
    read and the router."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    allowed = (
        _docs(spark, sf_dir)
        .where(F.col("lang") == "en")
        .select(F.col("doc_id").alias("vec_id"))
    )
    return S.knn_filtered_auto(
        spark, _ann_index_path(spark, sf_dir), queries, allowed, k=KNN_K
    )


@register("knn_ivf_filtered", extra=True)  # approximate by design (the
# ivf arm keeps IVF probe-recall semantics); equality-at-full-probes and
# the recall floor are pinned in tests/test_docs_pipeline.py.
def knn_ivf_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ivf ARM of the same router, forced at the broad filter's
    escalated probe budget (``label <> 0``, ~90% selectivity → ⌈12/0.9⌉
    = 14 probes): candidates are semi-joined against the allowed ids
    BEFORE scoring (pre-filter inside the probed cells), preserving a
    full top-k. Forced rather than auto because on this TOY index
    (16 cells) the route model correctly prices 14-of-16 probing as not
    worth the probe pass and sends even broad filters to brute — the
    arm exists for the many-celled production regime
    (choose_filtered_route's 1024-cell pin in tests), and this row keeps
    its recall behavior driver-visible at sf0.01."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    allowed = embs.where(F.col("label") != 0).select("vec_id")
    return S.knn_ivf_indexed(
        spark,
        _ann_index_path(spark, sf_dir),
        queries,
        k=KNN_K,
        n_probe=14,
        allowed=allowed,
    )


#: separate from _ANN_INDEX_BUILT on purpose: upgrading the SHARED index
#: with a pq sidecar would let knn_ann_auto's route flip to the pq tier
#: depending on which extras row ran first — registry-order-dependent
#: results, exactly what the frozen-registry discipline forbids.
_ANN_PQ_INDEX_BUILT: dict[str, str] = {}


def _ann_pq_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    path = _ANN_PQ_INDEX_BUILT.get(sf_dir)
    if path is None:
        path = os.path.join(
            tempfile.mkdtemp(prefix="spark_graft_ann_pq_index_"), "idx"
        )
        S.build_ann_index(_embs(spark, sf_dir), path, pq=True)
        _ANN_PQ_INDEX_BUILT[sf_dir] = path
    return path


@register("knn_pq_indexed", extra=True)  # returned to extras (round 13):
# the r12 promotion put an oracle-less row in the 50-slot hard gate,
# which records err:"no_oracle" instead of a check — a wasted slot.
# The evidence lives where it always did: byte-equality with the
# per-call knn_ivfpq at the stored quantizers (tests/test_ann_pq_index.py)
# plus knn_pq_eval's clustered recall floor.
def knn_pq_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ served from the persisted index's ``pq/`` sidecar (round 11,
    similarity.knn_pq_indexed): ADC candidate generation reads ~m
    dict-encoded bytes per probed vector — the tier below SQ8 on the
    memory ladder — and the shared exact-refine tail restores fine
    ranking from ``cells/``. refine=None dogfoods the round-12
    per-corpus calibration: the serving rerank is the manifest's
    floor-holding quantile (``_pq_auto_refine``), so this driver row
    exercises the recall-guarded path end to end — on this
    near-orthogonal corpus the calibration marks ``breach`` (the router
    would not default here) but the calibrated rerank still holds ≥0.9
    of exact-within-probes (pinned in test_pq_calibration_recall_guard)."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_pq_indexed(
        spark,
        _ann_pq_index_path(spark, sf_dir),
        queries,
        k=KNN_K,
        n_probe=12,
    )


@register("knn_pq_eval", extra=True)  # rows-only info row, the
# knn_ann_eval pattern: the recall numbers ARE the evidence.
def knn_pq_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the PQ family against exact brute force on the
    CLUSTERED eval corpus (the realistic regime): ``pq_adc`` is the raw
    asymmetric-distance ranking over 4-byte codes — deliberately coarse
    (within a tight cluster all points share a code, so fine ranking is
    beyond the quantized model; it is the candidate/compression tier),
    and ``ivfpq_refine`` is the production composition whose exact
    refine pass restores the ranking. Payload accounting rides along:
    m sub-byte codes ≈ m bytes/vector scanned vs 8·dim for the double
    baseline. Independent of sf_dir by design (fixed synthetic eval
    set)."""
    from .operators.evalcorpus import clustered_embeddings

    embs = clustered_embeddings(spark)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    cb = S.pq_train(embs)
    exact = S.knn_bruteforce(embs, queries, k=KNN_K).select(
        "query_id", "neighbor_id"
    )
    exact.persist()
    try:
        n_exact = exact.count()
        methods = {
            "pq_adc": S.knn_pq(embs, queries, k=KNN_K, codebooks=cb),
            "ivfpq_refine": S.knn_ivfpq(
                embs,
                queries,
                k=KNN_K,
                codebooks=cb,
                n_cells=64,
                n_probe=4,
                refine=96,
            ),
        }
        rows = []
        for method, df in methods.items():
            hits = (
                df.select("query_id", "neighbor_id")
                .join(
                    F.broadcast(exact),
                    ["query_id", "neighbor_id"],
                    "left_semi",
                )
                .count()
            )
            rows.append(
                (
                    method,
                    int(hits * 10000 // n_exact),
                    S.PQ_M,  # ≈ bytes/vector scanned (one sub-byte code
                    # per subspace; stored array<int> here, nibble-packed
                    # in a byte layout)
                    8 * S.EMB_DIM,  # double-precision baseline bytes
                )
            )
    finally:
        exact.unpersist()
    return spark.createDataFrame(
        rows,
        "method string, recall_bp long, payload_bytes long, exact_bytes long",
    )


#: memoized PQ index over the CLUSTERED eval corpus — the admission-regime
#: geometry (16 cells: fat enough that probe scanning dominates and the
#: route model prices the pq shortlist as the winner at 8 probes)
_PQ_ADMIT_INDEX: dict[str, str] = {}


def _pq_admit_index_path(spark: SparkSession) -> str:
    import os
    import tempfile

    path = _PQ_ADMIT_INDEX.get("idx")
    if path is None:
        from .operators.evalcorpus import clustered_embeddings

        path = os.path.join(
            tempfile.mkdtemp(prefix="spark_graft_pq_admit_"), "idx"
        )
        S.build_ann_index(
            clustered_embeddings(spark), path, n_cells=16, iters=3, pq=True
        )
        _PQ_ADMIT_INDEX["idx"] = path
    return path


@register("knn_pq_admitted", extra=True)  # rows-only info row (the
# corpus is generated, not a parquet table, so no DuckDB oracle); the
# row carries its own checks: router_picked must be 'pq', the auto
# route must byte-equal the explicit pq serving path, and the
# calibrated-rerank shortlist must hold the floor vs the exact arm.
# Floors pinned in tests/test_docs_pipeline.py.
def knn_pq_admitted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r12 stretch #8: the calibration-ADMITTED pq route, end-to-end on
    a corpus where it wins. The near-orthogonal testdata correctly marks
    ``breach`` (no driver row ever saw the router choose pq); here the
    CLUSTERED eval corpus calibrates breach=False and the 16-cell/8-probe
    regime prices the ADC shortlist under both double tiers, so
    ``knn_ann_auto`` picks pq under the default guard. One output row:
    the recorded route, byte-equality of the auto route against the
    explicit ``knn_pq_indexed`` serving path at the SAME calibrated
    rerank (``_pq_auto_refine`` both sides), and recall of that
    calibrated shortlist vs the exact arm (``knn_ivf_indexed`` at the
    same probes — exact-within-probes ground truth). Independent of
    ``sf_dir`` by design (fixed synthetic eval set)."""
    from .operators.evalcorpus import clustered_embeddings

    embs = clustered_embeddings(spark)
    queries = embs.where(F.col("vec_id") % 10 == 0)
    path = _pq_admit_index_path(spark)
    route, _stats, _plan = S.choose_ann_route(
        spark, path, queries, k=KNN_K, n_probe=8, with_plan=True
    )
    auto = S.knn_ann_auto(spark, path, queries, k=KNN_K, n_probe=8)
    explicit = S.knn_pq_indexed(spark, path, queries, k=KNN_K, n_probe=8)
    cols = ["query_id", "neighbor_id", "rank", "cos_bp"]
    a = {tuple(r) for r in auto.select(*cols).collect()}
    e = {tuple(r) for r in explicit.select(*cols).collect()}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.knn_ivf_indexed(
            spark, path, queries, k=KNN_K, n_probe=8
        ).collect()
    }
    hits = sum(1 for (q, n, _r, _c) in a if (q, n) in exact)
    return spark.createDataFrame(
        [
            (
                route,
                a == e,
                int(hits * 10000 // max(len(exact), 1)),
                int(queries.count()),
            )
        ],
        "router_picked string, auto_equals_pq boolean, "
        "recall_vs_exact_bp long, n_queries long",
    )


@register("knn_ann_eval", extra=True)  # rows-only: ANN is approximate by
# design; the recall-vs-exact numbers ARE the correctness evidence (exact-k
# ground truth is the oracle-checked knn_bruteforce above). Kept OUT of the
# driver's 50 slots — a rows-only row is the weaker check, and the recall
# floor is already pinned in tests/test_docs_pipeline.py; the freed slot
# goes to the oracle-backed embedding_quantize below.
def knn_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of both ANN paths (LSH tables, IVF probe) against the exact
    brute-force top-k, computed fully distributed: approx∩exact via a
    semi-join on (query, neighbor), integer counts only (deterministic —
    every underlying algorithm is RNG-free). One row per method.

    This is the NEAR-ORTHOGONAL regime (the synthetic testdata corpus) —
    LSH/IVF's documented worst case, where the published scanned fraction
    is necessarily high; ``knn_ann_eval_clustered`` below publishes the
    clustered-corpus complement where the indexes must actually prune."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    # ONE candidate frame per method (persisted — it feeds both the re-rank
    # and the scanned-fraction count, and the IVF path runs k-means once,
    # not twice); GLOBAL aggregates always emit exactly one row, so a
    # method whose recall collapses to ZERO hits still publishes a
    # recall_bp=0 row instead of silently vanishing from the artifact.
    cand_by_method = {
        "lsh": S.lsh_candidates(embs, queries).persist(),
        "ivf": S.ivf_candidates(embs, queries).persist(),
    }
    return _ann_eval_frame(spark, embs, queries, cand_by_method)


def _ann_eval_frame(
    spark: SparkSession,
    embs: DataFrame,
    queries: DataFrame,
    cand_by_method: dict[str, DataFrame],
) -> DataFrame:
    """Shared recall/scanned-fraction counting plan for the ANN evals: one
    row per candidate-generation method, everything computed distributed
    and localized (2 tiny rows) before the candidate caches are released."""
    exact_pairs = S.knn_bruteforce(embs, queries, k=KNN_K).select(
        "query_id", "neighbor_id"
    )
    per_method = []
    for method, cand in cand_by_method.items():
        # dedup=True: candidate frames carry one row per colliding
        # (table, probe) — without the post-scoring dedup, duplicate
        # copies of one true neighbor can fill multiple top-k slots and
        # each copy counts as a hit through the semi-join, inflating
        # recall_bp (r10 advisory: could read near-perfect with 1 of k
        # neighbors found)
        hits = (
            S.rerank_topk(cand, KNN_K, dedup=True)
            .select("query_id", "neighbor_id")
            .join(F.broadcast(exact_pairs), ["query_id", "neighbor_id"], "left_semi")
            .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        )
        # cost side of the trade: DISTINCT candidate pairs / (queries ×
        # (corpus−1)), the fraction a brute force would have scored —
        # counted over the 2-column pair projection (narrow dedup; raw
        # rows would over-count each pair once per colliding table/probe,
        # ~8× under the default multi-probe setup). Near-orthogonal
        # synthetic data forces this high (see similarity.knn_lsh
        # docstring); published so recall can never silently be bought
        # with a hidden full scan.
        n_cand = (
            cand.select("query_id", "neighbor_id")
            .dropDuplicates(["query_id", "neighbor_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
        )
        per_method.append(
            hits.crossJoin(n_cand).select(
                F.lit(method).alias("method"), "n_hits", "n_candidates"
            )
        )
    nq = queries.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nc = embs.agg(F.count(F.lit(1)).cast("long").alias("n_corpus"))
    result = (
        per_method[0]
        .unionByName(per_method[1])
        .crossJoin(F.broadcast(nq))  # 2×1 rows — the scalars stay in-plan
        .crossJoin(F.broadcast(nc))
        .select(
            "method",
            "n_queries",
            "n_hits",
            F.floor(F.col("n_hits") * 10000 / (F.col("n_queries") * KNN_K))
            .cast("long")
            .alias("recall_bp"),
            "n_candidates",
            F.floor(
                F.col("n_candidates")
                * 10000
                / (F.col("n_queries") * (F.col("n_corpus") - 1))
            )
            .cast("long")
            .alias("scanned_bp"),
        )
    )
    # materialize the (tiny, 2-row) eval while the candidate caches are
    # alive, then RELEASE them — returned lazily, the persisted frames
    # would hold executor storage for the rest of the session with nothing
    # left that can unpersist them
    try:
        rows = result.collect()
    finally:
        for cand in cand_by_method.values():
            cand.unpersist()
    return spark.createDataFrame(rows, result.schema)


@register("knn_ann_eval_clustered", extra=True)  # rows-only, like
# knn_ann_eval: the recall/scanned numbers ARE the evidence. This row is
# the one the 100 TB similarity-search claim rests on — on a CLUSTERED
# corpus (the realistic regime) the indexes must demonstrably prune:
# expected scanned_bp ≤ 2000 at recall_bp ≥ 9000, floors pinned in
# tests/test_docs_pipeline.py.
def knn_ann_eval_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k and scanned fraction of both ANN paths on the deterministic
    CLUSTERED corpus (operators/evalcorpus.py: 64 clusters × 64 points,
    intra-cluster cos ≈ 0.90) — the complement to ``knn_ann_eval``'s
    near-orthogonal worst case. Index knobs follow the documented
    clustered-corpus sizing: 0-probe LSH (cluster-mates agree on almost
    every sign bit, so the home bucket suffices), IVF with one cell per
    expected cluster and 4 probes. Independent of ``sf_dir`` by design:
    the corpus is a fixed synthetic eval set, not a scale-out table."""
    from .operators.evalcorpus import clustered_embeddings

    embs = clustered_embeddings(spark)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    cand_by_method = {
        "lsh": S.lsh_candidates(embs, queries, n_flip=0).persist(),
        "ivf": S.ivf_candidates(embs, queries, n_cells=64, n_probe=4).persist(),
    }
    return _ann_eval_frame(spark, embs, queries, cand_by_method)


# The LSH hyperplanes are deterministic (±1 signs from the portable md5
# hash, similarity.PLANES), so the ORACLE can recompute the exact same
# bucketing in SQL — the registered query is the scale path (bucketed
# candidate generation, no crossJoin) and still hash-matches.
_PLANES_SQL = (
    "["
    + ", ".join(
        "[" + ", ".join(f"{float(s):.1f}" for s in plane) + "]" for plane in S.PLANES
    )
    + "]"
)
_PLANE_DOT = _fold_sum("list_transform(list_zip(s, emb), p -> p[1] * p[2])")
_BUCKET_SQL = " + ".join(
    f"CASE WHEN b[table_id * {S.BITS_PER_TABLE} + {j + 1}] THEN {1 << j} ELSE 0 END"
    for j in range(S.BITS_PER_TABLE)
)


@register(
    "embedding_neardup",
    f"""WITH {_EMB_NORM_CTE},
    bits AS (
        SELECT vec_id, emb, nrm,
               list_transform({_PLANES_SQL}, s -> {_PLANE_DOT} > 0) AS b
        FROM vecs),
    tb AS (
        SELECT vec_id, {_BUCKET_SQL} AS bucket, t.table_id
        FROM bits, range({S.N_TABLES}) t(table_id)),
    cand AS (
        SELECT DISTINCT a.vec_id AS va, b.vec_id AS vb
        FROM tb a JOIN tb b
          ON a.table_id = b.table_id AND a.bucket = b.bucket
         AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cos_bp FROM (
        SELECT c.va AS vec_a, c.vb AS vec_b,
               CAST(floor({_DOT.format(a="x.emb", b="y.emb")} / (x.nrm * y.nrm)
                          * {S.COS_SCALE}) AS BIGINT) AS cos_bp
        FROM cand c
        JOIN vecs x ON x.vec_id = c.va
        JOIN vecs y ON y.vec_id = c.vb)
    WHERE cos_bp >= {NEARDUP_COS_BP}""",
)
def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH-bucketed candidate generation
    (the 100 TB path: same-(table,bucket) pairs only, never an all-pairs
    crossJoin) with exact cosine verification on the candidates. The oracle
    mirrors the deterministic hyperplane bucketing, so this hash-matches
    while exercising the scale plan. The exact quadratic variant
    (bucketed=False) remains the containment reference in
    tests/test_docs_pipeline.py."""
    return S.cosine_neardup_pairs(
        _embs(spark, sf_dir), min_cos_bp=NEARDUP_COS_BP, bucketed=True
    )


# --------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas)
# --------------------------------------------------------------------------


#: DuckDB VALUES rows mirroring multimodal.PNG_CLASSES — generated from the
#: SAME module constants/bytes that feed the Spark plan literals, so the
#: oracle predicts the decoded dims/mode arithmetically while the Spark side
#: actually runs the codec (encode → Arrow → decode) on every payload
_PNG_CLASS_VALUES = ",\n              ".join(
    f"({i}, {c['width']}, {c['height']}, '{c['md5']}', {c['n_bytes']}, "
    f"{c['resized_width']}, {c['resized_height']}, '{c['rgb_md5']}')"
    for i, c in enumerate(M.PNG_CLASSES)
)
_PNG_CTE = f"""png AS (
        SELECT * FROM (VALUES
              {_PNG_CLASS_VALUES})
            AS t(cls, width, height, payload_md5, n_bytes, rw, rh, rgb_md5)),
    media AS (
        SELECT d.doc_id, d.text, p.*
        FROM documents d
        LEFT JOIN png p
          ON d.doc_id % {M.SYNTH_IMG_EVERY} = 0
         AND p.cls = (d.doc_id // {M.SYNTH_IMG_EVERY}) % {len(M.PNG_CLASSES)})"""


@register(
    "media_features",
    f"""WITH {_PNG_CTE}
    SELECT doc_id,
           CAST(coalesce(n_bytes, octet_length(encode(text))) AS BIGINT) AS n_bytes,
           coalesce(payload_md5, md5(text)) AS content_md5,
           CAST(width AS BIGINT) AS width,
           CAST(height AS BIGINT) AS height,
           CASE WHEN width IS NOT NULL THEN 'RGB' END AS img_mode
    FROM media""",
)
def media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over a MIXED-modality
    media table: every 5th doc carries a real (deterministic solid-color)
    PNG payload, the rest utf-8 text. The image codec
    (``multimodal.decode_image`` — Pillow or the stdlib IHDR parse) runs on
    every payload; the oracle predicts the decoded width/height/mode from
    the doc_id→class formula, so REAL decodes are driver-gate-visible
    (non-null dims hash-matched), while text rows keep proving the binary
    round-trip via payload md5. Full pixel decodes (all five PNG row
    filters) are additionally proven by ``media_resize`` and the fixture
    tests in tests/test_docs_pipeline.py."""
    return M.media_features(M.synthetic_media_table(_docs(spark, sf_dir)))


@register(
    "media_resize",
    f"""WITH {_PNG_CTE}
    SELECT doc_id,
           CAST(rw AS BIGINT) AS width,
           CAST(rh AS BIGINT) AS height,
           rgb_md5
    FROM media""",
    extra=True,
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thumbnail stage over the mixed media table (mapInPandas resize):
    image payloads are pixel-decoded (Pillow, or the stdlib PNG
    reconstruction) and downsampled to ≤64px; the oracle predicts the
    resized dims and the md5 of the resized RAW RGB — both
    codec-independent (solid-color classes with aspect-exact ratios), unlike
    the encoded thumb bytes, which are deterministic only per backend and
    deliberately NOT surfaced here (``multimodal.codec_backend`` pins the
    backend per job/manifest). Text rows pin the all-null contract."""
    out = M.media_resize(M.synthetic_media_table(_docs(spark, sf_dir)))
    return out.select("doc_id", "width", "height", "rgb_md5")


@register(
    "media_frames",
    f"""WITH fr AS (
        SELECT doc_id, text,
               unnest(range((length(text) + {M.FRAME_CHARS - 1}) // {M.FRAME_CHARS})) AS f
        FROM documents)
    SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
           md5(substr(text, CAST(f * {M.FRAME_CHARS} + 1 AS INT), {M.FRAME_CHARS})) AS frame_md5,
           CAST(octet_length(encode(substr(text, CAST(f * {M.FRAME_CHARS} + 1 AS INT),
                                           {M.FRAME_CHARS}))) AS BIGINT) AS n_frame_bytes
    FROM fr""",
)
def media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: 1 payload row → N fixed-size frame rows via
    mapInPandas (the video-pipeline fan-out shape)."""
    return M.frame_sample(M.media_table(_docs(spark, sf_dir)))


# --------------------------------------------------------------------------
# Corpus hygiene beyond dedup: repetition, decontamination, canonicalization
# (extra registry — driver slots are full; oracle-verified in pytest)
# --------------------------------------------------------------------------

DECON_BENCH_MOD = 25  # doc_id % 25 == 0 plays the held-out benchmark set
DECON_MIN_BP = 500  # report pairs with ≥5% benchmark containment


@register(
    "doc_repetition",
    f"""WITH {_TOKS_CTE},
    bg AS (SELECT doc_id,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(len(toks) - 1),
                                           i -> toks[i + 1] || ' ' || toks[i + 2])
                       ELSE [] END AS bigrams
           FROM toks),
    stats AS (SELECT doc_id, len(bigrams) AS n, len(list_distinct(bigrams)) AS nd
              FROM bg),
    ex AS (SELECT doc_id, unnest(bigrams) AS g FROM bg),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM ex GROUP BY 1, 2),
    top AS (SELECT doc_id, g, c,
                   row_number() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, g ASC) AS rk
            FROM cnt)
    SELECT s.doc_id,
           CAST(s.n AS BIGINT) AS n_bigrams,
           CAST(CASE WHEN s.n > 0 THEN floor((s.n - s.nd) * 10000 / s.n)
                     ELSE 0 END AS BIGINT) AS dup_bigram_frac_bp,
           coalesce(t.g, '') AS top_bigram,
           CAST(coalesce(t.c, 0) AS BIGINT) AS top_bigram_count,
           CAST(CASE WHEN s.n > 0 THEN floor(t.c * 10000 / s.n)
                     ELSE 0 END AS BIGINT) AS top_bigram_frac_bp
    FROM stats s LEFT JOIN top t ON t.doc_id = s.doc_id AND t.rk = 1""",
    extra=True,
)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics (dup-bigram fraction, top-bigram
    share), computed map-side with a sorted-runs fold — no shuffle."""
    return T.repetition_profile(_docs(spark, sf_dir))


@register(
    "decontaminate_overlap",
    f"""WITH {_NGRAMS_CTE},
    tr AS (SELECT doc_id AS train_id, unnest(gh) AS g FROM ngr
           WHERE doc_id % {DECON_BENCH_MOD} <> 0),
    be AS (SELECT doc_id AS bench_id, gh FROM ngr
           WHERE doc_id % {DECON_BENCH_MOD} = 0),
    binv AS (SELECT bench_id, unnest(gh) AS g FROM be),
    ov AS (SELECT train_id, bench_id, count(*) AS overlap
           FROM tr JOIN binv USING (g) GROUP BY 1, 2)
    SELECT train_id, bench_id, CAST(overlap AS BIGINT) AS overlap,
           CAST(floor(overlap * 10000 / len(be.gh)) AS BIGINT) AS containment_bp
    FROM ov JOIN be USING (bench_id)
    WHERE floor(overlap * 10000 / len(be.gh)) >= {DECON_MIN_BP}""",
    extra=True,
)
def decontaminate_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: training docs whose shingle overlap
    contains ≥5% of a benchmark doc. Benchmark side broadcast; the corpus
    side never shuffles its shingles."""
    docs = _docs(spark, sf_dir)
    bench = docs.where(F.col("doc_id") % DECON_BENCH_MOD == 0)
    train = docs.where(F.col("doc_id") % DECON_BENCH_MOD != 0)
    return D.decontamination_overlap(train, bench, min_containment_bp=DECON_MIN_BP)


@register(
    "dedup_canonical_best",
    f"""WITH RECURSIVE {_MINHASH_PAIRS_CTES},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs),
    reach(node, lbl) AS (
        SELECT src, src FROM edges
        UNION
        SELECT e.dst, r.lbl FROM reach r JOIN edges e ON e.src = r.node),
    lab AS (SELECT node AS doc_id, min(lbl) AS cluster_id
            FROM reach GROUP BY node),
    tl AS (SELECT doc_id, len(toks) AS n_tokens FROM toks),
    ranked AS (
        SELECT l.cluster_id, l.doc_id, tl.n_tokens,
               count(*) OVER (PARTITION BY l.cluster_id) AS cluster_size,
               row_number() OVER (PARTITION BY l.cluster_id
                                  ORDER BY tl.n_tokens DESC, l.doc_id ASC) AS rk
        FROM lab l JOIN tl ON tl.doc_id = l.doc_id)
    SELECT cluster_id, doc_id AS canonical_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE rk = 1""",
    extra=True,
)
def dedup_canonical_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-doc selection per near-dup cluster: keep the longest copy
    (ties → smallest id) — connected components ∘ token length."""
    docs = _docs(spark, sf_dir)
    clusters = D.duplicate_clusters(D.minhash_lsh_pairs(docs))
    return D.canonical_per_cluster(clusters, docs)


@register(
    "pack_sequences",
    f"""WITH {_TOKS_CTE},
    base AS (SELECT doc_id,
                    {h60_sql("'pack:' || CAST(doc_id AS VARCHAR)")} AS h,
                    CAST(len(toks) AS BIGINT) AS n_tokens
             FROM toks),
    lanes AS (SELECT doc_id, h, CAST(h % {T.PACK_BUCKETS} AS INT) AS bucket, n_tokens
              FROM base),
    packed AS (SELECT doc_id, bucket, n_tokens,
                      sum(n_tokens) OVER (PARTITION BY bucket
                                          ORDER BY h ASC, doc_id ASC
                                          ROWS UNBOUNDED PRECEDING) AS cum
               FROM lanes)
    SELECT doc_id, bucket,
           CAST((cum - n_tokens) // {T.PACK_BUDGET} AS BIGINT) AS pack_id,
           CAST((cum - n_tokens) % {T.PACK_BUDGET} AS BIGINT) AS offset,
           n_tokens,
           CAST(CASE WHEN n_tokens > 0
                     THEN (cum - 1) // {T.PACK_BUDGET}
                          - (cum - n_tokens) // {T.PACK_BUDGET}
                     ELSE 0 END AS BIGINT) AS n_splits
    FROM packed""",
    extra=True,
)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic sequence packing into fixed-token-budget training
    examples: salted-hash lane deal + per-lane running total — no global
    sort, lanes pack independently."""
    return T.sequence_packing(_docs(spark, sf_dir))


_QUAL_GATE = f"""(n_tok >= 5 AND n_tok <= 100000
        AND (CASE WHEN n_tok > 0 THEN floor(stop * 10000 / n_tok) ELSE 0 END)
            BETWEEN 100 AND 6000
        AND (CASE WHEN n_chars > 0 THEN floor(punct * 10000 / n_chars) ELSE 0 END)
            < 2000)"""


@register(
    "curation_verdict",
    f"""WITH {_TOKS_CTE},
    q AS (SELECT doc_id, len(toks) AS n_tok,
                 len(list_filter(toks, t -> t IN ({_in_list(T.STOPWORDS["en"])}))) AS stop,
                 len(regexp_extract_all(text, '{T.PUNCT_RE}')) AS punct,
                 length(text) AS n_chars
          FROM toks),
    bg AS (SELECT doc_id,
                  CASE WHEN len(toks) >= 2
                       THEN list_transform(range(len(toks) - 1),
                                           i -> toks[i + 1] || ' ' || toks[i + 2])
                       ELSE [] END AS bigrams
           FROM toks),
    stats AS (SELECT doc_id, len(bigrams) AS n, len(list_distinct(bigrams)) AS nd
              FROM bg),
    cnt AS (SELECT doc_id, g, count(*) AS c
            FROM (SELECT doc_id, unnest(bigrams) AS g FROM bg) GROUP BY 1, 2),
    topc AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY doc_id),
    rep AS (SELECT s.doc_id,
                   CASE WHEN s.n > 0 THEN floor((s.n - s.nd) * 10000 / s.n)
                        ELSE 0 END AS dup_bp,
                   CASE WHEN s.n > 0 THEN floor(t.topc * 10000 / s.n)
                        ELSE 0 END AS top_bp
            FROM stats s LEFT JOIN topc t ON t.doc_id = s.doc_id),
    hits AS (SELECT doc_id, {_hits_exprs} FROM toks),
    lng AS (SELECT doc_id, CASE {_pred_chain} END AS lang_pred FROM hits)
    SELECT q.doc_id,
           {_QUAL_GATE} AS keep_quality,
           (rep.dup_bp < {T.MAX_DUP_BIGRAM_BP}
            AND rep.top_bp < {T.MAX_TOP_BIGRAM_BP}) AS keep_repetition,
           (lng.lang_pred = 'en') AS keep_language,
           ({_QUAL_GATE}
            AND rep.dup_bp < {T.MAX_DUP_BIGRAM_BP}
            AND rep.top_bp < {T.MAX_TOP_BIGRAM_BP}
            AND lng.lang_pred = 'en') AS keep
    FROM q
    JOIN rep ON rep.doc_id = q.doc_id
    JOIN lng ON lng.doc_id = q.doc_id""",
    extra=True,
)
def curation_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation policy (quality ∧ repetition ∧ language) as a
    single zero-shuffle scan."""
    return T.curation_verdict(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# PII redaction + boilerplate (operators/scrub.py)
# --------------------------------------------------------------------------

#: deterministic synthetic PII appended to each doc (the corpus itself is
#: PII-free word soup) — makes the redaction provable: the oracle rebuilds
#: the same augmented text, scrubs it with the same patterns, and the md5
#: of the scrubbed text must match byte-for-byte.
_PII_AUG_SQL = """aug AS (
    SELECT doc_id,
           text || ' email u' || CAST(doc_id AS VARCHAR)
                || '@ex' || CAST(doc_id % 7 AS VARCHAR) || '.org'
                || ' call +1' || lpad(CAST((doc_id * 37) % 1000000000 AS VARCHAR), 9, '0')
                || ' from 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.' || CAST((doc_id * 3) % 256 AS VARCHAR)
                || '.' || CAST(doc_id % 254 AS VARCHAR)
                || ' id 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           AS text
    FROM documents)"""

_SCRUB_NESTED = "text"
for _, _pat, _repl in SC.PII_PATTERNS:
    _SCRUB_NESTED = f"regexp_replace({_SCRUB_NESTED}, '{_pat}', '{_repl}', 'g')"
_PII_COUNTS_SQL = ",\n           ".join(
    f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{name}"
    for name, pat, _ in SC.PII_PATTERNS
)
_PII_TOTAL_SQL = " + ".join(f"n_{name}" for name, _, _ in SC.PII_PATTERNS)


def _with_pii(df: DataFrame) -> DataFrame:
    """Spark twin of _PII_AUG_SQL."""
    did = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    aug = F.concat(
        F.col("text"),
        F.lit(" email u"), s(did), F.lit("@ex"), s(did % 7), F.lit(".org"),
        F.lit(" call +1"), F.lpad(s((did * 37) % 1000000000), 9, "0"),
        F.lit(" from 10."), s(did % 256),
        F.lit("."), s((did * 3) % 256),
        F.lit("."), s(did % 254),
        F.lit(" id 123-45-"), F.lpad(s(did % 10000), 4, "0"),
    )
    return df.select("doc_id", aug.alias("text"))


@register(
    "pii_scrub",
    f"""WITH {_PII_AUG_SQL},
    counted AS (
        SELECT doc_id, text,
           {_PII_COUNTS_SQL}
        FROM aug)
    SELECT doc_id, {", ".join(f"n_{name}" for name, _, _ in SC.PII_PATTERNS)},
           CAST({_PII_TOTAL_SQL} AS BIGINT) AS n_redacted,
           md5({_SCRUB_NESTED}) AS clean_md5,
           CAST(length({_SCRUB_NESTED}) AS BIGINT) AS clean_len
    FROM counted""",
    extra=True,
)
def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (emails / E.164 phones / IPv4 / 3-2-4 ids) over
    deterministically PII-augmented docs; md5 of the scrubbed text proves
    byte-identical redaction across engines. Pure scan, no shuffle."""
    return SC.pii_scrub(_with_pii(_docs(spark, sf_dir)))


_BOILER_CTES = f"""{_TOKS_CTE},
    g AS (SELECT doc_id,
                 list_distinct(list_transform(range(len(toks) - {SC.BOILER_N - 1}),
                     i -> array_to_string(list_slice(toks, i + 1, i + {SC.BOILER_N}), ' '))) AS grams
          FROM toks),
    ex AS (SELECT doc_id, unnest(grams) AS ngram FROM g),
    boiler AS (SELECT ngram, CAST(count(*) AS BIGINT) AS n_docs
               FROM ex GROUP BY ngram HAVING count(*) >= {SC.BOILER_MIN_DOCS})"""


@register(
    "boilerplate_ngrams",
    f"WITH {_BOILER_CTES}\n    SELECT ngram, n_docs FROM boiler",
    extra=True,
)
def boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus boilerplate list: word 5-grams (BOILER_N) shared by at least
    BOILER_MIN_DOCS docs (C4-style template/chrome detection)."""
    return SC.boilerplate_ngrams(_docs(spark, sf_dir))


@register(
    "boilerplate_profile",
    f"""WITH {_BOILER_CTES},
    tot AS (SELECT doc_id, CAST(len(grams) AS BIGINT) AS n_grams FROM g),
    hit AS (SELECT e.doc_id, CAST(count(*) AS BIGINT) AS n_boiler
            FROM ex e JOIN boiler b USING (ngram) GROUP BY e.doc_id)
    SELECT t.doc_id, t.n_grams,
           CAST(coalesce(h.n_boiler, 0) AS BIGINT) AS n_boiler,
           CAST(CASE WHEN t.n_grams > 0
                     THEN floor(coalesce(h.n_boiler, 0) * 10000 / t.n_grams)
                     ELSE 0 END AS BIGINT) AS boiler_bp
    FROM tot t LEFT JOIN hit h ON h.doc_id = t.doc_id""",
    extra=True,
)
def boilerplate_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc boilerplate contamination (count + basis points of the doc's
    distinct n-grams that are corpus boilerplate)."""
    return SC.boilerplate_profile(_docs(spark, sf_dir))


# --------------------------------------------------------------------------
# Embedding store ops (operators/embedding.py)
# --------------------------------------------------------------------------

_QUANT_CTES = f"""{_EMB_NORM_CTE},
    m AS (SELECT vec_id, emb,
                 list_reduce(list_prepend(0.0, list_transform(emb, x -> abs(x))),
                             (a, b) -> greatest(a, b)) AS amax
          FROM base),
    sc AS (SELECT vec_id, emb, amax, {float(E.QMAX)} / amax AS scale FROM m),
    qc AS (SELECT vec_id, emb, amax, scale,
                  list_transform(emb, x -> CAST(floor(x * scale + 0.5) AS BIGINT)) AS q
           FROM sc)"""


@register(
    "embedding_quantize",
    f"""WITH {_QUANT_CTES}
    SELECT vec_id,
           CAST(floor(amax * {E.FIX}) AS BIGINT) AS amax_x1e6,
           md5(CASE WHEN amax > 0 THEN array_to_string(q, ',')
                    ELSE array_to_string(list_transform(emb, x -> 0), ',') END)
               AS q_md5,
           CAST(CASE WHEN amax > 0 AND {_fold_sum("list_transform(emb, x -> x * x)")} > 0
                THEN floor({_fold_sum("list_transform(list_zip(emb, q), p -> (p[1] - CAST(p[2] AS DOUBLE) / scale) * (p[1] - CAST(p[2] AS DOUBLE) / scale))")}
                           * 10000 / {_fold_sum("list_transform(emb, x -> x * x)")})
                ELSE 0 END AS BIGINT) AS err_bp,
           CAST(len(emb) AS BIGINT) AS n_dims
    FROM qc""",
)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of the embedding store (per-vector scale,
    code md5, reconstruction error) — pure map, no shuffle."""
    return E.quantize_int8(_embs(spark, sf_dir))


_CENT_CTES = f"""fx AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(floor(CAST(x AS DOUBLE) * {E.FIX}) AS BIGINT)) AS xq
        FROM embeddings),
    exd AS (SELECT label, i AS dim, xq[i + 1] AS v
            FROM fx, range({S.EMB_DIM}) t(i)),
    cent AS (SELECT label, dim, sum(v) AS sum_q, count(*) AS n_vecs
             FROM exd GROUP BY label, dim)"""


@register(
    "label_centroids",
    f"""WITH {_CENT_CTES}
    SELECT label, CAST(dim AS INT) AS dim,
           CAST(sum_q // n_vecs AS BIGINT) AS centroid_q,
           CAST(n_vecs AS BIGINT) AS n_vecs
    FROM cent""",
    extra=True,
)
def label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(label, dim) fixed-point centroid — exact integer sums, so the
    result is identical under any partitioning / summation order."""
    return E.label_centroids(_embs(spark, sf_dir))


@register(
    "centroid_eval",
    f"""WITH {_CENT_CTES},
    ca AS (SELECT label AS cand, dim, sum_q // n_vecs AS cq FROM cent),
    d AS (SELECT f.vec_id, f.label, c.cand,
                 sum((f.xq[c.dim + 1] - c.cq) * (f.xq[c.dim + 1] - c.cq)) AS dist_q
          FROM fx f, ca c GROUP BY 1, 2, 3),
    rk AS (SELECT vec_id, label, cand,
                  row_number() OVER (PARTITION BY vec_id
                                     ORDER BY dist_q ASC, cand ASC) AS rk
           FROM d)
    SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
           CAST(sum(CASE WHEN cand = label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
           CAST(floor(sum(CASE WHEN cand = label THEN 1 ELSE 0 END) * 10000
                      / count(*)) AS BIGINT) AS acc_bp
    FROM rk WHERE rk = 1 GROUP BY label""",
    extra=True,
)
def centroid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-centroid label coherence: per-label accuracy of assigning
    each vector to its closest label centroid (exact fixed-point L2)."""
    return E.centroid_eval(_embs(spark, sf_dir))


@register(
    "balance_sources",
    f"""WITH counts AS (SELECT source, count(*) AS c FROM documents GROUP BY source),
    tgt AS (SELECT min(c) AS target FROM counts),
    ranked AS (SELECT doc_id, source,
                      row_number() OVER (
                          PARTITION BY source
                          ORDER BY {h60_sql("'bal:' || CAST(doc_id AS VARCHAR)")}, doc_id
                      ) AS rk
               FROM documents)
    SELECT doc_id, source, CAST(rk AS INT) AS rk
    FROM ranked, tgt WHERE rk <= target""",
    extra=True,
)
def balance_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uniform domain mixture: cap every source at the smallest source's
    count, members chosen in deterministic salted-hash order. The target is
    computed IN-plan (aggregate → broadcast) — no driver round trip; one
    shuffle on source."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir).select("doc_id", "source")
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("c"))
    target = counts.agg(F.min("c").alias("target"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("bal:"), F.col("doc_id").cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("long")
    w = Window.partitionBy("source").orderBy(h.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rk", F.row_number().over(w).cast("int"))
        .crossJoin(F.broadcast(target))
        .where(F.col("rk") <= F.col("target"))
        .select("doc_id", "source", "rk")
    )


@register(
    "profile_documents",
    """SELECT
          CAST(count(*) AS BIGINT) AS n_rows,
          CAST(count(text) AS BIGINT) AS n_text,
          CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
          CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
          CAST(min(n_chars) AS BIGINT) AS min_chars,
          CAST(max(n_chars) AS BIGINT) AS max_chars,
          CAST(sum(n_chars) AS BIGINT) AS total_chars,
          CAST(sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS BIGINT)
              AS n_chars_mismatch,
          CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_lang
       FROM documents""",
    extra=True,
)
def profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-quality profile of the corpus table: row/non-null
    counts, per-column cardinalities, length extremes/total, and an
    internal-consistency check (does the stored n_chars match the actual
    text length?). The expectations-style validation pass every ingest of
    a 100 TB corpus runs before training — all in ONE partial-aggregated
    scan, no per-column jobs."""
    docs = _docs(spark, sf_dir)
    return docs.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.count("text").cast("long").alias("n_text"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.min("n_chars").cast("long").alias("min_chars"),
        F.max("n_chars").cast("long").alias("max_chars"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.sum(
            F.when(F.col("n_chars") != F.length("text"), 1).otherwise(0)
        ).cast("long").alias("n_chars_mismatch"),
        F.sum(F.when(F.col("lang").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_null_lang"),
    )


@register(
    "frame_dedup",
    f"""WITH fr AS (
        SELECT doc_id, text,
               unnest(range((length(text) + {M.FRAME_CHARS - 1}) // {M.FRAME_CHARS})) AS f
        FROM documents),
    frames AS (
        SELECT doc_id, CAST(f AS BIGINT) AS frame_idx,
               md5(substr(text, CAST(f * {M.FRAME_CHARS} + 1 AS INT), {M.FRAME_CHARS})) AS frame_md5
        FROM fr)
    SELECT frame_md5,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS canonical_doc,
           CAST(min(frame_idx) FILTER (WHERE doc_id = (SELECT min(f2.doc_id)
                                                       FROM frames f2
                                                       WHERE f2.frame_md5 = frames.frame_md5))
                AS BIGINT) AS canonical_idx
    FROM frames
    GROUP BY frame_md5
    HAVING count(*) > 1""",
    extra=True,
)
def frame_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-family composition: the video-shaped frame fan-out
    (multimodal.frame_sample, Arrow mapInPandas) feeding exact dedup — find
    frames repeated across the corpus and pick a canonical (min doc, then
    min index within that doc) per group. The training-data move for
    near-duplicate video/frame corpora: dedup at the FRAME level, not the
    document level, after the modality-specific decode stage."""
    frames = M.frame_sample(M.media_table(_docs(spark, sf_dir)))
    # canonical = lexicographic min of (doc_id, frame_idx): one
    # partial-aggregated struct-min in the SAME groupBy — no window pass
    # over the fan-out table (the largest intermediate in this query)
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.min(F.struct("doc_id", "frame_idx")).alias("_canon"),
        )
        .where(F.col("n_occurrences") > 1)
        .select(
            "frame_md5",
            "n_occurrences",
            "n_docs",
            F.col("_canon.doc_id").cast("long").alias("canonical_doc"),
            F.col("_canon.frame_idx").cast("long").alias("canonical_idx"),
        )
    )


# --------------------------------------------------------------------------
# Full-text search (BM25)
# --------------------------------------------------------------------------

#: the decontamination/debug-style literal query set for the demo corpus
BM25_QUERIES = [
    ("q_join", "table scan join"),
    ("q_stream", "window agg stream batch"),
    ("q_cust", "customer value sort"),
]
BM25_K = 10
MLT_MAX_TERMS = 20  # Lucene MoreLikeThis-style rarest-terms cap


def _bm25_oracle_sql(
    queries: list[tuple[str, str]] | None = None, source: str = "documents"
) -> str:
    """Generated from the SAME constants as the Spark operator (see
    operators/search.py for the 44/20/6/18 integer derivation).
    ``source`` is the corpus relation — the pre-registered ``documents``
    view by default, or an inline VALUES subquery for generated corpora
    (the Zipf row below)."""
    from .operators.search import SCORE_SCALE, _py_tokens

    queries = queries if queries is not None else BM25_QUERIES
    qvals = ", ".join(
        f"('{qid}', '{t}')"
        for qid, qtext in queries
        for t in sorted(set(_py_tokens(qtext)))
    )
    vocab = sorted({t for _, qt in queries for t in _py_tokens(qt)})
    in_list = ", ".join(f"'{t}'" for t in vocab)
    return f"""WITH tk AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{T.TOKEN_RE}') AS toks
        FROM {source}),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM dl),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM ex WHERE term IN ({in_list}) GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    q(query_id, term) AS (VALUES {qvals}),
    scored AS (SELECT q.query_id, tf.doc_id,
                      CAST(2*n_docs - 2*df + 1 AS HUGEINT) * 44 * tf
                          * total_dl AS num,
                      CAST(2*df + 1 AS HUGEINT)
                          * (20 * CAST(total_dl AS HUGEINT) * tf
                             + 6 * total_dl + 18 * CAST(dl AS HUGEINT)
                                 * n_docs) AS den
               FROM tf JOIN q USING (term) JOIN dfreq USING (term)
               CROSS JOIN corpus),
    scores AS (SELECT query_id, doc_id,
                      CAST(SUM((num // den) * {SCORE_SCALE}
                               + ((num % den) * {SCORE_SCALE}) // den)
                           AS BIGINT) AS score_x1e6
               FROM scored GROUP BY query_id, doc_id),
    ranked AS (SELECT query_id, doc_id, score_x1e6,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score_x1e6 DESC, doc_id)
                          AS rank
               FROM scores)
    SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score_x1e6
    FROM ranked WHERE rank <= {BM25_K}"""


@register("bm25_search", _bm25_oracle_sql(), extra=True)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25-lin top-k full-text retrieval (operators/search.py): the sparse
    half of hybrid retrieval and the decontamination lookup primitive —
    exact int64 scoring (transcendental-free idf surrogate) so ranks and
    scores hash-match the DuckDB oracle bit-for-bit."""
    from .operators.search import bm25_search as _search

    return _search(_docs(spark, sf_dir), BM25_QUERIES, k=BM25_K)


#: sf_dir -> materialized index path for this process (the build is the
#: one-corpus-pass cost the indexed search amortizes; rebuilt per process
#: because the temp dir is process-scoped scratch, not a managed table)
_TEXT_INDEX_BUILT: dict[str, str] = {}


def _text_index_path(spark: SparkSession, sf_dir: str) -> str:
    import os
    import tempfile

    path = _TEXT_INDEX_BUILT.get(sf_dir)
    if path is None:
        from .operators.search import build_text_index

        path = os.path.join(
            tempfile.mkdtemp(prefix="spark_graft_text_index_"), "idx"
        )
        build_text_index(_docs(spark, sf_dir), path)
        _TEXT_INDEX_BUILT[sf_dir] = path
    return path


@register("bm25_search_indexed", _bm25_oracle_sql(), extra=True)
def bm25_search_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME ranking as bm25_search served from the persisted inverted
    index (operators/search.py::build_text_index): shard partition pruning
    + in-shard term pushdown replace the per-query corpus scan. Registered
    against the IDENTICAL oracle SQL as the scan-based form — the claim is
    path-independence (exactly the sessionize_events_chunked pattern): two
    physical strategies, one bit-exact answer."""
    from .operators.search import bm25_search_indexed as _search

    return _search(
        spark, _text_index_path(spark, sf_dir), BM25_QUERIES, k=BM25_K
    )


@register("bm25_search_auto", _bm25_oracle_sql())
def bm25_search_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-ROUTED BM25 search (operators/search.py::bm25_search_auto):
    the scan-vs-index crossover measured in SCALING.md made into an
    automatic plan choice — the index's own df sidecar prices the
    postings read against the corpus token count, no caller knob.
    Registered against the IDENTICAL oracle SQL as both endpoints: the
    claim is that routing is purely physical (byte-identical output
    whichever plan the statistics pick); per-regime choices are pinned
    in tests/test_search.py."""
    from .operators.search import bm25_search_auto as _search

    return _search(
        spark,
        _text_index_path(spark, sf_dir),
        _docs(spark, sf_dir),
        BM25_QUERIES,
        k=BM25_K,
    )


# -- Zipf-corpus registered retrieval row (round 9) -----------------------
# The testdata documents table's ~40-term uniform vocabulary is the
# designed ADVERSARIAL regime for retrieval (every term maximally
# common); the representative Zipfian regime was previously ladder-only
# (SCALING.md). This row oracle-pins it: both engines score the
# byte-identical generated corpus (Spark from the rows, DuckDB from an
# embedded VALUES clause), so the hash gate covers the regime real
# corpora live in.

_ZIPF_N_DOCS, _ZIPF_VOCAB, _ZIPF_DOC_LEN = 800, 5000, 30


def _zipf_corpus_rows() -> list[tuple[int, str]]:
    from .operators.evalcorpus import zipf_rows

    rows = getattr(_zipf_corpus_rows, "_memo", None)
    if rows is None:
        rows = zipf_rows(_ZIPF_N_DOCS, _ZIPF_VOCAB, _ZIPF_DOC_LEN)
        _zipf_corpus_rows._memo = rows
    return rows


def _zipf_queries() -> list[tuple[str, str]]:
    """Two deterministic queries over the tail: the six alphabetically-
    first terms with document frequency in [2, 5] — rare enough that the
    rarest-terms/idf machinery matters, common enough that results are
    non-vacuous."""
    from collections import Counter

    dfc = Counter(
        t for _, text in _zipf_corpus_rows() for t in set(text.split())
    )
    rare = sorted(t for t, c in dfc.items() if 2 <= c <= 5)[:6]
    return [("zq1", " ".join(rare[:3])), ("zq2", " ".join(rare[3:6]))]


def _zipf_values_source() -> str:
    vals = ", ".join(
        f"({i}, '{text}')" for i, text in _zipf_corpus_rows()
    )
    return f"(SELECT * FROM (VALUES {vals}) AS z(doc_id, text))"


@register(
    "bm25_search_zipf",
    _bm25_oracle_sql(queries=_zipf_queries(), source=_zipf_values_source()),
    extra=True,
)
def bm25_search_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 search over the deterministic Zipf-vocabulary corpus
    (operators/evalcorpus.py::zipf_rows) — the representative-regime
    twin of the driver-gated bm25_search row, hash-checked end to end
    (the oracle embeds the identical corpus as VALUES)."""
    from .operators.search import bm25_search as _search

    docs = spark.createDataFrame(
        _zipf_corpus_rows(), "doc_id long, text string"
    )
    return _search(docs, _zipf_queries(), k=BM25_K)


_ZIPF_MLT_MOD = 100  # 8 query docs of 800 — the adjudication-batch shape


def _zipf_mlt_oracle_sql() -> str:
    """Standalone MLT oracle over the embedded Zipf corpus — the sparse
    CTE chain of ``_hybrid_oracle_sql`` (same 44/20/6/18 constants,
    HUGEINT-exact) with the generated rows as VALUES, so the rarest-terms
    selection + scoring is hash-checked in the REPRESENTATIVE (Zipfian
    df) regime, not only the adversarial uniform testdata one."""
    from .operators.search import SCORE_SCALE

    return f"""WITH tk AS (
        SELECT doc_id, regexp_extract_all(lower(text), '{T.TOKEN_RE}') AS toks
        FROM {_zipf_values_source()}),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    q0 AS (SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS term
           FROM dl WHERE doc_id % {_ZIPF_MLT_MOD} = 0),
    ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM dl),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM ex WHERE term IN (SELECT DISTINCT term FROM q0)
           GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    q AS (SELECT query_id, term
          FROM (SELECT q0.query_id, q0.term,
                       row_number() OVER (PARTITION BY q0.query_id
                                          ORDER BY dfreq.df, q0.term) AS tr
                FROM q0 JOIN dfreq USING (term))
          WHERE tr <= {MLT_MAX_TERMS}),
    sscored AS (SELECT q.query_id, tf.doc_id,
                       CAST(2*n_docs - 2*df + 1 AS HUGEINT) * 44 * tf
                           * total_dl AS num,
                       CAST(2*df + 1 AS HUGEINT)
                           * (20 * CAST(total_dl AS HUGEINT) * tf
                              + 6 * total_dl + 18 * CAST(dl AS HUGEINT)
                                  * n_docs) AS den
                FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                CROSS JOIN corpus
                WHERE tf.doc_id <> q.query_id),
    ssum AS (SELECT query_id, doc_id,
                    CAST(SUM((num // den) * {SCORE_SCALE}
                             + ((num % den) * {SCORE_SCALE}) // den)
                         AS BIGINT) AS score_x1e6
             FROM sscored GROUP BY query_id, doc_id),
    ranked AS (SELECT query_id, doc_id, score_x1e6,
                      row_number() OVER (PARTITION BY query_id
                                         ORDER BY score_x1e6 DESC, doc_id)
                          AS rank
               FROM ssum)
    SELECT query_id, doc_id, CAST(rank AS INT) AS rank, score_x1e6
    FROM ranked WHERE rank <= {BM25_K}"""


@register("mlt_search_zipf", _zipf_mlt_oracle_sql(), extra=True)
def mlt_search_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """More-like-this over the deterministic Zipf corpus — hash-checked
    end to end: the rarest-``MLT_MAX_TERMS`` selection actually selects
    the tail here (df spans 1..corpus under Zipf), exercising the
    regime the uniform testdata corpus cannot (where every term's df is
    ~N/2 and selection barely discriminates)."""
    from .operators.search import bm25_more_like_this

    docs = spark.createDataFrame(
        _zipf_corpus_rows(), "doc_id long, text string"
    )
    return bm25_more_like_this(
        docs,
        F.col("doc_id") % _ZIPF_MLT_MOD == 0,
        k=BM25_K,
        max_query_terms=MLT_MAX_TERMS,
    )


def _hybrid_oracle_sql() -> str:
    """Sparse (BM25 more-like-this) + dense (exact cosine kNN) candidate
    generation fused by exact-integer RRF — every stage reuses the SAME
    constants/CTE fragments as its standalone oracle."""
    from .operators.search import RRF_C, SCORE_SCALE

    dot = _DOT.format(a="qemb", b="c.emb")
    return f"""WITH {_EMB_NORM_CTE},
    qv AS (SELECT vec_id AS query_id, emb AS qemb, nrm AS qnrm
           FROM vecs WHERE vec_id % {KNN_QUERY_MOD} = 0),
    dscored AS (SELECT query_id, c.vec_id AS doc_id,
                       {dot} / (qnrm * c.nrm) AS cos
                FROM vecs c, qv WHERE c.vec_id <> query_id),
    dranked AS (SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY cos DESC, doc_id) AS rank
                FROM dscored),
    tk AS (SELECT doc_id, regexp_extract_all(lower(text), '{T.TOKEN_RE}') AS toks
           FROM documents),
    dl AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
    corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                      CAST(SUM(dl) AS BIGINT) AS total_dl FROM dl),
    q0 AS (SELECT doc_id AS query_id, unnest(list_distinct(toks)) AS term
           FROM dl WHERE doc_id % {KNN_QUERY_MOD} = 0),
    ex AS (SELECT doc_id, dl, unnest(toks) AS term FROM dl),
    tf AS (SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
           FROM ex WHERE term IN (SELECT DISTINCT term FROM q0)
           GROUP BY doc_id, dl, term),
    dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    q AS (SELECT query_id, term
          FROM (SELECT q0.query_id, q0.term,
                       row_number() OVER (PARTITION BY q0.query_id
                                          ORDER BY dfreq.df, q0.term) AS tr
                FROM q0 JOIN dfreq USING (term))
          WHERE tr <= {MLT_MAX_TERMS}),
    sscored AS (SELECT q.query_id, tf.doc_id,
                       CAST(2*n_docs - 2*df + 1 AS HUGEINT) * 44 * tf
                           * total_dl AS num,
                       CAST(2*df + 1 AS HUGEINT)
                           * (20 * CAST(total_dl AS HUGEINT) * tf
                              + 6 * total_dl + 18 * CAST(dl AS HUGEINT)
                                  * n_docs) AS den
                FROM tf JOIN q USING (term) JOIN dfreq USING (term)
                CROSS JOIN corpus
                WHERE tf.doc_id <> q.query_id),
    ssum AS (SELECT query_id, doc_id,
                    CAST(SUM((num // den) * {SCORE_SCALE}
                             + ((num % den) * {SCORE_SCALE}) // den)
                         AS BIGINT) AS score
             FROM sscored GROUP BY query_id, doc_id),
    sranked AS (SELECT query_id, doc_id,
                       row_number() OVER (PARTITION BY query_id
                                          ORDER BY score DESC, doc_id) AS rank
                FROM ssum),
    rrf AS (SELECT query_id, doc_id, {SCORE_SCALE} // ({RRF_C} + rank) AS c
            FROM sranked WHERE rank <= {KNN_K}
            UNION ALL
            SELECT query_id, doc_id, {SCORE_SCALE} // ({RRF_C} + rank) AS c
            FROM dranked WHERE rank <= {KNN_K}),
    fused AS (SELECT query_id, doc_id, CAST(SUM(c) AS BIGINT) AS rrf_x1e6
              FROM rrf GROUP BY query_id, doc_id),
    final AS (SELECT query_id, doc_id, rrf_x1e6,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY rrf_x1e6 DESC, doc_id) AS rank
              FROM fused)
    SELECT query_id, doc_id, CAST(rank AS INT) AS rank, rrf_x1e6
    FROM final WHERE rank <= {KNN_K}"""


def _mlt_sparse_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid stack's shared sparse side: BM25-lin more-like-this over
    each query doc's rarest terms (operators/search.py)."""
    from .operators import search as SE

    return SE.bm25_more_like_this(
        _docs(spark, sf_dir),
        F.col("doc_id") % KNN_QUERY_MOD == 0,
        k=KNN_K,
        max_query_terms=MLT_MAX_TERMS,
    ).select("query_id", "doc_id", "rank")


def _dense_ranks_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine ranks — O(|Q|·N·dim) dense scoring; the
    hash-matchable form (and the ANN variant's ground truth), NOT the
    scale path: with |Q| ∝ corpus (vec_id % KNN_QUERY_MOD) it is
    deliberately super-linear (measured 16.7× on 10× data, SCALING.md)."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_bruteforce(embs, queries, k=KNN_K).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )


def _dense_ranks_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN cosine ranks — the dense SCALE path: k-means coarse
    quantizer, per-query probe of the nearest cells, exact re-rank within
    them. Served from the PERSISTED index (build once per corpus,
    memoized like the text index): byte-identical to per-call
    ``knn_ivf`` (pinned in test_docs_pipeline) minus the per-call
    training the round-8 ladder showed dominating. Candidate generation
    is bucket-join-shaped (no all-pairs); query cost tracks the probed
    fraction, not |Q|·N."""
    embs = _embs(spark, sf_dir)
    queries = embs.where(F.col("vec_id") % KNN_QUERY_MOD == 0)
    return S.knn_ivf_indexed(
        spark, _ann_index_path(spark, sf_dir), queries, k=KNN_K
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")


@register("hybrid_mlt_search", _hybrid_oracle_sql(), extra=True)
def hybrid_mlt_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid more-like-this retrieval: sparse BM25-lin over the query
    doc's own tokens + dense exact-cosine kNN over its embedding, fused by
    exact-integer reciprocal-rank fusion (operators/search.py::rrf_fuse).
    Scores from a BM25 ranker and a cosine ranker are not comparable;
    ranks are — RRF uses only ranks, and the integer floor keeps the whole
    composition hash-checkable against the DuckDB oracle. The EXACT form
    of the retrieval stack — production runs hybrid_mlt_search_ann below,
    which swaps only the dense candidate generator."""
    from .operators import search as SE

    sparse = _mlt_sparse_ranks(spark, sf_dir)
    dense = _dense_ranks_exact(spark, sf_dir)
    return SE.rrf_fuse([sparse, dense], k=KNN_K)


@register("hybrid_mlt_search_ann", extra=True)  # rows-only by design: the
# dense half is approximate (IVF probes), so there is no exact oracle for
# the composition — its correctness evidence is hybrid_ann_eval's
# recall-vs-exact-hybrid row (ground truth = the hash-matched
# hybrid_mlt_search above), floor-gated in tests/test_search.py.
def hybrid_mlt_search_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN-backed hybrid retrieval — the 100 TB form of hybrid_mlt_search:
    the sparse side is COST-ROUTED over the persisted inverted index
    (bm25_more_like_this_auto — byte-identical to the scan form either
    way, so the exact-hybrid ground truth still applies; round 9 swapped
    the unconditional indexed read after the sf1 full-section bench
    caught it picking the losing plan for a corpus-fraction |Q| batch:
    540s indexed vs ~135s scan — the measured crossover the router
    prices) and the dense side reads the persisted IVF index. Identical
    exact-integer RRF fusion. This is the composition a production
    retrieval stack actually runs; the exact hybrid remains registered
    as its ground truth."""
    from .operators import search as SE

    sparse = SE.bm25_more_like_this_auto(
        spark,
        _text_index_path(spark, sf_dir),
        _docs(spark, sf_dir),
        F.col("doc_id") % KNN_QUERY_MOD == 0,
        k=KNN_K,
        max_query_terms=MLT_MAX_TERMS,
    ).select("query_id", "doc_id", "rank")
    dense = _dense_ranks_ivf(spark, sf_dir)
    return SE.rrf_fuse([sparse, dense], k=KNN_K)


@register("hybrid_ann_eval", extra=True)  # rows-only info row, the
# knn_ann_eval pattern: the recall number IS the evidence.
def hybrid_ann_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@k of the ANN-backed hybrid against the exact hybrid (whose
    full composition hash-matches the DuckDB oracle): one row
    ``(n_queries, n_hits, recall_bp)``, computed distributed — the
    approx∩exact intersection is a semi-join on (query, doc), counts are
    integers, every input is RNG-free so the row is deterministic. The
    sparse side is computed ONCE (eager_cache) and fused with both dense
    variants — the eval's cost over the two hybrids is one extra fusion,
    not a second corpus scan. Floor recall_bp ≥ 9000 pinned in
    tests/test_search.py."""
    from .functions import eager_cache
    from .operators import search as SE

    sparse = eager_cache(_mlt_sparse_ranks(spark, sf_dir))
    exact = None
    try:
        # exact feeds three consumers (hits semi-join, n_queries, n_exact)
        exact = eager_cache(
            SE.rrf_fuse(
                [sparse, _dense_ranks_exact(spark, sf_dir)], k=KNN_K
            ).select("query_id", "doc_id")
        )
        approx = SE.rrf_fuse(
            [sparse, _dense_ranks_ivf(spark, sf_dir)], k=KNN_K
        ).select("query_id", "doc_id")
        hits = approx.join(
            F.broadcast(exact), ["query_id", "doc_id"], "left_semi"
        ).agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
        nq = exact.select("query_id").distinct().agg(
            F.count(F.lit(1)).cast("long").alias("n_queries")
        )
        # denominator = the ACTUAL exact-hybrid pair count, not
        # n_queries·K: a query can fuse to fewer than K rows (or appear
        # only on the dense side) and n_queries·K would then mis-scale
        # the ratio in either direction
        nx = exact.agg(F.count(F.lit(1)).cast("long").alias("n_exact"))
        result = (
            hits.crossJoin(F.broadcast(nq))
            .crossJoin(F.broadcast(nx))
            .select(
                "n_queries",
                "n_hits",
                F.floor(F.col("n_hits") * 10000 / F.col("n_exact"))
                .cast("long")
                .alias("recall_bp"),
            )
        )
        # materialize (1 row) while the caches are alive, then release
        rows = result.collect()
    finally:
        sparse.unpersist()
        if exact is not None:
            exact.unpersist()
    return spark.createDataFrame(rows, result.schema)


# --------------------------------------------------------------------------
# Round 8: RAG chunking + corpus-trained n-gram LM scoring
# --------------------------------------------------------------------------

_CHUNK_STRIDE = T.CHUNK_TOKENS - T.CHUNK_OVERLAP


@register(
    "chunk_documents",
    f"""WITH {_TOKS_CTE},
    nz AS (SELECT doc_id, toks, len(toks) AS n FROM toks WHERE len(toks) > 0),
    fs AS (SELECT doc_id, toks, n,
                  list_filter(range(0, n, {_CHUNK_STRIDE}),
                              s -> s = 0 OR s + {T.CHUNK_OVERLAP} < n) AS starts
           FROM nz),
    ex AS (SELECT doc_id, toks, n, CAST(i - 1 AS INT) AS chunk_idx,
                  CAST(starts[CAST(i AS INT)] AS INT) AS chunk_start
           FROM fs, unnest(range(1, len(starts) + 1)) AS u(i))
    SELECT doc_id, chunk_idx, chunk_start,
           CAST(least({T.CHUNK_TOKENS}, n - chunk_start) AS BIGINT) AS n_tokens,
           array_to_string(list_slice(toks, chunk_start + 1,
                                      chunk_start + {T.CHUNK_TOKENS}), ' ')
               AS chunk_text
    FROM ex""",
    extra=True,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/embedding-prep chunker (operators/text.py::chunk_documents):
    overlapping fixed-token windows with the trailing-suffix rule,
    computed per row with array HOFs — zero shuffle, token-exact, so the
    whole op hash-matches the DuckDB oracle."""
    return T.chunk_documents(_docs(spark, sf_dir))


@register(
    "ngram_lm_score",
    f"""WITH {_TOKS_CTE},
    bi AS (SELECT doc_id, toks[CAST(i AS INT)] AS w1,
                  toks[CAST(i + 1 AS INT)] AS w2
           FROM toks, unnest(range(1, len(toks))) AS u(i)),
    c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bi GROUP BY 1, 2),
    c1f AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1f FROM c2 GROUP BY 1),
    sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
                  CAST(SUM((c2.c2 * {T.LM_PPM}) // c1f.c1f) // COUNT(*)
                       AS BIGINT) AS lm_score_ppm
           FROM bi JOIN c2 USING (w1, w2) JOIN c1f USING (w1)
           GROUP BY doc_id)
    SELECT d.doc_id, COALESCE(sc.n_bigrams, 0) AS n_bigrams, sc.lm_score_ppm
    FROM documents d LEFT JOIN sc USING (doc_id)""",
    extra=True,
)
def ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM fluency surrogate
    (operators/text.py::ngram_lm_score): KenLM-style curation signal
    without the transcendental — exact-integer ppm conditional
    probabilities, MLE counts trained on the corpus in the same job, so
    scores hash-match the DuckDB oracle."""
    return T.ngram_lm_score(_docs(spark, sf_dir))


#: process-scoped persisted near-dup index over the EVEN-id half of the
#: corpus (same lifecycle pattern as the text/ANN index memos)
_NEARDUP_INDEX_BUILT: dict[str, str] = {}


def _neardup_index(spark: SparkSession, sf_dir: str) -> str:
    path = _NEARDUP_INDEX_BUILT.get(sf_dir)
    if path is None:
        import tempfile

        path = tempfile.mkdtemp(prefix="spark_graft_nd_idx_") + "/idx"
        D.build_neardup_index(
            _docs(spark, sf_dir).where(F.col("doc_id") % 2 == 0), path
        )
        _NEARDUP_INDEX_BUILT[sf_dir] = path
    return path


@register(
    "neardup_probe_indexed",
    f"""WITH {_MINHASH_PAIRS_CTES}
    SELECT doc_a AS doc_id, doc_b AS dup_of, jaccard_bp FROM pairs
     WHERE doc_a % 2 = 1 AND doc_b % 2 = 0
    UNION ALL
    SELECT doc_b AS doc_id, doc_a AS dup_of, jaccard_bp FROM pairs
     WHERE doc_b % 2 = 1 AND doc_a % 2 = 0""",
    extra=True,
)
def neardup_probe_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Probe of the PERSISTED near-dup band index
    (operators/dedup.py::build_neardup_index / neardup_probe): odd-id
    documents probed against the indexed even-id corpus. The oracle
    recomputes the full MinHash-LSH pair set and keeps the odd-vs-even
    straddling pairs oriented probe→indexed — a hash match proves the
    persisted index serves exactly the batch LSH candidates (streaming
    append equivalence is pinned in tests/test_streaming.py)."""
    docs = _docs(spark, sf_dir)
    idx = D.read_neardup_index(spark, _neardup_index(spark, sf_dir))
    return D.neardup_probe(docs.where(F.col("doc_id") % 2 == 1), idx)
