"""Query catalogue, part 2: training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) with
DuckDB oracles. Merged into the main catalogue by queries.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from .functions import text as T
from .operators import dedup as D
from .operators import similarity as S
from .operators.multimodal import attach_binary_payload, extract_metadata
from .queries import emb, load

P = D.MINHASH_P

# ---------------------------------------------------------------- helpers

_DUCK_TOKS = "string_split_regex(lower(text), '\\s+')"
_DUCK_SHINGLES = f"""
CASE WHEN len({_DUCK_TOKS}) >= 3
     THEN list_distinct(list_transform(range(1, len({_DUCK_TOKS}) - 1),
          i -> concat({_DUCK_TOKS}[i], ' ', {_DUCK_TOKS}[i+1], ' ', {_DUCK_TOKS}[i+2])))
     ELSE [] END
"""


def _duck_hash60(expr: str) -> str:
    return f"('0x' || substr(md5({expr}), 1, 15))::BIGINT"


# ------------------------------------------------------------ text features


def q_text_features(spark, sf_dir):
    """Quality-scoring feature set per document (length, token stats,
    punctuation, stopword ratio, composite quality score)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    return d.select(
        "doc_id",
        F.length(t).alias("n_chars"),
        T.token_count(t).alias("n_tokens"),
        T.bpe_token_count(t).alias("n_bpe_tokens"),
        F.round(T.avg_token_len(t), 6).alias("avg_token_len"),
        F.round(T.punct_ratio(t), 6).alias("punct_ratio"),
        F.round(T.stopword_ratio(t, "en"), 6).alias("stop_ratio_en"),
        T.quality_score(t).alias("quality"),
    ).orderBy("doc_id")


SQL_TEXT_FEATURES = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKS} AS toks FROM documents),
b AS (SELECT doc_id, text, toks,
        length(text) AS n_chars,
        len(toks) AS n_tokens,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe_tokens,
        list_sum(list_transform(toks, x -> length(x)))::DOUBLE / len(toks) AS atl,
        (length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{{}}\\-]', '', 'g')))::DOUBLE
            / length(text) AS pr,
        list_sum(list_transform(toks, x -> CASE WHEN x IN
          ('the','a','and','of','to','in','is','on','for','with') THEN 1 ELSE 0 END))::DOUBLE
            / len(toks) AS sr
      FROM t)
SELECT doc_id, n_chars, n_tokens, n_bpe_tokens,
       round(atl, 6) AS avg_token_len,
       round(pr, 6) AS punct_ratio,
       round(sr, 6) AS stop_ratio_en,
       round(0.4 * least(n_tokens / 100.0, 1.0)
           + 0.3 * (1.0 - least(pr * 5, 1.0))
           + 0.3 * least(sr * 4, 1.0), 6) AS quality
FROM b ORDER BY doc_id
"""


def q_lang_id(spark, sf_dir):
    """Stopword-list language-ID heuristic + accuracy vs the actual
    lang column (deterministic argmax, tiebreak en>de>fr>es)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    hits = {lang: T.stopword_hits(t, lang) for lang in ("en", "de", "fr", "es")}
    g = F.greatest(*hits.values())
    pred = (
        F.when(hits["en"] == g, "en")
        .when(hits["de"] == g, "de")
        .when(hits["fr"] == g, "fr")
        .otherwise("es")
    )
    out = d.select(
        "doc_id",
        *[hits[lang].alias(f"hits_{lang}") for lang in ("en", "de", "fr", "es")],
        pred.alias("pred_lang"),
        F.col("lang").alias("actual_lang"),
    )
    return out.withColumn(
        "correct", (F.col("pred_lang") == F.col("actual_lang")).cast("int")
    ).orderBy("doc_id")


def _duck_hits(words: list[str]) -> str:
    quoted = ",".join(f"'{w}'" for w in words)
    return (
        f"list_sum(list_transform({_DUCK_TOKS}, x -> CASE WHEN x IN ({quoted}) "
        f"THEN 1 ELSE 0 END))"
    )


SQL_LANG_ID = f"""
WITH h AS (SELECT doc_id, lang,
    coalesce({_duck_hits(T.STOPWORDS['en'])}, 0)::INTEGER AS hits_en,
    coalesce({_duck_hits(T.STOPWORDS['de'])}, 0)::INTEGER AS hits_de,
    coalesce({_duck_hits(T.STOPWORDS['fr'])}, 0)::INTEGER AS hits_fr,
    coalesce({_duck_hits(T.STOPWORDS['es'])}, 0)::INTEGER AS hits_es
  FROM documents),
p AS (SELECT *, greatest(hits_en, hits_de, hits_fr, hits_es) AS g FROM h)
SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
       CASE WHEN hits_en = g THEN 'en' WHEN hits_de = g THEN 'de'
            WHEN hits_fr = g THEN 'fr' ELSE 'es' END AS pred_lang,
       lang AS actual_lang,
       CASE WHEN (CASE WHEN hits_en = g THEN 'en' WHEN hits_de = g THEN 'de'
                       WHEN hits_fr = g THEN 'fr' ELSE 'es' END) = lang
            THEN 1 ELSE 0 END AS correct
FROM p ORDER BY doc_id
"""


def q_token_entropy(spark, sf_dir):
    """Shannon entropy of the per-doc token distribution (the
    token_entropy drift feature from BASELINE north_star), via the
    closed form ln(n) - sum(c*ln(c))/n."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    return (
        tc.groupBy("doc_id")
        .agg(
            F.round(
                F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c"), 6
            ).alias("token_entropy")
        )
        .orderBy("doc_id")
    )


SQL_TOKEN_ENTROPY = f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2)
SELECT doc_id, round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS token_entropy
FROM tc GROUP BY doc_id ORDER BY doc_id
"""


def q_fingerprint_docs(spark, sf_dir):
    """Rolling-hash document fingerprint: min 60-bit hash over char
    5-grams (winnowing-lite)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id", T.char_ngram_fingerprint(F.col("text"), 5).alias("fingerprint")
    ).orderBy("doc_id")


SQL_FINGERPRINT_DOCS = f"""
SELECT doc_id,
  CASE WHEN length(text) >= 5
       THEN list_min(list_transform(range(1, length(text) - 3),
            i -> {_duck_hash60('substr(text, i, 5)')}))
       ELSE {_duck_hash60('text')} END AS fingerprint
FROM documents ORDER BY doc_id
"""


# k/w sized for this corpus's tiny synthetic vocabulary: short char
# grams are ubiquitous (k=5/w=4/min 2 matched ~all 124k pairs), so the
# operating point detects any common run of >= w + k - 1 = 36 chars
# (the MOSS no-false-negative guarantee; a single shared fingerprint
# itself only witnesses a common k=25-gram); 25 pairs at sf0.01 — the
# same near-dup set scale the MinHash row finds.
WINNOW_K, WINNOW_W, WINNOW_MIN_SHARED = 25, 12, 3


def q_winnow_pairs(spark, sf_dir):
    """Winnowing fingerprint overlap (MOSS algorithm,
    operators/winnow.py): doc pairs sharing >= 3 windowed-min k-gram
    hashes — each shared fingerprint witnesses a common k-gram; runs
    of >= w + k - 1 chars are guaranteed to be detected."""
    from .operators.winnow import winnow_pairs

    d = load(spark, sf_dir, "documents")
    return winnow_pairs(
        d, k=WINNOW_K, w=WINNOW_W, min_shared=WINNOW_MIN_SHARED
    ).orderBy("doc_a", "doc_b")


SQL_WINNOW_PAIRS = f"""
WITH h AS (
  SELECT doc_id,
         list_transform(range(1, greatest(length(text) - {WINNOW_K} + 1, 1) + 1),
                        i -> {_duck_hash60(f'substr(text, i, {WINNOW_K})')}) AS hs
  FROM documents),
fp AS (
  SELECT DISTINCT doc_id, unnest(
      list_distinct(list_transform(
        range(1, greatest(len(hs) - {WINNOW_W} + 1, 1) + 1),
        p -> list_min(hs[p : least(p + {WINNOW_W} - 1, len(hs))])))) AS fingerprint
  FROM h),
pr AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
  FROM fp a JOIN fp b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, n_shared FROM pr WHERE n_shared >= {WINNOW_MIN_SHARED}
ORDER BY doc_a, doc_b
"""


# ------------------------------------------------------------------- dedup


def q_dedup_exact(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return D.exact_duplicates(d).orderBy("text_sha")


SQL_DEDUP_EXACT = """
SELECT sha256(text) AS text_sha, count(*) AS n_copies, min(doc_id) AS min_doc_id
FROM documents GROUP BY 1 ORDER BY text_sha
"""


def q_dedup_ngram_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(d, threshold=0.5, group_cols=["lang"]).orderBy(
        "doc_a", "doc_b"
    )


SQL_DEDUP_NGRAM_PAIRS = f"""
WITH sh AS (SELECT doc_id, lang, {_DUCK_SHINGLES} AS sh FROM documents),
p AS (SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
        len(list_intersect(a.sh, b.sh))::DOUBLE /
        len(list_distinct(list_concat(a.sh, b.sh))) AS jaccard
      FROM sh a JOIN sh b ON a.lang = b.lang AND a.doc_id < b.doc_id)
SELECT lang, doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM p WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
"""


def q_minhash_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return D.minhash_dedup_pairs(d, threshold=0.5).orderBy("doc_a", "doc_b")


def _sql_minhash_pairs() -> str:
    mins = ",\n    ".join(
        f"min(({a} * h + {b}) % {P}) AS m{i}" for i, (a, b) in enumerate(D.MINHASH_COEFFS)
    )
    band_rows = []
    for band in range(D.N_BANDS):
        cols = [f"m{band * D.ROWS_PER_BAND + r}" for r in range(D.ROWS_PER_BAND)]
        key = " || '_' || ".join(cols)
        band_rows.append(f"SELECT doc_id, {band} AS band_id, {key} AS band_key FROM sig")
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM sh),
h AS (SELECT doc_id, {_duck_hash60('shingle')} % {P} AS h FROM ex),
sig AS (SELECT doc_id, {mins} FROM h GROUP BY doc_id),
banded AS ({bands}),
cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         FROM banded a JOIN banded b
           ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id),
v AS (SELECT c.doc_a, c.doc_b,
        len(list_intersect(sa.sh, sb.sh))::DOUBLE /
        len(list_distinct(list_concat(sa.sh, sb.sh))) AS jaccard
      FROM cand c JOIN sh sa ON c.doc_a = sa.doc_id JOIN sh sb ON c.doc_b = sb.doc_id)
SELECT doc_a, doc_b, round(jaccard, 6) AS jaccard
FROM v WHERE jaccard >= 0.5 ORDER BY doc_a, doc_b
"""


SQL_MINHASH_PAIRS = _sql_minhash_pairs()


def q_dedup_clusters(spark, sf_dir):
    """Duplicate-cluster resolution over the MinHash near-dup pairs:
    connected components (hash-to-min label propagation,
    operators/dedup.py connected_components), cluster_id = smallest
    doc_id in the component — the 'group duplicates, keep one
    canonical doc' step of a dedup pipeline."""
    d = load(spark, sf_dir, "documents")
    pairs = D.minhash_dedup_pairs(d, threshold=0.5)
    cc = D.connected_components(pairs)
    return cc.select(F.col("node").alias("doc_id"), "cluster_id").orderBy("doc_id")


def _sql_dedup_clusters() -> str:
    """Transitive closure via a recursive CTE over the same MinHash
    pair SQL — exact min-reachable-id per node (the graph at oracle
    scale is tiny)."""
    return f"""
WITH RECURSIVE p AS (
  SELECT doc_a, doc_b FROM ({_sql_minhash_pairs()})
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM p
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM p
),
reach(src, dst) AS (
  SELECT src, src FROM (SELECT DISTINCT src FROM edges)
  UNION
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, min(dst) AS cluster_id FROM reach GROUP BY src ORDER BY doc_id
"""


SQL_DEDUP_CLUSTERS = _sql_dedup_clusters()


# ---------------------------------------------- persisted near-dup index


def q_minhash_index_pairs(spark, sf_dir):
    """Incremental-index end-to-end parity: build the persisted MinHash
    index on two thirds of the corpus, refresh it with the FULL corpus
    (the already-indexed rows are content-fingerprint re-deliveries and
    are skipped; the remaining third is the delta that gets probed +
    self-deduped + appended), then read the maintained pairs artifact.
    The oracle is the FROM-SCRATCH minhash_pairs SQL over the whole
    table — the decomposition (base x base at build) ∪ (delta x stored
    probe) ∪ (delta x delta) must reproduce it exactly, because band
    keys depend only on each doc's own content
    (operators/neardup_index.py)."""
    import tempfile

    from .operators import neardup_index as NI

    d = load(spark, sf_dir, "documents")
    ref = tempfile.mkdtemp(prefix="ndidx_q_")
    NI.minhash_index_build(d.where(F.col("doc_id") % 3 != 0), ref)
    NI.minhash_index_refresh(d, ref)
    return NI.minhash_index_pairs(spark, ref).orderBy("doc_a", "doc_b")


def q_minhash_index_probe(spark, sf_dir):
    """Read-only index probe: near-dup pairs of the held-out third
    against the indexed two thirds — only the probe side is LSH-ed;
    the stored side contributes one band-key equi-join and the shingle
    refine lookup. Oracle: the cross subset of the from-scratch
    pairs."""
    import tempfile

    from .operators import neardup_index as NI

    d = load(spark, sf_dir, "documents")
    ref = tempfile.mkdtemp(prefix="ndprobe_q_")
    NI.minhash_index_build(d.where(F.col("doc_id") % 3 != 0), ref)
    return NI.minhash_index_probe(d.where(F.col("doc_id") % 3 == 0), ref).orderBy(
        "doc_a", "doc_b"
    )


SQL_MINHASH_INDEX_PROBE = f"""
SELECT doc_a, doc_b, jaccard FROM ({_sql_minhash_pairs()})
WHERE (doc_a % 3 = 0) <> (doc_b % 3 = 0)
ORDER BY doc_a, doc_b
"""


def q_neardup_ingest(spark, sf_dir):
    """The ingest gate a streaming near-dup dedup runs per micro-batch
    (streaming/dedup.py neardup_ingest_batch — the catalogue calls the
    SAME function foreachBatch wires, so batch and stream semantics
    cannot diverge): index built on two thirds of the corpus, the
    held-out third arrives as one batch; rows are dropped when they
    are exact re-deliveries, near-dups of an indexed doc, or have a
    smaller-id near-dup partner within the batch. Returns the
    surviving doc ids."""
    import tempfile

    from .operators import neardup_index as NI
    from .streaming.dedup import neardup_ingest_batch

    d = load(spark, sf_dir, "documents")
    ref = tempfile.mkdtemp(prefix="ndingest_q_")
    NI.minhash_index_build(d.where(F.col("doc_id") % 3 != 0), ref)
    survivors = neardup_ingest_batch(d.where(F.col("doc_id") % 3 == 0), ref)
    return survivors.select("doc_id").orderBy("doc_id")


SQL_NEARDUP_INGEST = f"""
WITH full_pairs AS ({_sql_minhash_pairs()}),
delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
base  AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 != 0),
-- 1. exact content re-deliveries
fresh AS (SELECT d.doc_id FROM delta d
          WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.text = d.text)),
-- 2. near-dup of an indexed doc (cross pairs, delta side)
matched AS (
  SELECT CASE WHEN doc_a % 3 = 0 THEN doc_a ELSE doc_b END AS doc_id
  FROM full_pairs WHERE (doc_a % 3 = 0) <> (doc_b % 3 = 0)
),
fresh2 AS (SELECT doc_id FROM fresh WHERE doc_id NOT IN (SELECT doc_id FROM matched)),
-- 3. within-batch: greatest side of each surviving delta-delta pair
losers AS (
  SELECT greatest(doc_a, doc_b) AS doc_id
  FROM full_pairs
  WHERE doc_a % 3 = 0 AND doc_b % 3 = 0
    AND doc_a IN (SELECT doc_id FROM fresh2)
    AND doc_b IN (SELECT doc_id FROM fresh2)
)
SELECT doc_id FROM fresh2 WHERE doc_id NOT IN (SELECT doc_id FROM losers)
ORDER BY doc_id
"""


def q_sample_docs(spark, sf_dir):
    """Deterministic 10% train-split sample by md5(doc_id || salt)
    prefix (operators/sampling.py): a pure map-side filter with no
    RNG state, reproducible on any cluster size; the oracle reproduces
    it bit-for-bit because both engines compute the identical md5."""
    from .operators.sampling import hash_sample

    d = load(spark, sf_dir, "documents")
    return hash_sample(d, 0.1, "doc_id", salt="train").select(
        "doc_id", "lang"
    ).orderBy("doc_id")


def _sql_sample_docs() -> str:
    from .operators.sampling import _threshold_hex

    return f"""
SELECT doc_id, lang FROM documents
WHERE substr(md5(doc_id::VARCHAR || 'train'), 1, 8) < '{_threshold_hex(0.1)}'
ORDER BY doc_id
"""


SQL_SAMPLE_DOCS = _sql_sample_docs()

# per-language sampling rates: up-weight the low-resource tail —
# the standard training-mix rebalance
STRATA_FRACTIONS = {"en": 0.05, "zh": 0.2, "es": 0.3, "de": 0.5, "fr": 0.8}


def q_stratified_sample_docs(spark, sf_dir):
    """Per-language deterministic sample (broadcast threshold table +
    map-side md5-prefix filter), the training-mix rebalance step."""
    from .operators.sampling import stratified_sample

    d = load(spark, sf_dir, "documents")
    return stratified_sample(
        d, STRATA_FRACTIONS, "doc_id", "lang", salt="mix"
    ).select("doc_id", "lang").orderBy("doc_id")


def _sql_stratified_sample_docs() -> str:
    from .operators.sampling import _threshold_hex

    rows = ", ".join(
        f"('{k}', '{_threshold_hex(v)}')" for k, v in STRATA_FRACTIONS.items()
    )
    return f"""
WITH thr AS (SELECT * FROM (VALUES {rows}) t(lang, h))
SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.lang
WHERE substr(md5(d.doc_id::VARCHAR || 'mix'), 1, 8) < thr.h
ORDER BY d.doc_id
"""


SQL_STRATIFIED_SAMPLE_DOCS = _sql_stratified_sample_docs()


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination: 3-gram shingle overlap of every
    training doc against the (broadcast) benchmark shingle dictionary.
    Benchmark set = doc_id % 37 == 0, a deterministic pseudo eval
    split; docs with overlap >= 0.05 are flagged contaminated."""
    from .operators.decontaminate import contamination_report

    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 37 == 0)
    train = d.where(F.col("doc_id") % 37 != 0)
    return contamination_report(train, bench, threshold=0.05).orderBy("doc_id")


SQL_CONTAMINATION_CHECK = f"""
WITH sh AS (SELECT doc_id, {_DUCK_SHINGLES} AS sh FROM documents),
bench AS (SELECT DISTINCT unnest(sh) AS shingle FROM sh WHERE doc_id % 37 = 0),
tr AS (SELECT doc_id, len(sh)::INTEGER AS n_shingles, sh FROM sh WHERE doc_id % 37 <> 0),
ex AS (SELECT doc_id, unnest(sh) AS shingle FROM tr),
shared AS (SELECT e.doc_id, count(*) AS c FROM ex e JOIN bench b USING (shingle) GROUP BY 1)
SELECT t.doc_id, t.n_shingles, coalesce(s.c, 0)::BIGINT AS n_shared,
       round(coalesce(s.c, 0)::DOUBLE / greatest(t.n_shingles, 1), 6) AS overlap,
       CASE WHEN coalesce(s.c, 0)::DOUBLE / greatest(t.n_shingles, 1) >= 0.05
            THEN 1 ELSE 0 END AS contaminated
FROM tr t LEFT JOIN shared s USING (doc_id) ORDER BY doc_id
"""


def q_repetition_signals(spark, sf_dir):
    """Gopher-style repetition quality signals, all map-side (no
    shuffle): duplicate-token fraction, duplicate-bigram fraction,
    and top-token fraction via a sorted-run aggregate() instead of
    the explode -> two-groupBy mode plan (functions/text.py)."""
    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    dtf = T.dup_token_fraction(t)
    ttf = T.top_token_fraction(t)
    return d.select(
        "doc_id",
        T.token_count(t).alias("n_tokens"),
        F.round(dtf, 6).alias("dup_token_frac"),
        F.round(T.dup_gram_fraction(t, 2), 6).alias("dup_bigram_frac"),
        F.round(ttf, 6).alias("top_token_frac"),
        ((dtf > 0.65) | (ttf > 0.125)).cast("int").alias("flagged"),
    ).orderBy("doc_id")


SQL_REPETITION_SIGNALS = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
b AS (SELECT doc_id, len(toks)::INTEGER AS n_tokens,
        1 - len(list_distinct(toks))::DOUBLE / len(toks) AS dtf,
        CASE WHEN len(toks) >= 2
             THEN 1 - len(list_distinct(list_transform(range(1, len(toks)),
                    i -> concat(toks[i], ' ', toks[i+1]))))::DOUBLE / (len(toks) - 1)
             ELSE 0.0 END AS dbf
      FROM t),
m AS (SELECT doc_id, max(c)::DOUBLE AS mx FROM
        (SELECT doc_id, tok, count(*) AS c FROM
          (SELECT doc_id, unnest(toks) AS tok FROM t) GROUP BY 1, 2)
      GROUP BY 1)
SELECT b.doc_id, n_tokens, round(dtf, 6) AS dup_token_frac,
       round(dbf, 6) AS dup_bigram_frac,
       round(m.mx / n_tokens, 6) AS top_token_frac,
       CASE WHEN dtf > 0.65 OR m.mx / n_tokens > 0.125 THEN 1 ELSE 0 END AS flagged
FROM b JOIN m USING (doc_id) ORDER BY b.doc_id
"""

CHUNK_TOKENS, CHUNK_OVERLAP = 64, 16


def q_chunk_docs(spark, sf_dir):
    """Overlapping fixed-token chunking (64-token chunks, 16-token
    overlap) — the pretraining/RAG chunker, pure map-side
    (operators/packing.py chunk_documents)."""
    from .operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    return chunk_documents(d, CHUNK_TOKENS, CHUNK_OVERLAP).orderBy(
        "doc_id", "chunk_id"
    )


_STRIDE = CHUNK_TOKENS - CHUNK_OVERLAP

SQL_CHUNK_DOCS = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents),
p AS (SELECT doc_id, toks, len(toks) AS n,
        greatest(1, ceil((len(toks) - {CHUNK_OVERLAP})::DOUBLE / {_STRIDE})::BIGINT)
          AS n_chunks
      FROM t),
c AS (SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, toks, n FROM p)
SELECT doc_id, chunk_id::INTEGER AS chunk_id,
       len(toks[chunk_id * {_STRIDE} + 1 :
                least(chunk_id * {_STRIDE} + {CHUNK_TOKENS}, n)])::INTEGER
         AS n_chunk_tokens,
       array_to_string(toks[chunk_id * {_STRIDE} + 1 :
                least(chunk_id * {_STRIDE} + {CHUNK_TOKENS}, n)], ' ')
         AS chunk_text
FROM c ORDER BY doc_id, chunk_id
"""


def q_chunk_dedup(spark, sf_dir):
    """Chunk-granularity exact dedup: documents that share only PART
    of their text (missed by whole-doc sha dedup) surface as
    duplicated chunks. Composition of chunk_documents with the
    hash-groupBy dedup plan — one shuffle on the chunk sha."""
    from .operators.packing import chunk_documents

    d = load(spark, sf_dir, "documents")
    c = chunk_documents(d, CHUNK_TOKENS, CHUNK_OVERLAP)
    return (
        c.groupBy(F.sha2(F.col("chunk_text"), 256).alias("chunk_sha"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("min_doc_id"),
        )
        .where(F.col("n_copies") > 1)
        .orderBy("chunk_sha")
    )


SQL_CHUNK_DEDUP = f"""
WITH chunks AS ({SQL_CHUNK_DOCS})
SELECT sha256(chunk_text) AS chunk_sha, count(*) AS n_copies,
       count(DISTINCT doc_id) AS n_docs, min(doc_id) AS min_doc_id
FROM chunks GROUP BY 1 HAVING count(*) > 1 ORDER BY chunk_sha
"""


TOKEN_SHARD_BUDGET = 1500


def q_token_shards(spark, sf_dir):
    """Contiguous-fill packing of the corpus into ~1500-BPE-token
    training shards, reported per shard. The global ordered cumsum
    uses the bucketed two-pass plan (operators/packing.py) — no
    single-partition window anywhere."""
    from .operators.packing import contiguous_token_shards, shard_report

    d = load(spark, sf_dir, "documents")
    t = d.select("doc_id", T.bpe_token_count(F.col("text")).alias("w"))
    sh = contiguous_token_shards(
        t, budget=TOKEN_SHARD_BUDGET, order_col="doc_id", weight_col="w"
    )
    return shard_report(sh, "w").orderBy("shard_id")


SQL_TOKEN_SHARDS = f"""
WITH t AS (SELECT doc_id,
        len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS w
      FROM documents),
c AS (SELECT doc_id, w, sum(w) OVER (ORDER BY doc_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM t)
SELECT ((cum - w) // {TOKEN_SHARD_BUDGET})::BIGINT AS shard_id,
       count(*) AS n_docs, sum(w)::BIGINT AS shard_tokens
FROM c GROUP BY 1 ORDER BY 1
"""


def q_vocab_topk(spark, sf_dir):
    """Per-language top-10 vocabulary candidates (term + document
    frequency) — the tokenizer-training corpus scan. Word-count-shaped
    with map-side combine; the rank filter compiles to a
    WindowGroupLimit partial/final pair (operators/vocab.py)."""
    from .operators.vocab import vocab_topk

    d = load(spark, sf_dir, "documents")
    return vocab_topk(d, k=10).orderBy("lang", "rank")


SQL_VOCAB_TOPK = f"""
WITH t AS (SELECT doc_id, lang, unnest({_DUCK_TOKS}) AS token FROM documents),
f AS (SELECT lang, token, count(*)::BIGINT AS tf,
             count(DISTINCT doc_id)::BIGINT AS df
      FROM t WHERE token <> '' GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY tf DESC, token ASC) AS rank FROM f)
SELECT lang, rank::INTEGER AS rank, token, tf, df
FROM r WHERE rank <= 10 ORDER BY lang, rank
"""


def q_bpe_merge_candidates(spark, sf_dir):
    """Global top-20 adjacent token pairs — one iteration of the BPE
    merge-candidate scan at word granularity (operators/vocab.py)."""
    from .operators.vocab import merge_pair_topk

    d = load(spark, sf_dir, "documents")
    return merge_pair_topk(d, k=20).orderBy("rank")


SQL_BPE_MERGE_CANDIDATES = f"""
WITH g AS (SELECT unnest(list_transform(range(1, len(toks)),
                    i -> concat(toks[i], ' ', toks[i+1]))) AS pair
           FROM (SELECT {_DUCK_TOKS} AS toks FROM documents)),
c AS (SELECT pair, count(*)::BIGINT AS cnt FROM g GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rank FROM c)
SELECT rank::INTEGER AS rank, pair, cnt FROM r WHERE rank <= 20 ORDER BY rank
"""


def q_training_shuffle(spark, sf_dir):
    """Deterministic global training-order shuffle: every doc ranked
    by md5(doc_id || 'ord-v1') through the bucketed two-pass rank
    (operators/sampling.py shuffle_order) — reproducible at any
    cluster size, no single-partition sort."""
    from .operators.sampling import shuffle_order

    d = load(spark, sf_dir, "documents").select("doc_id", "lang")
    return shuffle_order(d, key_col="doc_id", salt="ord-v1").orderBy("doc_id")


SQL_TRAINING_SHUFFLE = """
SELECT doc_id, lang,
       row_number() OVER (ORDER BY
         ('0x' || substr(md5(doc_id::VARCHAR || 'ord-v1'), 1, 15))::BIGINT
       )::BIGINT AS shuffle_rank
FROM documents ORDER BY doc_id
"""


LM_VOCAB_K = 1000  # dictionary truncation; rarer tokens score as OOV
LM_OOV_LOGP = -12.0


def q_doc_logprob(spark, sf_dir):
    """Unigram-LM quality score: per-document mean token log-prob
    under the corpus's own unigram distribution (the classic LM-based
    quality filter — low mean logprob = gibberish / OOV-heavy text).

    100-TB shape: the dictionary is the corpus top-K tokens (the
    vocab_topk machinery, K fixed so the model side stays broadcast-
    sized at any corpus size); scoring is one exploded pass with a
    broadcast left join and a per-doc partial-aggregated mean —
    exactly the decontamination plan with logprobs instead of hits.
    """
    from .operators.vocab import unigram_logprob

    d = load(spark, sf_dir, "documents")
    return (
        unigram_logprob(d, k=LM_VOCAB_K, oov_logp=LM_OOV_LOGP)
        .withColumn("low_quality", (F.col("mean_logprob") < -8.0).cast("int"))
        .orderBy("doc_id")
    )


SQL_DOC_LOGPROB = f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS token FROM documents),
tok2 AS (SELECT * FROM tok WHERE token <> ''),
freq AS (SELECT token, count(*)::BIGINT AS tf FROM tok2 GROUP BY 1),
tot AS (SELECT sum(tf) AS tot FROM freq),
dic AS (SELECT token, ln(tf / tot) AS logp
        FROM (SELECT token, tf, row_number() OVER
                (ORDER BY tf DESC, token ASC) AS rnk FROM freq), tot
        WHERE rnk <= {LM_VOCAB_K})
SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
       round(avg(coalesce(d.logp, {LM_OOV_LOGP})), 6) AS mean_logprob,
       CASE WHEN round(avg(coalesce(d.logp, {LM_OOV_LOGP})), 6) < -8.0
            THEN 1 ELSE 0 END AS low_quality
FROM tok2 t LEFT JOIN dic d USING (token)
GROUP BY t.doc_id ORDER BY t.doc_id
"""


MIX_ALPHA = 0.7


def q_mix_weights(spark, sf_dir):
    """Temperature-based language sampling weights (the multilingual
    corpus-mixing step): p_l = n_l^alpha / sum_m n_m^alpha with
    alpha=0.7, plus the implied up/down-sampling boost p_l / share_l.
    One partial-aggregated groupBy to ~|langs| rows, then two
    broadcast joins of 1-row totals — nothing bigger than the language
    list ever moves."""
    d = load(spark, sf_dir, "documents")
    cnt = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    pw = cnt.withColumn("pow_cnt", F.pow("n_docs", F.lit(MIX_ALPHA)))
    tot = pw.agg(
        F.sum("pow_cnt").alias("tot_pow"), F.sum("n_docs").alias("tot_docs")
    )
    return (
        pw.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("pow_cnt") / F.col("tot_pow"), 6).alias("weight"),
            F.round(
                (F.col("pow_cnt") / F.col("tot_pow"))
                / (F.col("n_docs") / F.col("tot_docs")),
                6,
            ).alias("boost"),
        )
        .orderBy("lang")
    )


SQL_MIX_WEIGHTS = f"""
WITH c AS (SELECT lang, count(*)::BIGINT AS n_docs,
                  pow(count(*), {MIX_ALPHA}) AS pow_cnt
           FROM documents GROUP BY lang),
t AS (SELECT sum(pow_cnt) AS tot_pow, sum(n_docs) AS tot_docs FROM c)
SELECT lang, n_docs,
       round(pow_cnt / tot_pow, 6) AS weight,
       round((pow_cnt / tot_pow) / (n_docs::DOUBLE / tot_docs), 6) AS boost
FROM c, t ORDER BY lang
"""


def q_training_mix_report(spark, sf_dir):
    """End-to-end training-data pipeline composition — the flagship
    'what this engine is for' query: exact dedup (keep the min-doc_id
    copy per sha256), quality filter (composite score >= 0.5),
    deterministic 50% sample, then the per-language mix report
    (docs kept, token/BPE-token totals, mean quality). All stages are
    single-pass column expressions plus ONE dedup shuffle and ONE
    final aggregation — the 100-TB plan is scan -> hash-agg ->
    broadcast-semi-join -> filter -> partial agg."""
    from .operators.sampling import sample_predicate

    d = load(spark, sf_dir, "documents")
    t = F.col("text")
    keepers = (
        d.groupBy(F.sha2(t, 256).alias("__sha"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = (
        d.join(keepers, "doc_id", "left_semi")
        .withColumn("__q", T.quality_score(t))
        .where(F.col("__q") >= 0.5)
        .where(sample_predicate(F.col("doc_id"), 0.5, salt="mix-v1"))
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(T.token_count(t)).alias("total_tokens"),
            F.sum(T.bpe_token_count(t)).alias("total_bpe_tokens"),
            F.round(F.avg("__q"), 6).alias("mean_quality"),
        )
        .orderBy("lang")
    )


def _sql_training_mix_report() -> str:
    from .operators.sampling import _threshold_hex

    return f"""
WITH keepers AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
feats AS (
  SELECT d.doc_id, d.lang, d.text, {_DUCK_TOKS} AS toks,
         len(regexp_extract_all(lower(d.text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_bpe,
         (length(d.text) - length(regexp_replace(d.text, '[.,;:!?''"()\\[\\]{{}}\\-]', '', 'g')))::DOUBLE
             / length(d.text) AS pr
  FROM documents d JOIN keepers k ON d.doc_id = k.doc_id
),
q AS (
  SELECT doc_id, lang, len(toks) AS n_tokens, n_bpe,
         round(0.4 * least(len(toks) / 100.0, 1.0)
             + 0.3 * (1.0 - least(pr * 5, 1.0))
             + 0.3 * least(list_sum(list_transform(toks, x -> CASE WHEN x IN
                 ('the','a','and','of','to','in','is','on','for','with')
                 THEN 1 ELSE 0 END))::DOUBLE / len(toks) * 4, 1.0), 6) AS quality
  FROM feats
)
SELECT lang, count(*) AS n_docs,
       sum(n_tokens)::BIGINT AS total_tokens,
       sum(n_bpe)::BIGINT AS total_bpe_tokens,
       round(avg(quality), 6) AS mean_quality
FROM q
WHERE quality >= 0.5
  AND substr(md5(doc_id::VARCHAR || 'mix-v1'), 1, 8) < '{_threshold_hex(0.5)}'
GROUP BY lang ORDER BY lang
"""


SQL_TRAINING_MIX_REPORT = _sql_training_mix_report()


def q_simhash_pairs(spark, sf_dir):
    d = load(spark, sf_dir, "documents")
    return D.simhash_pairs(d, max_hamming=2, group_cols=["lang"]).orderBy("doc_a", "doc_b")


def _sql_simhash_pairs() -> str:
    from .operators.dedup import SIMHASH_BITS

    sums = ",\n    ".join(
        f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(SIMHASH_BITS)
    )
    sim = " + ".join(
        f"CASE WHEN s{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(SIMHASH_BITS)
    )
    return f"""
WITH tok AS (SELECT doc_id, unnest({_DUCK_TOKS}) AS tok FROM documents),
h AS (SELECT doc_id, {_duck_hash60('tok')} AS h FROM tok),
s AS (SELECT doc_id, {sums} FROM h GROUP BY doc_id),
sim AS (SELECT s.doc_id, d.lang, ({sim})::BIGINT AS simhash
        FROM s JOIN documents d ON s.doc_id = d.doc_id)
SELECT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sim a JOIN sim b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
ORDER BY doc_a, doc_b
"""


SQL_SIMHASH_PAIRS = _sql_simhash_pairs()


# -------------------------------------------------------------- similarity


def q_embedding_neardup(spark, sf_dir):
    e = emb(spark, sf_dir)
    pairs = S.cosine_pairs(e, threshold=0.4, block_size=2048)
    return pairs.select(
        "doc_a", "doc_b", F.round("cos", 4).alias("cos")
    ).orderBy("doc_a", "doc_b")


SQL_EMBEDDING_NEARDUP = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, list_transform(emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))) AS u
      FROM e),
p AS (SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
        list_sum(list_transform(list_zip(a.u, b.u), q -> q[1] * q[2])) AS cos
      FROM n a JOIN n b ON a.vec_id < b.vec_id)
SELECT doc_a, doc_b, round(cos, 4) AS cos FROM p WHERE cos >= 0.4 ORDER BY doc_a, doc_b
"""


def q_quantize_embeddings(spark, sf_dir):
    """Int8 symmetric quantization round-trip quality per vector
    (operators/quantize.py): global max-|x| scale (1-row broadcast),
    map-side quantize/dequantize, cosine + max elementwise error."""
    from .operators.quantize import quantization_report

    e = emb(spark, sf_dir)
    return quantization_report(e, "row_id", "features").orderBy("row_id")


SQL_QUANTIZE_EMBEDDINGS = """
WITH e AS (SELECT vec_id AS row_id, embedding::DOUBLE[] AS f FROM embeddings),
s AS (SELECT max(greatest(abs(list_min(f)), abs(list_max(f)))) AS sc FROM e),
qd AS (SELECT row_id, f,
         list_transform(f, x ->
           greatest(least(floor(x / sc * 127 + 0.5), 127), -127) * sc / 127) AS q
       FROM e, s)
SELECT row_id,
  round(list_sum(list_transform(range(1, len(f)+1), i -> f[i]*q[i]))
        / sqrt(list_sum(list_transform(f, x -> x*x))
               * list_sum(list_transform(q, x -> x*x))), 6) AS cos_sim,
  round(list_max(list_transform(range(1, len(f)+1), i -> abs(f[i]-q[i]))), 6)
    AS max_abs_err
FROM qd ORDER BY row_id
"""


def q_cosine_topk(spark, sf_dir):
    e = emb(spark, sf_dir)
    out = S.cosine_topk_join(e, k=3, block_size=2048)
    return out.select(
        "row_id", "rn", "nbr_id", F.round("cos", 4).alias("cos")
    ).orderBy("row_id", "rn")


SQL_COSINE_TOPK = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
n AS (SELECT vec_id, list_transform(emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))) AS u
      FROM e),
p AS (SELECT a.vec_id AS row_id, b.vec_id AS nbr_id,
        list_sum(list_transform(list_zip(a.u, b.u), q -> q[1] * q[2])) AS cos
      FROM n a JOIN n b ON a.vec_id <> b.vec_id),
r AS (SELECT row_id, nbr_id, cos,
        row_number() OVER (PARTITION BY row_id ORDER BY cos DESC, nbr_id ASC) AS rn
      FROM p)
SELECT row_id, rn, nbr_id, round(cos, 4) AS cos FROM r WHERE rn <= 3 ORDER BY row_id, rn
"""


def q_rp_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket sizes (scale path for ANN /
    near-dup candidate generation). The fixed-seed hyperplanes are a
    *parameter*, so the DuckDB oracle inlines them as double literals
    (same generated-SQL pattern as _sql_minhash_pairs)."""
    e = emb(spark, sf_dir)
    b = S.rp_lsh_buckets(e, dim=64, n_planes=12)
    return b.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs")).orderBy("bucket")


def _duck_sig(n_planes: int = 12, dim: int = 64, seed: int = 42) -> str:
    """Sign-signature SQL mirroring rp_lsh_buckets bit-for-bit: each
    plane's dot product is the same left-associated sum of
    emb[j] * plane_literal that Spark codegen evaluates, so both
    engines make identical >= 0 sign decisions."""
    planes = S._hyperplanes(dim, n_planes, seed)
    terms = []
    for i in range(n_planes):
        dot = " + ".join(f"emb[{j + 1}] * {float(planes[i, j])!r}" for j in range(dim))
        terms.append(f"CASE WHEN ({dot}) >= 0 THEN {1 << i} ELSE 0 END")
    return "(" + " + ".join(terms) + ")::BIGINT"


def _sql_rp_lsh_buckets() -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS (SELECT vec_id, {_duck_sig()} AS bucket FROM e)
SELECT bucket, count(*) AS n_vecs FROM s GROUP BY bucket ORDER BY bucket
"""


SQL_RP_LSH_BUCKETS = _sql_rp_lsh_buckets()


# LSH parameters for the catalogue near-dup operating point (cos >=
# 0.4): chosen by the recall formula so at-threshold recall >= 0.85
# (measured 0.83 vs the brute twin at sf0.01 — tests/test_similarity.py)
ANN_NEARDUP_PLANES, ANN_NEARDUP_BANDS = S.choose_lsh_params(0.4)


def q_embedding_neardup_ann(spark, sf_dir):
    """The verified ANN near-dup path: banded RP-LSH candidates
    (choose_lsh_params picks bands/bits per threshold, OR-amplified) +
    exact-cosine refine — the scale-safe replacement for the
    brute-force q_embedding_neardup (recall measured against it in
    tests/test_similarity.py)."""
    e = emb(spark, sf_dir)
    pairs = S.ann_neardup_pairs(
        e, threshold=0.4, dim=64,
        n_planes=ANN_NEARDUP_PLANES, n_bands=ANN_NEARDUP_BANDS,
    )
    return pairs.select(
        "doc_a", "doc_b", F.round("cos", 4).alias("cos")
    ).orderBy("doc_a", "doc_b")


def _sql_embedding_neardup_ann(
    n_planes: int = ANN_NEARDUP_PLANES, n_bands: int = ANN_NEARDUP_BANDS
) -> str:
    base_w, extra = divmod(n_planes, n_bands)
    band_rows, start = [], 0
    for i in range(n_bands):
        w = base_w + (1 if i < extra else 0)
        band_rows.append(
            f"SELECT vec_id, {i} AS band_id, (bucket >> {start}) & {(1 << w) - 1} "
            f"AS band_key FROM s"
        )
        start += w
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS MATERIALIZED (SELECT vec_id, {_duck_sig(n_planes)} AS bucket FROM e),
banded AS ({bands}),
cand AS (SELECT DISTINCT a.vec_id AS doc_a, b.vec_id AS doc_b
         FROM banded a JOIN banded b
           ON a.band_id = b.band_id AND a.band_key = b.band_key
          AND a.vec_id < b.vec_id),
n AS (SELECT vec_id,
        list_transform(emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))) AS u
      FROM e),
p AS (SELECT c.doc_a, c.doc_b,
        list_sum(list_transform(list_zip(na.u, nb.u), q -> q[1] * q[2])) AS cos
      FROM cand c JOIN n na ON c.doc_a = na.vec_id JOIN n nb ON c.doc_b = nb.vec_id)
SELECT doc_a, doc_b, round(cos, 4) AS cos FROM p WHERE cos >= 0.4 ORDER BY doc_a, doc_b
"""


SQL_EMBEDDING_NEARDUP_ANN = _sql_embedding_neardup_ann()


def q_cosine_topk_ann(spark, sf_dir):
    """Approximate cosine top-k via banded RP-LSH candidates + exact
    refine — the LSH-bucketed similarity-search scale path; the oracle
    reproduces the identical candidate set (inlined hyperplanes), so
    the comparison checks the whole ANN pipeline, not just the
    refine."""
    e = emb(spark, sf_dir)
    out = S.ann_cosine_topk(e, k=3, dim=64, n_planes=12, n_bands=3)
    return out.select(
        "row_id", "rn", "nbr_id", F.round("cos", 4).alias("cos")
    ).orderBy("row_id", "rn")


def _sql_cosine_topk_ann(n_planes: int = 12, n_bands: int = 3, k: int = 3) -> str:
    base_w, extra = divmod(n_planes, n_bands)
    band_rows, start = [], 0
    for i in range(n_bands):
        w = base_w + (1 if i < extra else 0)
        band_rows.append(
            f"SELECT vec_id, {i} AS band_id, (bucket >> {start}) & {(1 << w) - 1} "
            f"AS band_key FROM s"
        )
        start += w
    bands = "\nUNION ALL\n".join(band_rows)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
s AS MATERIALIZED (SELECT vec_id, {_duck_sig()} AS bucket FROM e),
banded AS ({bands}),
cand AS (SELECT DISTINCT a.vec_id AS row_id, b.vec_id AS nbr_id
         FROM banded a JOIN banded b
           ON a.band_id = b.band_id AND a.band_key = b.band_key
          AND a.vec_id <> b.vec_id),
n AS (SELECT vec_id,
        list_transform(emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))) AS u
      FROM e),
p AS (SELECT c.row_id, c.nbr_id,
        list_sum(list_transform(list_zip(na.u, nb.u), q -> q[1] * q[2])) AS cos
      FROM cand c JOIN n na ON c.row_id = na.vec_id JOIN n nb ON c.nbr_id = nb.vec_id),
r AS (SELECT row_id, nbr_id, cos,
        row_number() OVER (PARTITION BY row_id ORDER BY cos DESC, nbr_id ASC) AS rn
      FROM p)
SELECT row_id, rn, nbr_id, round(cos, 4) AS cos FROM r WHERE rn <= {k}
ORDER BY row_id, rn
"""


SQL_COSINE_TOPK_ANN = _sql_cosine_topk_ann()


# IVF catalogue operating point: 16 cells, 3 Lloyd iterations,
# multi-assign 3, probe 3 — recall 0.84 vs the brute twin at sf0.01
# (candidate fraction ~0.56; near-uniform synthetic embeddings make
# recall ~linear in that fraction, see ivf_topk's docstring caveat)
IVF_CLUSTERS, IVF_ITERS, IVF_ASSIGN, IVF_PROBE, IVF_K = 16, 3, 3, 3, 3


def q_cosine_topk_ivf(spark, sf_dir):
    """IVF approximate cosine top-k — the inverted-file ANN scale path
    beside the RP-LSH variant: a distributed spherical-Lloyd fit
    (only the C x d model reaches the driver), coarse-quantize every
    vector to its nearest cell, probe each query's n_probe nearest
    cells, exact-cosine refine via an equi-join on the cell id (never
    all-pairs). The generated oracle refits the same deterministic
    model in numpy and inlines the centroids as literals (same pattern
    as the 64-d PCA eigenvectors), so the comparison checks fit +
    assignment + probe + refine end-to-end. Recall vs the brute twin
    is measured in tests/test_similarity.py."""
    e = emb(spark, sf_dir)
    out = S.ivf_topk(
        e, k=IVF_K, n_clusters=IVF_CLUSTERS, n_iters=IVF_ITERS,
        n_probe=IVF_PROBE, n_assign=IVF_ASSIGN,
    )
    return out.select(
        "row_id", "rn", "nbr_id", F.round("cos", 4).alias("cos")
    ).orderBy("row_id", "rn")


def sql_cosine_topk_ivf(sf_dir: str) -> str | None:
    """Generated DuckDB oracle: centroids from the independent numpy
    fit (oracle.operators.ivf_centroids) inlined as list literals.
    Returns None when the parquet is unreadable (rows-only degrade)."""
    import numpy as np

    try:
        import pyarrow.parquet as pq

        tb = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        ids = np.asarray(tb.column("vec_id").to_pylist())
        X = np.asarray(tb.column("embedding").to_pylist(), dtype=np.float64)
        X = X[np.argsort(ids)]
    except Exception:
        return None
    from .oracle.operators import ivf_centroids

    C = ivf_centroids(X, IVF_CLUSTERS, IVF_ITERS)
    rows = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(float(v)) for v in C[i]) + "])"
        for i in range(C.shape[0])
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
u AS (SELECT vec_id,
        list_transform(emb, x -> x / sqrt(list_sum(list_transform(emb, y -> y * y)))) AS u
      FROM e),
c AS (SELECT cid, cv::DOUBLE[] AS cv FROM (VALUES {rows}) t(cid, cv)),
sims AS (SELECT vec_id, cid,
           list_sum(list_transform(list_zip(u.u, c.cv), q -> q[1] * q[2])) AS sim
         FROM u CROSS JOIN c),
ranked AS (SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid ASC) AS crn
           FROM sims),
assign AS (SELECT vec_id AS nbr_id, cid FROM ranked WHERE crn <= {IVF_ASSIGN}),
probes AS (SELECT vec_id, cid FROM ranked WHERE crn <= {IVF_PROBE}),
cand AS (SELECT DISTINCT p.vec_id AS row_id, a.nbr_id
         FROM probes p JOIN assign a ON p.cid = a.cid AND p.vec_id <> a.nbr_id),
p AS (SELECT c.row_id, c.nbr_id,
        list_sum(list_transform(list_zip(ua.u, ub.u), q -> q[1] * q[2])) AS cos
      FROM cand c JOIN u ua ON c.row_id = ua.vec_id JOIN u ub ON c.nbr_id = ub.vec_id),
r AS (SELECT row_id, nbr_id, cos,
        row_number() OVER (PARTITION BY row_id ORDER BY cos DESC, nbr_id ASC) AS rn
      FROM p)
SELECT row_id, rn, nbr_id, round(cos, 4) AS cos FROM r WHERE rn <= {IVF_K}
ORDER BY row_id, rn
"""


def q_cosine_topk_ivf_index(spark, sf_dir):
    """Persisted-IVF parity: build the index artifacts (frozen
    centroids + unit vectors + inverted lists, operators/similarity.py
    ivf_index_build), then search the same corpus against the stored
    state. Output must equal the in-session ivf_topk (same
    deterministic fit, same assignment/probe/refine conventions), so
    the generated cosine_topk_ivf oracle applies verbatim — the row
    value-checks the round-trip through parquet persistence."""
    import tempfile

    e = emb(spark, sf_dir)
    ref = tempfile.mkdtemp(prefix="ivfidx_q_")
    S.ivf_index_build(
        e, ref, n_clusters=IVF_CLUSTERS, n_iters=IVF_ITERS, n_assign=IVF_ASSIGN
    )
    out = S.ivf_index_search(e, ref, k=IVF_K, n_probe=IVF_PROBE)
    return out.select(
        "row_id", "rn", "nbr_id", F.round("cos", 4).alias("cos")
    ).orderBy("row_id", "rn")


# -------------------------------------------------------------- multimodal


def q_multimodal_metadata(spark, sf_dir):
    """Binary-payload metadata extraction via Arrow mapInPandas; the
    deterministic fake header parse is mirrored in the oracle SQL."""
    d = load(spark, sf_dir, "documents")
    payload = attach_binary_payload(d)
    return extract_metadata(payload).orderBy("doc_id")


SQL_MULTIMODAL_METADATA = """
SELECT doc_id,
       strlen(text) AS n_bytes,
       sha256(text) AS payload_sha,
       16 + ('0x' || substr(sha256(text), 1, 2))::INT % 64 AS width,
       16 + ('0x' || substr(sha256(text), 3, 2))::INT % 64 AS height,
       1 + ('0x' || substr(sha256(text), 5, 2))::INT % 3 AS channels
FROM documents ORDER BY doc_id
"""


def q_image_pixel_stats(spark, sf_dir):
    """REAL-codec decode path end-to-end: deterministic PPM (even ids)
    / 24-bit BMP (odd ids) payloads synthesized per doc, decoded by
    the built-in dependency-free codecs (operators/multimodal.py,
    decode_image(fake=False)), aggregated to exact integer pixel sums
    the closed-form oracle reproduces — value-checked evidence that
    the non-fake codec branch executes, not just raises."""
    from .operators.multimodal import image_pixel_stats, synthesize_image_payloads

    d = load(spark, sf_dir, "documents")
    payloads = synthesize_image_payloads(d)
    return image_pixel_stats(payloads, fake=False).orderBy("doc_id")


SQL_IMAGE_PIXEL_STATS = """
WITH dims AS (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + doc_id % 7 AS h FROM documents),
ks AS (SELECT doc_id, w, h, unnest(range(0, w * h * 3)) AS k FROM dims),
px AS (SELECT doc_id, w, h, ((doc_id * 7 + k) % 256)::BIGINT AS v FROM ks)
SELECT doc_id, any_value(w)::INT AS width, any_value(h)::INT AS height,
       sum(v)::BIGINT AS pix_sum, sum(v * v)::BIGINT AS pix_sqsum
FROM px GROUP BY doc_id ORDER BY doc_id
"""


# -------------------------------------------------- prepare_corpus (flagship)

PREP_SAMPLE_FRACTION = 0.5


def q_prepare_corpus(spark, sf_dir):
    """The flagship end-to-end training-corpus pipeline
    (pipeline.prepare_corpus): exact dedup -> benchmark
    decontamination (bench = doc_id % 37 == 0, as contamination_check)
    -> quality filter -> deterministic 50% sample -> global md5
    shuffle rank -> 64/16 token chunking -> contiguous 1500-token
    shards. Every stage is an already-oracled operator; this row
    value-checks their COMPOSITION against the stage oracles chained
    as CTEs."""
    from .pipeline import PrepareConfig, prepare_corpus

    d = load(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 37 == 0)
    cfg = PrepareConfig(
        sample_fraction=PREP_SAMPLE_FRACTION,
        chunk_tokens=CHUNK_TOKENS,
        chunk_overlap=CHUNK_OVERLAP,
        shard_budget_tokens=TOKEN_SHARD_BUDGET,
    )
    return prepare_corpus(d, bench, cfg).orderBy("doc_id", "chunk_id")


def _sql_prepare_corpus() -> str:
    from .operators.sampling import _threshold_hex

    return f"""
WITH keep AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
d0 AS (SELECT d.doc_id, d.text FROM documents d JOIN keep USING (doc_id)),
bench AS (
  SELECT DISTINCT unnest(sh) AS shingle
  FROM (SELECT {_DUCK_SHINGLES} AS sh FROM documents WHERE doc_id % 37 = 0)),
tr AS (SELECT doc_id, text, {_DUCK_SHINGLES} AS sh FROM d0),
shared AS (
  SELECT e.doc_id, count(*) AS c
  FROM (SELECT doc_id, unnest(sh) AS shingle FROM tr) e
  JOIN bench b USING (shingle) GROUP BY 1),
clean AS (
  SELECT t.doc_id, t.text FROM tr t LEFT JOIN shared s USING (doc_id)
  WHERE coalesce(s.c, 0)::DOUBLE / greatest(len(t.sh), 1) < 0.05),
q AS (
  SELECT doc_id, text, {_DUCK_TOKS} AS toks,
         (length(text) - length(regexp_replace(text,
            '[.,;:!?''"()\\[\\]{{}}\\-]', '', 'g')))::DOUBLE / length(text) AS pr
  FROM clean),
quality AS (
  SELECT doc_id, text, toks FROM q
  WHERE round(0.4 * least(len(toks) / 100.0, 1.0)
      + 0.3 * (1.0 - least(pr * 5, 1.0))
      + 0.3 * least(list_sum(list_transform(toks, x -> CASE WHEN x IN
          ('the','a','and','of','to','in','is','on','for','with')
          THEN 1 ELSE 0 END))::DOUBLE / len(toks) * 4, 1.0), 6) >= 0.3),
sampled AS (
  SELECT doc_id, text, toks FROM quality
  WHERE substr(md5(doc_id::VARCHAR || 'prep-v1'), 1, 8)
        < '{_threshold_hex(PREP_SAMPLE_FRACTION)}'),
ranked AS (
  SELECT doc_id, toks,
         row_number() OVER (ORDER BY
           ('0x' || substr(md5(doc_id::VARCHAR || 'epoch0'), 1, 15))::BIGINT
         )::BIGINT AS shuffle_rank
  FROM sampled),
p AS (SELECT doc_id, toks, shuffle_rank, len(toks) AS n,
        greatest(1, ceil((len(toks) - {CHUNK_OVERLAP})::DOUBLE / {_STRIDE})::BIGINT)
          AS n_chunks
      FROM ranked),
c AS (SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, toks, n,
             shuffle_rank FROM p),
chunks AS (
  SELECT doc_id, chunk_id::INTEGER AS chunk_id,
         len(toks[chunk_id * {_STRIDE} + 1 :
                  least(chunk_id * {_STRIDE} + {CHUNK_TOKENS}, n)])::INTEGER
           AS n_chunk_tokens,
         array_to_string(toks[chunk_id * {_STRIDE} + 1 :
                  least(chunk_id * {_STRIDE} + {CHUNK_TOKENS}, n)], ' ')
           AS chunk_text,
         shuffle_rank
  FROM c),
sharded AS (
  SELECT *, sum(n_chunk_tokens) OVER (ORDER BY shuffle_rank, chunk_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM chunks)
SELECT doc_id, chunk_id, n_chunk_tokens, chunk_text, shuffle_rank,
       ((cum - n_chunk_tokens) // {TOKEN_SHARD_BUDGET})::BIGINT AS shard_id
FROM sharded ORDER BY doc_id, chunk_id
"""


SQL_PREPARE_CORPUS = _sql_prepare_corpus()


def q_redact_docs(spark, sf_dir):
    """PII scrub (emails / IPv4s / >=32-char hex secrets -> placeholder
    tokens) — the classic pre-training redaction stage, one chained
    regexp_replace projection (functions/text.py PII_PATTERNS).

    The synthetic corpus contains no digits by construction, so the
    row plants deterministic PII per document INSIDE the query (both
    engines compute the identical plant from doc_id) — the
    driver compare then genuinely exercises cross-engine regex parity
    (match counts + sha256 of the redacted text), not 500 no-op rows.
    """
    from .functions.text import PII_PATTERNS, pii_count, redact_pii

    d = load(spark, sf_dir, "documents")
    did = F.col("doc_id").cast("string")
    planted = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), did,
            F.lit("@example.com from 10.0."),
            (F.col("doc_id") % 256).cast("string"), F.lit(".7 key "),
            F.md5(did),
        ).alias("text"),
    )
    counts = [
        pii_count(F.col("text"), pat).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    return planted.select(
        "doc_id",
        *counts,
        F.sha2(redact_pii(F.col("text")), 256).alias("redacted_sha"),
    ).orderBy("doc_id")


def _sql_redact_docs() -> str:
    from .functions.text import PII_PATTERNS

    plant = (
        "text || ' contact user' || doc_id || '@example.com from 10.0.' "
        "|| (doc_id % 256) || '.7 key ' || md5(doc_id::VARCHAR)"
    )
    counts = ", ".join(
        f"len(regexp_extract_all(text, '{pat}'))::INT AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    redacted = "text"
    for _, pat, token in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{token}', 'g')"
    return (
        f"WITH p AS (SELECT doc_id, {plant} AS text FROM documents) "
        f"SELECT doc_id, {counts}, sha256({redacted}) AS redacted_sha "
        "FROM p ORDER BY doc_id"
    )


SQL_REDACT_DOCS = _sql_redact_docs()


TEXT_QUERIES = {
    "redact_docs": q_redact_docs,
    "text_features": q_text_features,
    "lang_id": q_lang_id,
    "token_entropy": q_token_entropy,
    "fingerprint_docs": q_fingerprint_docs,
    "dedup_exact": q_dedup_exact,
    "winnow_pairs": q_winnow_pairs,
    "dedup_ngram_pairs": q_dedup_ngram_pairs,
    "minhash_pairs": q_minhash_pairs,
    "dedup_clusters": q_dedup_clusters,
    "sample_docs": q_sample_docs,
    "stratified_sample_docs": q_stratified_sample_docs,
    "contamination_check": q_contamination_check,
    "repetition_signals": q_repetition_signals,
    "token_shards": q_token_shards,
    "chunk_docs": q_chunk_docs,
    "chunk_dedup": q_chunk_dedup,
    "vocab_topk": q_vocab_topk,
    "bpe_merge_candidates": q_bpe_merge_candidates,
    "training_shuffle": q_training_shuffle,
    "mix_weights": q_mix_weights,
    "doc_logprob": q_doc_logprob,
    "training_mix_report": q_training_mix_report,
    "simhash_pairs": q_simhash_pairs,
    "embedding_neardup": q_embedding_neardup,
    "quantize_embeddings": q_quantize_embeddings,
    "cosine_topk": q_cosine_topk,
    "rp_lsh_buckets": q_rp_lsh_buckets,
    "embedding_neardup_ann": q_embedding_neardup_ann,
    "cosine_topk_ann": q_cosine_topk_ann,
    "cosine_topk_ivf": q_cosine_topk_ivf,
    "cosine_topk_ivf_index": q_cosine_topk_ivf_index,
    "minhash_index_pairs": q_minhash_index_pairs,
    "minhash_index_probe": q_minhash_index_probe,
    "neardup_ingest": q_neardup_ingest,
    "multimodal_metadata": q_multimodal_metadata,
    "image_pixel_stats": q_image_pixel_stats,
    "prepare_corpus": q_prepare_corpus,
}

TEXT_ORACLES = {
    "redact_docs": SQL_REDACT_DOCS,
    "text_features": SQL_TEXT_FEATURES,
    "lang_id": SQL_LANG_ID,
    "token_entropy": SQL_TOKEN_ENTROPY,
    "fingerprint_docs": SQL_FINGERPRINT_DOCS,
    "dedup_exact": SQL_DEDUP_EXACT,
    "winnow_pairs": SQL_WINNOW_PAIRS,
    "dedup_ngram_pairs": SQL_DEDUP_NGRAM_PAIRS,
    "minhash_pairs": SQL_MINHASH_PAIRS,
    "dedup_clusters": SQL_DEDUP_CLUSTERS,
    "sample_docs": SQL_SAMPLE_DOCS,
    "stratified_sample_docs": SQL_STRATIFIED_SAMPLE_DOCS,
    "contamination_check": SQL_CONTAMINATION_CHECK,
    "repetition_signals": SQL_REPETITION_SIGNALS,
    "token_shards": SQL_TOKEN_SHARDS,
    "chunk_docs": SQL_CHUNK_DOCS,
    "chunk_dedup": SQL_CHUNK_DEDUP,
    "vocab_topk": SQL_VOCAB_TOPK,
    "bpe_merge_candidates": SQL_BPE_MERGE_CANDIDATES,
    "training_shuffle": SQL_TRAINING_SHUFFLE,
    "mix_weights": SQL_MIX_WEIGHTS,
    "doc_logprob": SQL_DOC_LOGPROB,
    "training_mix_report": SQL_TRAINING_MIX_REPORT,
    "simhash_pairs": SQL_SIMHASH_PAIRS,
    "embedding_neardup": SQL_EMBEDDING_NEARDUP,
    "quantize_embeddings": SQL_QUANTIZE_EMBEDDINGS,
    "cosine_topk": SQL_COSINE_TOPK,
    "rp_lsh_buckets": SQL_RP_LSH_BUCKETS,
    "embedding_neardup_ann": SQL_EMBEDDING_NEARDUP_ANN,
    "cosine_topk_ann": SQL_COSINE_TOPK_ANN,
    "minhash_index_pairs": SQL_MINHASH_PAIRS,
    "minhash_index_probe": SQL_MINHASH_INDEX_PROBE,
    "neardup_ingest": SQL_NEARDUP_INGEST,
    "multimodal_metadata": SQL_MULTIMODAL_METADATA,
    "image_pixel_stats": SQL_IMAGE_PIXEL_STATS,
    "prepare_corpus": SQL_PREPARE_CORPUS,
}
