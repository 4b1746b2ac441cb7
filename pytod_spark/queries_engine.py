"""Query catalogue, part 3: the validation engine end-to-end on the
driver's documents table — per-lang drift verdicts, fully
oracle-checked (features -> per-lang HBOS -> global threshold ->
per-partition pass/fail)."""

from __future__ import annotations


from pyspark.sql import functions as F

from .detectors import HBOS


def load(spark, sf_dir, name):
    # deferred: importing .queries at module level would make THIS
    # module unimportable on its own (queries.py's trailing
    # _merge_extra() imports us back mid-initialization)
    from .queries import load as _load

    return _load(spark, sf_dir, name)

MAX_RATE = 0.15  # verdict bound (1.5 x contamination)


def _doc_features(spark, sf_dir):
    """(lang, doc_id, features=[n_chars, token_entropy]) via the same
    closed-form entropy as the oracle SQL."""
    d = load(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
    tc = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    ent = tc.groupBy("doc_id").agg(
        (F.log(F.sum("c")) - F.sum(F.col("c") * F.log("c")) / F.sum("c")).alias("ent")
    )
    return d.join(ent, "doc_id").select(
        "lang",
        F.col("doc_id").alias("row_id"),
        F.array(F.col("n_chars").cast("double"), F.col("ent")).alias("features"),
    )


def q_drift_verdicts(spark, sf_dir):
    """Engine verdict stage: per-lang HBOS drift scores, one global
    percentile threshold, per-partition outlier rate + pass/fail
    (ValidationSuite stage-B semantics)."""
    feats = _doc_features(spark, sf_dir)
    scores = HBOS(n_bins=10, alpha=0.1, strategy="distributed").score_df(
        feats, group_cols=["lang"]
    )
    thr = scores.agg(F.percentile("score", F.lit(0.9)).alias("thr"))
    labeled = scores.crossJoin(F.broadcast(thr)).withColumn(
        "label", (F.col("score") > F.col("thr")).cast("int")
    )
    return (
        labeled.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(F.avg("label"), 6).alias("outlier_rate"),
            # pass/fail on the UNROUNDED rate, exactly like the oracle
            # SQL (a rate in (MAX_RATE, MAX_RATE + 5e-7] rounds down to
            # the boundary and would flip the verdict)
            (F.avg("label") <= MAX_RATE).cast("int").alias("drift_pass"),
        )
        .orderBy("lang")
    )


SQL_DRIFT_VERDICTS = f"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
             FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2),
ent AS (SELECT doc_id, ln(sum(c)) - sum(c * ln(c)) / sum(c) AS ent FROM tc GROUP BY doc_id),
feat AS (
  SELECT d.lang, d.doc_id, 0 AS j, d.n_chars::DOUBLE AS v FROM documents d
  UNION ALL
  SELECT d.lang, d.doc_id, 1 AS j, e.ent AS v FROM documents d JOIN ent e USING (doc_id)
),
st AS (SELECT lang, j, min(v) AS lo, max(v) AS hi, count(*) AS n FROM feat GROUP BY 1, 2),
jn AS (SELECT f.lang, f.doc_id, f.j, f.v, st.lo, st.n,
              CASE WHEN st.hi > st.lo THEN (st.hi - st.lo) / 10 ELSE 1.0 END AS w
       FROM feat f JOIN st USING (lang, j)),
hist AS (SELECT lang, j, CAST(least(greatest(floor((v - lo) / w), 0), 9) AS INT) AS bin,
                count(*) AS cnt, any_value(w) AS w2, any_value(n) AS n2
         FROM jn GROUP BY 1, 2, 3),
dens AS (SELECT lang, j, bin, cnt / w2 / n2 AS density FROM hist),
scored AS (SELECT lang, doc_id, j,
                  CAST(least(greatest(ceil((v - lo) / w), 1), 10) - 1 AS INT) AS bin
           FROM jn),
fs AS (SELECT s.lang, s.doc_id, log2(coalesce(d.density, 0) + 0.1) AS f
       FROM scored s LEFT JOIN dens d USING (lang, j, bin)),
sc AS (SELECT lang, doc_id, -sum(f) AS score FROM fs GROUP BY 1, 2),
thr AS (SELECT quantile_cont(score, 0.9) AS t FROM sc),
lab AS (SELECT lang, CASE WHEN score > t THEN 1 ELSE 0 END AS label FROM sc CROSS JOIN thr)
SELECT lang, count(*) AS n_rows, round(avg(label), 6) AS outlier_rate,
       CASE WHEN avg(label) <= {MAX_RATE} THEN 1 ELSE 0 END AS drift_pass
FROM lab GROUP BY lang ORDER BY lang
"""


def q_knn_drift_labels(spark, sf_dir):
    """Reference label semantics end-to-end on embeddings: KNN scores +
    per-run percentile threshold + labels (pytod base.py:414-428) —
    the flagship entry() query in oracle-checkable form."""
    from .operators.block_knn import knn_scores_df
    from .queries import emb

    s = knn_scores_df(emb(spark, sf_dir), n_neighbors=5, block_size=2048)
    thr = s.agg(F.percentile("score", F.lit(0.9)).alias("thr"))
    return (
        s.crossJoin(F.broadcast(thr))
        .select(
            "row_id",
            F.round("score", 4).alias("score"),
            F.round("thr", 4).alias("threshold"),
            (F.col("score") > F.col("thr")).cast("int").alias("label"),
        )
        .orderBy("row_id")
    )


SQL_KNN_DRIFT_LABELS = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
d AS (SELECT a.vec_id AS ai, b.vec_id AS bi, list_distance(a.emb, b.emb) AS dist
      FROM e a CROSS JOIN e b),
r AS (SELECT ai, dist, row_number() OVER (PARTITION BY ai ORDER BY dist, bi) AS rn FROM d),
s AS (SELECT ai AS row_id, dist AS score FROM r WHERE rn = 6),
thr AS (SELECT quantile_cont(score, 0.9) AS t FROM s)
SELECT row_id, round(score, 4) AS score, round(t, 4) AS threshold,
       CASE WHEN score > t THEN 1 ELSE 0 END AS label
FROM s CROSS JOIN thr ORDER BY row_id
"""


def q_ecdf_window_rank(spark, sf_dir):
    """Conventional ECDF (rank/n) per event_type — the corrected
    counterpart of the reference quirk, used by engine consumers that
    want a true per-row ECDF. Ranks through grouped_ranks: above the
    SMALL_RANK_ROWS budget the bucketed two-pass core (event_type is
    low-cardinality — an unconditional window would sort each type's
    whole history in one task at scale), the plain window below it
    (same dispatch + rationale as queries.q_ecdf_events)."""
    from .operators.ranking import grouped_ranks, with_group_size

    ev = load(spark, sf_dir, "events")
    t = grouped_ranks(
        ev.select("event_id", "event_type", "value"),
        key="value", tie="event_id", part_cols=["event_type"], out_asc="__rk",
    )
    t = with_group_size(t, ["event_type"], out="__n")
    return t.select(
        "event_id",
        "event_type",
        F.round((F.col("__rk") + 1) / F.col("__n"), 6).alias("ecdf"),
    ).orderBy("event_id")


SQL_ECDF_WINDOW_RANK = """
SELECT event_id, event_type,
       round(row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id ASC)
             / (count(*) OVER (PARTITION BY event_type))::DOUBLE, 6) AS ecdf
FROM events ORDER BY event_id
"""


def q_constraint_report(spark, sf_dir):
    """Declarative row-constraint check (validation/constraints.py
    RowConstraint) over the documents table: per-(lang, rule) counts,
    violation rate, and pass/fail against each rule's own
    max_violation_rate. One partial-aggregating groupBy — the exact
    engine path ValidationSuite's constraint stage runs; predicates
    are pure SQL, so the DuckDB oracle evaluates the same strings
    verbatim (NULL-hostile: a NULL predicate result is a violation)."""
    from .validation.constraints import RowConstraint, row_constraint_summary

    d = load(spark, sf_dir, "documents")
    cs = [
        RowConstraint("len_bound", "n_chars <= 500"),
        RowConstraint("len_soft", "n_chars <= 520", max_violation_rate=0.08),
        RowConstraint("src_format", "source LIKE 'src%'"),
    ]
    return (
        row_constraint_summary(d, cs, ["lang"])
        .select(
            "lang", "constraint", "n_rows", "n_violations",
            F.round("violation_rate", 6).alias("violation_rate"), "passed",
        )
        .orderBy("lang", "constraint")
    )


SQL_CONSTRAINT_REPORT = """
WITH g AS (
  SELECT lang, count(*) AS n,
         CAST(sum(CASE WHEN NOT coalesce(n_chars <= 500, false) THEN 1 ELSE 0 END) AS BIGINT) AS v_len,
         CAST(sum(CASE WHEN NOT coalesce(n_chars <= 520, false) THEN 1 ELSE 0 END) AS BIGINT) AS v_soft,
         CAST(sum(CASE WHEN NOT coalesce(source LIKE 'src%', false) THEN 1 ELSE 0 END) AS BIGINT) AS v_src
  FROM documents GROUP BY lang),
long AS (
  SELECT lang, 'len_bound' AS constraint, n, v_len AS v, 0.0 AS budget FROM g
  UNION ALL
  SELECT lang, 'len_soft', n, v_soft, 0.08 FROM g
  UNION ALL
  SELECT lang, 'src_format', n, v_src, 0.0 FROM g)
SELECT lang, "constraint", n AS n_rows, v AS n_violations,
       round(v / n::DOUBLE, 6) AS violation_rate,
       (v / n::DOUBLE) <= budget AS passed
FROM long ORDER BY lang, "constraint"
"""


def q_constraint_violation_docs(spark, sf_dir):
    """Row-level output of the same rules: each violating document
    with the sorted list of rules it broke (one output row per doc —
    no explode, the map-only plan of row_constraint_violations)."""
    from .validation.constraints import RowConstraint, row_constraint_violations

    d = load(spark, sf_dir, "documents")
    cs = [
        RowConstraint("len_bound", "n_chars <= 500"),
        RowConstraint("src_format", "source LIKE 'src%'"),
    ]
    return (
        row_constraint_violations(d, cs, keep_cols=["doc_id", "lang"])
        .select(
            "doc_id", "lang",
            F.array_join("failed_constraints", ",").alias("failed"),
        )
        .orderBy("doc_id")
    )


SQL_CONSTRAINT_VIOLATION_DOCS = """
SELECT doc_id, lang,
       concat_ws(',',
         CASE WHEN NOT coalesce(n_chars <= 500, false) THEN 'len_bound' END,
         CASE WHEN NOT coalesce(source LIKE 'src%', false) THEN 'src_format' END
       ) AS failed
FROM documents
WHERE NOT coalesce(n_chars <= 500, false)
   OR NOT coalesce(source LIKE 'src%', false)
ORDER BY doc_id
"""


ENGINE_QUERIES = {
    "drift_verdicts": q_drift_verdicts,
    "knn_drift_labels": q_knn_drift_labels,
    "ecdf_window_rank": q_ecdf_window_rank,
    "constraint_report": q_constraint_report,
    "constraint_violation_docs": q_constraint_violation_docs,
}

ENGINE_ORACLES = {
    "drift_verdicts": SQL_DRIFT_VERDICTS,
    "knn_drift_labels": SQL_KNN_DRIFT_LABELS,
    "ecdf_window_rank": SQL_ECDF_WINDOW_RANK,
    "constraint_report": SQL_CONSTRAINT_REPORT,
    "constraint_violation_docs": SQL_CONSTRAINT_VIOLATION_DOCS,
}
