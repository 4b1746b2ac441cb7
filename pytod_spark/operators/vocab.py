"""Tokenizer-training corpus statistics: per-language vocabulary
top-k and BPE-style merge-pair candidates.

The two corpus-level aggregations a tokenizer-training pipeline runs
before anything else (the reference engine has no analogue; this is
training-data pipeline surface like dedup/sampling):

* ``vocab_topk`` — per-language top-k tokens by term frequency with
  document frequency, the vocabulary candidate list.
* ``merge_pair_topk`` — global top-k adjacent token pairs by count,
  one iteration of the BPE merge-candidate scan (word-level analogue:
  the corpus bigram table).

100-TB shape: both are word-count-shaped — explode to (key, 1),
hash-aggregate with map-side combine (per-document token repetition
collapses BEFORE the shuffle, so shuffle volume is O(distinct keys
per map partition), not O(corpus tokens)), then a rank-window top-k
filter that Spark rewrites into a WindowGroupLimit partial/final pair
— each map task pre-trims to k rows before the exchange, so the
final per-language (or global) sort sees n_partitions * k rows, not
the vocabulary. Zipfian token skew is absorbed by the partial
aggregate: the hot key arrives at its reducer as one partial count
per map partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as T


def token_stats(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """(lang, token, tf, df): term frequency and document frequency
    per language. Two partial-aggregated hash shuffles (the classic
    two-level word count: per-doc counts first, so df = row count)."""
    ex = docs.select(
        F.col(lang_col).alias("lang"),
        F.col(id_col),
        F.explode(T.tokens(F.col(text_col))).alias("token"),
    ).where(F.col("token") != "")
    per_doc = ex.groupBy("lang", "token", id_col).agg(
        F.count(F.lit(1)).alias("tf_doc")
    )
    return per_doc.groupBy("lang", "token").agg(
        F.sum("tf_doc").alias("tf"), F.count(F.lit(1)).alias("df")
    )


def vocab_topk(docs: DataFrame, k: int = 10, id_col: str = "doc_id",
               text_col: str = "text", lang_col: str = "lang") -> DataFrame:
    """Per-language top-k vocabulary candidates by term frequency
    (token asc tiebreak for determinism)."""
    st = token_stats(docs, id_col, text_col, lang_col)
    w = Window.partitionBy("lang").orderBy(
        F.col("tf").desc(), F.col("token").asc()
    )
    return (
        st.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("lang", "rank", "token", "tf", "df")
    )


def merge_pair_topk(docs: DataFrame, k: int = 20,
                    text_col: str = "text") -> DataFrame:
    """Global top-k adjacent token pairs by corpus count — the BPE
    merge-candidate scan at word granularity. The empty partition
    spec is safe: Catalyst rewrites the rank<=k filter into
    TakeOrderedAndProject(limit=k) below the window (per-partition
    top-k heap, merged on the driver), so the only WindowExec runs
    over exactly k rows."""
    ex = docs.select(
        F.explode(T.word_grams(F.col(text_col), 2)).alias("pair")
    )
    cnt = ex.groupBy("pair").agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy(F.col("cnt").desc(), F.col("pair").asc())
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("rank", "pair", "cnt")
    )


def unigram_logprob(docs: DataFrame, k: int = 1000, oov_logp: float = -12.0,
                    id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document mean token log-prob under the corpus's own top-k
    unigram distribution (tokens outside the dictionary score
    ``oov_logp``) — the LM-based quality filter. The truncation plans
    as TakeOrderedAndProject; scoring is one exploded pass with a
    broadcast left join (see queries_text.q_doc_logprob for the
    catalogue row + oracle)."""
    from ..functions import text as T

    ex = docs.select(
        id_col, F.explode(T.tokens(F.col(text_col))).alias("token")
    ).where(F.col("token") != "")
    # one word-count aggregation over the exploded tokens (the
    # per-(lang, token, doc) grouping token_stats does is near-unique
    # keyed, so its map-side combine collapses almost nothing and the
    # unused document frequency isn't worth a corpus-scale shuffle)
    freq = ex.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
    tot = freq.agg(F.sum("tf").alias("tot"))
    dic = F.broadcast(
        freq.crossJoin(F.broadcast(tot))
        .withColumn("rnk", F.row_number().over(
            Window.orderBy(F.col("tf").desc(), F.col("token").asc())))
        .where(F.col("rnk") <= k)
        .select("token", F.log(F.col("tf") / F.col("tot")).alias("logp"))
    )
    return (
        ex.join(dic, "token", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.coalesce(F.col("logp"), F.lit(oov_logp))), 6)
            .alias("mean_logprob"),
        )
    )
