"""BM25 top-k retrieval — exact, distributed, oracle-reproducible.

Public recipe: Robertson & Zaragoza, "The Probabilistic Relevance
Framework: BM25 and Beyond" (2009); the +1 inside the log is the
Lucene/BM25+ variant that keeps idf positive. Retrieval is a
first-class training-data-pipeline operator (rank corpus docs against
an eval set before decontamination review, find near-matches for
curation); here it is built from the same explode/groupBy machinery
as the gram tiers — no search library.

Cross-engine bit-parity discipline (the repo's oracle rules):
  * idf is ROUNDED to 6dp before scoring — ln() is the one libm call
    two engines may disagree on by 1 ulp, so it never feeds raw into
    downstream arithmetic (the rounded-cosine-threshold precedent);
  * every per-(query,doc,term) contribution is pure IEEE arithmetic
    on exact integers (tf, dl) and two exact scalars (N, Σdl), with
    parenthesization pinned identically in the SQL oracle;
  * per-(query,doc) summation is decimal(30,12)-exact — order-free
    across partitions (the _dec_sum rule);
  * ranking uses the ROUNDED score with a doc-id tiebreak.

Scale shape: one explode + two combinable aggregations build tf/df;
the query-term ⋈ postings join is the classic posting-list join,
shuffled on term; ultra-common terms (df ≥ N/2) are dropped BEFORE
the join — they carry ~zero idf and their postings are the join's
skew tail (the standard stopword-pruning move; production would also
cap posting length with a drop log). The per-query window runs over
matched candidates only.

Reference parity: [EXT] (SURVEY.md §2.4); no reference counterpart.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

K1 = 1.2
B = 0.75

# guarded tokenizer: empty/null/whitespace-only text yields an EMPTY
# array, never [''] — split('') returns [''] with size 1, which would
# defeat the size()>0 filter, inflate N/avgdl, and index the '' term
# (diverging from the oracle's trim(text) <> '' exclusion)
from dedup_spark.operators.spandedup import _norm_tokens as _toks_guarded


def _toks(text_col: str):
    return _toks_guarded(text_col)


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "doc_id",
    qtext_col: str = "text",
    max_df_ratio: float = 0.5,
) -> DataFrame:
    """(query_id, neighbor_id, score, rnk): top-k corpus docs per query
    by BM25 (k1=1.2, b=0.75), query terms as a distinct bag, the query
    doc itself excluded. Ranking: (rounded score desc, neighbor_id).

    ``max_df_ratio`` prunes terms with df >= ratio·N before the
    posting join (skew + near-zero idf). The production default is
    0.5; a corpus with a degenerate vocabulary (the synthetic fixture
    has 31 distinct terms, median df 0.78·N) sets 1.0 to keep BM25's
    dl/tf normalization doing the ranking work."""
    base = docs.select(F.col(id_col).alias("_id"), _toks(text_col).alias("_t")).filter(
        F.size("_t") > 0
    )
    tf = (
        base.select("_id", F.explode("_t").alias("term"))
        .groupBy("_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dl = base.select("_id", F.size("_t").alias("dl"))
    st = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("sdl")
    )  # two exact ints; broadcast as scalars
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = (
        dfreq.crossJoin(F.broadcast(st))
        # ultra-common terms: near-zero idf AND the posting-list skew
        # tail — pruned before the join
        .filter(F.col("df") < F.col("n") * F.lit(float(max_df_ratio)))
        .select(
            "term",
            F.round(
                F.log(
                    (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                ),
                6,
            ).alias("idf"),
        )
    )
    qterms = (
        queries.select(
            F.col(qid_col).alias("query_id"), _toks(qtext_col).alias("_t")
        )
        .filter(F.size("_t") > 0)
        .select("query_id", F.explode("_t").alias("term"))
        .distinct()
    )
    avgdl = F.col("sdl") / F.col("n")
    contrib = F.col("idf") * (
        (F.col("tf") * F.lit(K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(K1) * (F.lit(1.0 - B) + F.lit(B) * (F.col("dl") / avgdl))
        )
    )
    scored = (
        qterms.join(idf, on="term")
        .join(tf.withColumnRenamed("_id", "neighbor_id"), on="term")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .join(dl.withColumnRenamed("_id", "neighbor_id"), on="neighbor_id")
        .crossJoin(F.broadcast(st))
        .groupBy("query_id", "neighbor_id")
        .agg(
            F.round(
                F.sum(contrib.cast("decimal(30,12)")).cast("double"), 6
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
