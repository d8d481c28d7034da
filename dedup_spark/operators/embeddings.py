"""Embedding similarity search — brute-force cosine top-k baseline +
random-hyperplane LSH bucketed variant for scale. [EXT]

Input: a table with (vec_id, embedding array<float>). The brute-force
path is the correctness oracle; the LSH path is the 100 TB plan:

  brute force:  queries (small) are BROADCAST against the corpus; the
                dot product is a built-in higher-order-function
                aggregate (F.zip_with + F.aggregate — JVM-side, no
                Python), top-k per query via window on the (tiny)
                scored set.
  LSH:          signature = sign pattern of `hyperplanes` random
                projections, packed to one int64 per table; candidate
                pairs share a bucket in >=1 table; verify = exact cosine
                on candidates only. Same band/verify economics as
                MinHash (SURVEY.md §2.3).

Norms are precomputed once (narrow) so the join computes only dots.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F, types as T

from dedup_spark.config import DEFAULT_CONFIG, DedupConfig


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query row.

    (query_id, neighbor_id, cosine, rank), self-matches excluded.
    Queries are broadcast → the corpus never shuffles; scoring happens
    in one narrow codegen stage, then top-k via per-query window (the
    scored set is |Q|×|C| rows — keep |Q| modest, that's the contract
    of a brute-force oracle).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cosine",
            _dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn")),
        )
        .select("query_id", "neighbor_id", "cosine")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def cosine_scores_gemm(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float | None = None,
    topk: int | None = None,
    round_to: int = 6,
) -> DataFrame:
    """All-pairs cosine via blocked matrix multiply.

    The corpus matrix (float64, row-normalized) is broadcast to every
    task; each Arrow batch of query rows does ONE numpy GEMM against it
    — thousands of dot products per BLAS call instead of one
    interpreted higher-order-function per pair. Returns either
    thresholded pairs (id1 < id2, `cosine`) or per-query top-k
    (query_id, neighbor_id, cosine, rnk).

    Scale note: broadcast works to ~10^6×dim corpus (hundreds of MB).
    Beyond that, block the corpus too (cross-join of row-blocks ×
    col-blocks) or switch to the LSH path (`ann_verified_pairs`) —
    brute force at 10^12 rows is the wrong algorithm, not the wrong
    implementation.
    """
    import pandas as pd

    spark = corpus.sparkSession
    pdf = corpus.select(id_col, vec_col).toPandas()
    ids = pdf[id_col].to_numpy()
    mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)

    if topk is None:
        out_schema = "id1 long, id2 long, cosine double"
    else:
        out_schema = "query_id long, neighbor_id long, cosine double, rnk long"
    thr = threshold

    def _block(it):
        cids, cmat = b_ids.value, b_mat.value
        idx_of = {v: i for i, v in enumerate(cids)}
        for pdf_in in it:
            q = np.stack(pdf_in[vec_col].to_numpy()).astype(np.float64)
            q /= np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdf_in[id_col].to_numpy()
            sims = np.round(q @ cmat.T, round_to)  # (batch, corpus)
            if topk is None:
                # emit id1 < id2 once: keep columns with cid > qid
                qi, ci = np.nonzero(sims >= thr)
                keep = qids[qi] < cids[ci]
                yield pd.DataFrame(
                    {
                        "id1": qids[qi][keep],
                        "id2": cids[ci][keep],
                        "cosine": sims[qi, ci][keep],
                    }
                )
            else:
                rows = {"query_id": [], "neighbor_id": [], "cosine": [], "rnk": []}
                for r, qid in enumerate(qids):
                    s = sims[r].copy()
                    s[idx_of[qid]] = -np.inf  # exclude self
                    # order by (cosine desc, neighbor_id asc)
                    order = np.lexsort((cids, -s))[:topk]
                    rows["query_id"].extend([qid] * len(order))
                    rows["neighbor_id"].extend(cids[order])
                    rows["cosine"].extend(s[order])
                    rows["rnk"].extend(range(1, len(order) + 1))
                yield pd.DataFrame(rows)

    return corpus.select(id_col, vec_col).mapInPandas(_block, schema=out_schema)


def hyperplane_signature_udf(dim: int, cfg: DedupConfig = DEFAULT_CONFIG):
    """pandas UDF: embedding → array<long> of `ann_tables` packed sign
    signatures. One matrix multiply per Arrow batch — fully vectorized."""
    rng = np.random.default_rng(cfg.minhash_seed)
    planes = rng.standard_normal((cfg.ann_tables, cfg.ann_hyperplanes, dim)).astype(
        np.float32
    )
    weights = (1 << np.arange(cfg.ann_hyperplanes, dtype=np.int64))

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())  # (batch, dim)
        out = []
        sigs = np.einsum("tbd,nd->ntb", planes, mat) > 0  # (n, tables, bits)
        packed = (sigs * weights).sum(axis=2)  # (n, tables)
        out = [row.tolist() for row in packed]
        return pd.Series(out)

    return _sig


def ann_candidates(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cfg: DedupConfig = DEFAULT_CONFIG,
    max_bucket: int = 1024,
) -> DataFrame:
    """Near-neighbor candidate pairs: same hyperplane-sign bucket in any
    table. Explode (table_idx, bucket) → sparse self-join, id1<id2."""
    dim = len(corpus.select(vec_col).first()[0])
    sig = hyperplane_signature_udf(dim, cfg)
    bucketed = corpus.select(
        F.col(id_col).alias("_id"), F.posexplode(sig(F.col(vec_col))).alias("t", "bucket")
    )
    counts = (
        bucketed.groupBy("t", "bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_bucket))
    )
    keyed = bucketed.join(counts, on=["t", "bucket"], how="left_semi")
    a = keyed.select("t", "bucket", F.col("_id").alias("id1"))
    b = keyed.select("t", "bucket", F.col("_id").alias("id2"))
    return (
        a.join(b, on=["t", "bucket"])
        .filter(F.col("id1") < F.col("id2"))
        .select("id1", "id2")
        .distinct()
    )


def ann_verified_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cfg: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """LSH candidates verified by exact cosine >= cfg.cosine_threshold —
    the embedding near-dup tier feeding connected components."""
    pairs = ann_candidates(corpus, id_col, vec_col, cfg)
    vecs = corpus.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        _norm(F.col(vec_col)).alias("_n"),
    )
    v1 = vecs.select(F.col("_id").alias("id1"), F.col("_v").alias("_v1"), F.col("_n").alias("_n1"))
    v2 = vecs.select(F.col("_id").alias("id2"), F.col("_v").alias("_v2"), F.col("_n").alias("_n2"))
    return (
        pairs.join(v1, "id1").join(v2, "id2")
        .withColumn("cosine", _dot("_v1", "_v2") / (F.col("_n1") * F.col("_n2")))
        .filter(F.col("cosine") >= cfg.cosine_threshold)
        .select("id1", "id2", "cosine")
    )
