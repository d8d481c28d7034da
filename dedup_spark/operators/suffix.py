"""Substring-containment dedup over captions. [EXT]

LSH on shingle Jaccard misses containment: if caption A is a short
substring of a long caption B, Jaccard(A, B) ≈ |A| / |B| is tiny even
though A is fully contained. The north rule mandates a suffix-structure
tier to catch these.

Two cooperating paths:

1. `containment_pairs` (scale path, exact semantics for k-shingle
   containment): containment score C(A,B) = |S_A ∩ S_B| / |S_A| over
   word-k-gram shingle sets. A true substring has C = 1.0 (every shingle
   of A appears in B). Implemented as an inverted-index join:
   explode distinct shingles → for each shingle pair up docs sharing it
   (rare-shingle pruned) → count shared shingles per pair → divide by
   the smaller doc's shingle count. All built-in ops after the shingle
   UDF; the common-shingle cap bounds fan-out exactly like a posting
   list cutoff in IR systems.

2. `substring_pairs_in_partition` (exact character-level substring, per
   partition): sorts captions by length inside each partition via
   mapInPandas and checks `find()` against a bounded window of longer
   strings — a deterministic per-chunk suffix-scan. Cross-partition
   containment is caught by path 1 (shingle containment ⊇ substring
   containment for docs with >= k words). Documented limitation: char
   substrings shorter than k words rely on path 2's partition locality.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dedup_spark.config import DEFAULT_CONFIG, DedupConfig
from dedup_spark.operators.minhash import shingle_explode_udf


def containment_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    cfg: DedupConfig = DEFAULT_CONFIG,
    threshold: float = 1.0,
    max_posting: int = 512,
) -> DataFrame:
    """(id1, id2, containment) where containment = |S1∩S2| / min(|S1|,|S2|)
    >= threshold. id1 < id2; the contained (smaller) doc can be either.

    Posting lists longer than max_posting are dropped (a shingle shared
    by thousands of docs carries no signal — standard IDF cutoff);
    at 100 TB this is the difference between a sparse join and a
    quadratic blowup.
    """
    sh = shingle_explode_udf(cfg)
    shingled = df.select(
        F.col(id_col).alias("_id"), sh(F.col(text_col)).alias("_sh")
    ).filter(F.col("_sh").isNotNull())
    sizes = shingled.select("_id", F.size("_sh").alias("_sz"))
    posts = shingled.select("_id", F.explode("_sh").alias("shingle"))
    rare = (
        posts.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter((F.col("_n") >= 2) & (F.col("_n") <= max_posting))
    )
    posts = posts.join(rare.select("shingle"), on="shingle", how="left_semi")
    p1 = posts.select("shingle", F.col("_id").alias("id1"))
    p2 = posts.select("shingle", F.col("_id").alias("id2"))
    shared = (
        p1.join(p2, on="shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    z1 = sizes.select(F.col("_id").alias("id1"), F.col("_sz").alias("_sz1"))
    z2 = sizes.select(F.col("_id").alias("id2"), F.col("_sz").alias("_sz2"))
    return (
        shared.join(z1, "id1").join(z2, "id2")
        .withColumn(
            "containment", F.col("_shared") / F.least("_sz1", "_sz2")
        )
        .filter(F.col("containment") >= threshold)
        .select("id1", "id2", "containment")
    )


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    cfg: DedupConfig = DEFAULT_CONFIG,
    threshold: float | None = None,
    max_posting: int | None = None,
    min_tokens: int | None = None,
) -> DataFrame:
    """Exact shingle-Jaccard pairs via the same inverted-index join as
    `containment_pairs` — the deterministic ground-truth path that the
    MinHash LSH tier approximates. (id1, id2, jaccard) with id1 < id2,
    jaccard = |S1∩S2| / |S1∪S2| >= threshold.

    With `max_posting=None` the result is exact over the whole corpus
    (pairs sharing zero shingles have jaccard 0 and can never pass a
    positive threshold, so the inverted index IS exhaustive). At 100 TB
    pass a posting cap — a shingle shared by thousands of docs carries
    ~no signal and the cap bounds join fan-out; the capped variant is the
    scale path, the uncapped one the small-scale oracle.

    `min_tokens` drops docs shorter than the shingle width instead of
    padding them (parity with SQL oracles that cannot express padding).
    """
    threshold = cfg.jaccard_threshold if threshold is None else threshold
    base = df
    if min_tokens is not None:
        base = base.filter(
            F.size(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")) >= min_tokens
        )
    sh = shingle_explode_udf(cfg)
    shingled = base.select(
        F.col(id_col).alias("_id"), sh(F.col(text_col)).alias("_sh")
    ).filter(F.col("_sh").isNotNull())
    sizes = shingled.select("_id", F.size("_sh").alias("_sz"))
    posts = shingled.select("_id", F.explode("_sh").alias("shingle"))
    shared_keys = posts.groupBy("shingle").agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") >= 2
    )
    if max_posting is not None:
        shared_keys = shared_keys.filter(F.col("_n") <= max_posting)
    posts = posts.join(shared_keys.select("shingle"), on="shingle", how="left_semi")
    p1 = posts.select("shingle", F.col("_id").alias("id1"))
    p2 = posts.select("shingle", F.col("_id").alias("id2"))
    shared = (
        p1.join(p2, on="shingle")
        .filter(F.col("id1") < F.col("id2"))
        .groupBy("id1", "id2")
        .agg(F.count(F.lit(1)).alias("_shared"))
    )
    z1 = sizes.select(F.col("_id").alias("id1"), F.col("_sz").alias("_sz1"))
    z2 = sizes.select(F.col("_id").alias("id2"), F.col("_sz").alias("_sz2"))
    return (
        shared.join(z1, "id1").join(z2, "id2")
        .withColumn(
            "jaccard",
            F.col("_shared") / (F.col("_sz1") + F.col("_sz2") - F.col("_shared")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id1", "id2", "jaccard")
    )


def substring_pairs_in_partition(
    df: DataFrame,
    id_col: str = "image_id",
    text_col: str = "caption",
    window: int = 256,
) -> DataFrame:
    """Exact character-substring pairs within each partition.

    mapInPandas: per Arrow batch, sort captions by length ascending and
    test each against the next `window` longer captions with str.find —
    a bounded suffix-scan. Repartition by a cheap similarity proxy
    (leading normalized token) first so containment-related docs
    co-locate; the shingle path covers the remainder globally.
    """
    import pandas as pd

    out_schema = "id1 string, id2 string, kind string"

    def _scan(it):
        for pdf in it:
            pdf = pdf.sort_values("_len").reset_index(drop=True)
            texts = pdf["_t"].tolist()
            ids = pdf["_i"].tolist()
            found: list[tuple[str, str]] = []
            for i in range(len(texts)):
                ti = texts[i]
                if not ti:
                    continue
                for j in range(i + 1, min(i + 1 + window, len(texts))):
                    if len(texts[j]) > len(ti) and ti in texts[j]:
                        a, b = sorted((ids[i], ids[j]))
                        found.append((a, b))
            yield pd.DataFrame(
                {
                    "id1": [f[0] for f in found],
                    "id2": [f[1] for f in found],
                    "kind": "substring",
                }
            ) if found else pd.DataFrame(
                {"id1": pd.Series(dtype=str), "id2": pd.Series(dtype=str), "kind": pd.Series(dtype=str)}
            )

    prepped = df.select(
        F.col(id_col).alias("_i"),
        F.col(text_col).alias("_t"),
        F.length(text_col).alias("_len"),
        F.split(F.lower(F.col(text_col)), r"\s+")[0].alias("_tok0"),
    ).repartition("_tok0")
    return prepped.mapInPandas(_scan, schema=out_schema).dropDuplicates(
        ["id1", "id2"]
    )
