"""Edit-distance-1 entity resolution via deletion-neighborhood blocking.

The public recipe (FastSS, Bocek et al. 2007 "Fast Similarity Search in
Large Dictionaries"; the same neighborhood-generation idea behind
SymSpell): two distinct strings are within Levenshtein distance 1 iff
they share a key in {self} UNION {all single-character deletions} —

  * substitution at position i: deleting position i from both sides
    yields the same string;
  * insertion/deletion: the longer string's deletion at the edit
    position IS the shorter string (its "self" key).

So candidate generation is LINEAR — length+1 keys per record, one
explode, one self-equi-join per key bucket — where the naive
formulation is an O(n^2) cross join with a Levenshtein in the ON
clause, un-runnable at 10^9 records. Every candidate is then VERIFIED
with the real Levenshtein (a JVM built-in), so deletion-key collisions
(false candidates) are harmless and the result is exact.

Scale shape: keys per record bounded by string length; a key bucket of
g records emits g^2 candidate pairs, so pathological buckets (a
million records one edit apart — the flood case) are the same skew
problem every LSH band has, and the same machinery applies (AQE
skew-split; a star-guard cap if a corpus is known-floody). Record
payloads never enter the join — only the key and the string.

Reference parity: [EXT] LLM-pipeline surface (SURVEY.md §2.4); no
reference counterpart — the reference dedups byte-identical files;
this is the typo-radius record-linkage tier. The oracle is a genuine
cross-algorithm gate: DuckDB brute-forces the O(n^2) Levenshtein join
and both algorithms must produce the identical pair set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def deletion_keys(col: F.Column) -> F.Column:
    """Array of blocking keys for `col`: the string itself plus every
    single-character deletion, deduplicated (a run of repeated
    characters yields one variant, not run-length many)."""
    dels = F.transform(
        F.sequence(F.lit(1), F.length(col)),
        lambda i: F.concat(
            col.substr(F.lit(1), i - F.lit(1)),
            col.substr(i + F.lit(1), F.length(col) - i),
        ),
    )
    return F.array_union(F.array(col), dels)


def edit1_pairs(
    df: DataFrame, *, col: str = "name"
) -> DataFrame:
    """All unordered pairs of DISTINCT non-empty values of `col` at
    Levenshtein distance exactly 1 (distinct strings at distance <= 1
    ARE at distance 1). Returns (name_a, name_b, dist) with
    name_a < name_b, dist cast to long.

    Deletion-neighborhood candidates, Levenshtein-verified — never an
    all-pairs join.
    """
    names = (
        df.select(F.col(col).alias("name"))
        .filter(F.col("name").isNotNull() & (F.length("name") >= 1))
        .distinct()
    )
    keyed = names.select(
        F.explode(deletion_keys(F.col("name"))).alias("_k"), "name"
    )
    cands = (
        keyed.alias("a")
        .join(keyed.alias("b"), "_k")
        .filter(F.col("a.name") < F.col("b.name"))
        .select(
            F.col("a.name").alias("name_a"), F.col("b.name").alias("name_b")
        )
        .distinct()
    )
    return cands.filter(
        F.levenshtein("name_a", "name_b") <= 1
    ).withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
