"""Cross-document boilerplate-segment removal (CCNet-style).

Web-scale training corpora are full of boilerplate: navigation chrome,
cookie banners, license footers — text that repeats VERBATIM across
many documents without the documents being near-duplicates of each
other. CCNet (Wenzek et al., 2020) removes it by hashing paragraphs
and dropping any paragraph seen in multiple documents; Gopher/RefinedWeb
use the same shape at line granularity. None of the near-dup tiers
(MinHash/SimHash/containment) catch this: a 5% shared footer never
pushes whole-document Jaccard over any sane threshold.

This operator is that pass, re-expressed for Spark:

  1. segment each document into consecutive non-overlapping
     ``seg_tokens``-token windows (the corpus here is single-line, so
     fixed token windows stand in for paragraphs; with real newline-
     delimited text pass a custom ``segment_expr``),
  2. shuffle once on the segment string and count DISTINCT documents
     per segment (two-phase: a (seg, doc) dedup with map-side combine,
     then a combinable count — no count-distinct expand, no skew:
     a segment repeated inside ONE hot document collapses map-side),
  3. mark segments seen in >= ``min_docs`` distinct documents as
     boilerplate and aggregate per document: how many segments survive
     and how many tokens the cleaned document keeps.

Everything is built-in expressions (split / slice / concat_ws /
posexplode) — JVM-side, whole-stage codegen, no Python in the plan.

100 TB notes: the only wide exchanges are (a) the explode→groupBy on
the segment string and (b) the groupBy(doc_id) rollup — both are
combinable aggregations with partial agg, so a footer shared by 10^9
documents arrives at its reducer as one row per map task, not 10^9
rows. The segment→doc join broadcasts when the boilerplate set is
small (the common case: boilerplate is a tiny fraction of distinct
segments) and falls back to a shuffle join otherwise; AQE decides at
runtime from the actual build-side size.

Reference analog: none — the reference (denizariyan/dedup) groups
whole files by content hash (src/main.rs grouping cascade); segment-
level cross-doc dedup is part of this engine's generalized LLM-data
surface (SURVEY.md §2.3 EXT).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(text: Column) -> Column:
    return F.split(F.lower(F.trim(text)), r"\s+")


def segment_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 4,
) -> DataFrame:
    """(id, seg_idx, seg) rows: consecutive non-overlapping
    ``seg_tokens``-token windows, 1-based seg_idx, trailing partial
    window dropped (kept in the token budget by the caller). Documents
    shorter than one window emit no rows — ``boilerplate_stats`` left-
    joins them back. ``F.sequence(1, n)`` would generate a DESCENDING
    [1, 0] for n=0, so the empty case is guarded explicitly."""
    toks = _tokens(F.col(text_col))
    n_seg = F.floor(F.size(toks) / seg_tokens).cast("int")
    idxs = F.when(n_seg >= 1, F.sequence(F.lit(1), n_seg)).otherwise(
        F.array().cast("array<int>")
    )
    segs = F.transform(
        idxs,
        lambda i: F.concat_ws(" ", F.slice(toks, (i - 1) * seg_tokens + 1, seg_tokens)),
    )
    return df.select(
        F.col(id_col), F.posexplode(segs).alias("_p", "seg")
    ).select(id_col, (F.col("_p") + 1).alias("seg_idx"), "seg")


def boilerplate_segments(
    segs: DataFrame,
    id_col: str = "doc_id",
    min_docs: int = 2,
) -> DataFrame:
    """Distinct segments appearing in >= min_docs distinct documents,
    with their document frequency. Two combinable aggregations (see
    module docstring) instead of countDistinct's expand."""
    return (
        segs.select("seg", id_col)
        .distinct()
        .groupBy("seg")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
    )


def boilerplate_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 4,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document boilerplate summary:

      n_segments    full windows in the document
      n_boilerplate windows shared with >= min_docs-1 other documents
      kept_tokens   tokens after dropping boilerplate windows
                    (non-boilerplate windows + the partial tail window)

    All counts BIGINT for oracle parity.
    """
    segs = segment_docs(df, id_col, text_col, seg_tokens)
    bp = boilerplate_segments(segs, id_col, min_docs)
    per_doc = (
        segs.join(bp.select("seg"), on="seg", how="left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("_n_bp"))
    )
    n_tok = F.size(_tokens(F.col(text_col)))
    base = df.select(
        id_col,
        F.floor(n_tok / seg_tokens).cast("long").alias("n_segments"),
        n_tok.cast("long").alias("_n_tok"),
    )
    return (
        base.join(per_doc, on=id_col, how="left")
        .select(
            id_col,
            "n_segments",
            F.coalesce(F.col("_n_bp"), F.lit(0)).cast("long").alias("n_boilerplate"),
            (
                F.col("_n_tok")
                - F.coalesce(F.col("_n_bp"), F.lit(0)) * seg_tokens
            )
            .cast("long")
            .alias("kept_tokens"),
        )
    )
