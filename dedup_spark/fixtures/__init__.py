"""Deterministic synthetic corpora (seed-pinned; no external data)."""

from dedup_spark.fixtures.images import IMAGES_SCHEMA, generate_corpus

__all__ = ["IMAGES_SCHEMA", "generate_corpus"]
