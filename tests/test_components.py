"""Connected-components tests: transitivity, isolation, convergence,
checkpoint-resume (north rule's resumability requirement)."""

from __future__ import annotations

import json
from pathlib import Path

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.operators.components import (
    clusters_from_pairs,
    connected_components,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pd.DataFrame(pairs, columns=["id1", "id2"]))


def _assign(df):
    return {r["id"]: r["cluster_id"] for r in df.collect()}


def test_chain_transitivity(spark):
    got = _assign(connected_components(_edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])))
    assert got == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_components_stay_disjoint(spark):
    got = _assign(
        connected_components(_edges(spark, [("a", "b"), ("x", "y"), ("y", "z")]))
    )
    assert got["a"] == got["b"] == "a"
    assert got["x"] == got["y"] == got["z"] == "x"


def test_long_path_converges_logarithmically(spark):
    n = 64
    chain = [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n - 1)]
    got = _assign(connected_components(_edges(spark, chain)))
    assert set(got.values()) == {"n000"}
    assert len(got) == n


def test_duplicate_and_reversed_edges(spark):
    got = _assign(
        connected_components(
            _edges(spark, [("b", "a"), ("a", "b"), ("b", "c"), ("c", "b")])
        )
    )
    assert got == {"a": "a", "b": "a", "c": "a"}


def test_singletons_self_cluster(spark):
    ids = spark.createDataFrame(pd.DataFrame({"image_id": ["a", "b", "c"]}))
    out = clusters_from_pairs(_edges(spark, [("a", "b")]), all_ids=ids)
    got = {r["image_id"]: r["cluster_id"] for r in out.collect()}
    assert got == {"a": "a", "b": "a", "c": "c"}


def test_checkpoint_resume_same_result(spark, tmp_path):
    """A job killed mid-CC must resume from the last completed
    iteration and produce the same assignment (idempotent re-run —
    the reference's 'already linked -> skip', src/actions.rs:70-80)."""
    pairs = [("a", "b"), ("b", "c"), ("p", "q"), ("q", "r"), ("r", "s")]
    cfg = DedupConfig(checkpoint_dir=str(tmp_path / "cc"))
    first = _assign(connected_components(_edges(spark, pairs), cfg))

    # simulate a crash AFTER iteration 0: rewind the manifest
    manifest = Path(cfg.checkpoint_dir) / "cc_manifest.json"
    m = json.loads(manifest.read_text())
    assert m["converged"] is True
    manifest.write_text(json.dumps({"last_iteration": 0, "converged": False}))

    resumed = _assign(connected_components(_edges(spark, pairs), cfg))
    assert resumed == first

    # a fresh (non-checkpointed) run agrees too
    clean = _assign(connected_components(_edges(spark, pairs)))
    assert clean == first
