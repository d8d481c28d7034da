"""Incremental connected components (components.incremental_cc_update):
the contracted-graph batch update must equal one-shot CC on the union."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.components import (
    clusters_from_pairs,
    connected_components,
    incremental_cc_update,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["id1", "id2"]).astype(str)
    )


def _ids(spark, ids):
    return spark.createDataFrame(pd.DataFrame({"id": [str(i) for i in ids]}))


def _asg(df):
    return dict(df.select("id", "cluster_id").toPandas().itertuples(index=False))


def test_merge_relabel_fresh_and_untouched(spark):
    # old world: {a1,a2}, {b1,b2}, {c1,c2} (untouched), singleton s9
    old_edges = _edges(spark, [("a1", "a2"), ("b1", "b2"), ("c1", "c2")])
    old = clusters_from_pairs(old_edges, all_ids=_ids(spark, ["a1", "a2", "b1", "b2", "c1", "c2", "s9"]), id_col="id")
    # batch: new doc n5 bridges the a- and b-clusters (merge THROUGH a
    # new node), new doc a0 joins the a-cluster and UNDERCUTS its root
    # (relabel), new pair {x1,x2} is new-new, z7 is isolated (new_ids)
    new_edges = _edges(
        spark, [("n5", "a2"), ("n5", "b1"), ("a0", "a1"), ("x1", "x2")]
    )
    out = _asg(
        incremental_cc_update(old, new_edges, new_ids=_ids(spark, ["z7", "x1"]))
    )
    assert out == {
        # a-cluster ∪ b-cluster ∪ {n5, a0} rooted at the new min a0
        "a0": "a0", "a1": "a0", "a2": "a0", "b1": "a0", "b2": "a0", "n5": "a0",
        "c1": "c1", "c2": "c1",      # untouched old cluster keeps its root
        "s9": "s9",                  # untouched singleton
        "x1": "x1", "x2": "x1",      # new-new cluster
        "z7": "z7",                  # isolated new node via new_ids
    }


def test_equals_one_shot_cc_random(spark):
    # seeded random graph: batch-split edges, incremental == one-shot
    import random

    rng = random.Random(17)
    nodes = [f"n{i:03d}" for i in range(60)]
    pairs = sorted(
        {tuple(sorted(rng.sample(nodes, 2))) for _ in range(70)}
    )
    rng.shuffle(pairs)
    cut = len(pairs) // 2
    old_nodes = sorted({x for p in pairs[:cut] for x in p})
    old = clusters_from_pairs(
        _edges(spark, pairs[:cut]), all_ids=_ids(spark, old_nodes), id_col="id"
    )
    inc = _asg(incremental_cc_update(old, _edges(spark, pairs[cut:])))
    full_nodes = sorted({x for p in pairs for x in p})
    full = _asg(
        clusters_from_pairs(_edges(spark, pairs), all_ids=_ids(spark, full_nodes), id_col="id")
    )
    assert inc == full


def test_replay_is_noop(spark):
    old = clusters_from_pairs(
        _edges(spark, [("a", "b")]), all_ids=_ids(spark, ["a", "b", "c"]), id_col="id"
    )
    batch = _edges(spark, [("b", "c"), ("d", "a")])
    once = incremental_cc_update(old, batch, new_ids=_ids(spark, ["d"]))
    twice = incremental_cc_update(once, batch, new_ids=_ids(spark, ["d"]))
    assert _asg(once) == _asg(twice) == {"a": "a", "b": "a", "c": "a", "d": "a"}


def test_nodes_only_batch(spark):
    old = clusters_from_pairs(
        _edges(spark, [("a", "b")]), all_ids=_ids(spark, ["a", "b"]), id_col="id"
    )
    empty = _edges(spark, [("x", "y")]).filter(F.lit(False))
    out = _asg(incremental_cc_update(old, empty, new_ids=_ids(spark, ["q"])))
    assert out == {"a": "a", "b": "a", "q": "q"}


def test_chain_of_increments(spark):
    # three successive batches growing one chain: every intermediate
    # state is a valid assignment and the final equals one-shot CC
    old = clusters_from_pairs(
        _edges(spark, [("m3", "m4")]), all_ids=_ids(spark, ["m3", "m4"]), id_col="id"
    )
    s1 = incremental_cc_update(old, _edges(spark, [("m2", "m3")]))
    assert _asg(s1) == {"m2": "m2", "m3": "m2", "m4": "m2"}
    s2 = incremental_cc_update(s1, _edges(spark, [("m1", "m4")]))
    assert _asg(s2) == {"m1": "m1", "m2": "m1", "m3": "m1", "m4": "m1"}
