"""pair_confusion_report (__spark_entry__): the contingency C(n,2)
recall/precision math on deliberately imperfect assignments."""

from __future__ import annotations

import pandas as pd

from __spark_entry__ import pair_confusion_report


def _df(spark, rows, cols):
    return spark.createDataFrame(pd.DataFrame(rows, columns=cols))


def _report(spark, asg, truth):
    a = _df(spark, asg, ["image_id", "cluster_id"])
    t = _df(spark, truth, ["image_id", "t"])
    return pair_confusion_report(a, t).toPandas().iloc[0]


def test_perfect_assignment(spark):
    truth = [("a", "c1"), ("b", "c1"), ("c", "c2"), ("d", "c2"), ("e", "e")]
    r = _report(spark, truth, truth)
    assert r["n_true_pairs"] == 2 and r["n_pred_pairs"] == 2 and r["n_hit_pairs"] == 2
    assert r["pair_recall"] == 1.0 and r["pair_precision"] == 1.0
    assert bool(r["meets_recall_bar"])


def test_overmerge_hurts_precision_not_recall(spark):
    truth = [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2")]
    asg = [("a", "p"), ("b", "p"), ("c", "p"), ("d", "p")]  # one blob
    r = _report(spark, asg, truth)
    # true: 2 pairs; pred: C(4,2)=6; hits: the 2 true pairs
    assert r["n_true_pairs"] == 2 and r["n_pred_pairs"] == 6 and r["n_hit_pairs"] == 2
    assert r["pair_recall"] == 1.0
    assert r["pair_precision"] == round(2 / 6, 6)
    assert bool(r["meets_recall_bar"])


def test_split_hurts_recall(spark):
    truth = [("a", "t"), ("b", "t"), ("c", "t")]       # 3 pairs
    asg = [("a", "p1"), ("b", "p1"), ("c", "p2")]       # keeps only (a,b)
    r = _report(spark, asg, truth)
    assert r["n_true_pairs"] == 3 and r["n_pred_pairs"] == 1 and r["n_hit_pairs"] == 1
    assert r["pair_recall"] == round(1 / 3, 6)
    assert r["pair_precision"] == 1.0
    assert not bool(r["meets_recall_bar"])


def test_crossed_clusters(spark):
    # pred groups one member of each true cluster: zero hit pairs
    truth = [("a", "t1"), ("b", "t1"), ("c", "t2"), ("d", "t2")]
    asg = [("a", "x"), ("c", "x"), ("b", "y"), ("d", "y")]
    r = _report(spark, asg, truth)
    assert r["n_hit_pairs"] == 0
    assert r["pair_recall"] == 0.0 and r["pair_precision"] == 0.0
